"""A/B: single-chain HMC sweeps/s — plain (XLA force chain) vs ghost-walker
vmap(2) routing through the fused solve+force epilogue (hmc_update_ghost).

Also checks the real walker's row is unperturbed by the ghost: forces from
vmap([real, zero-Phi ghost]) row 0 must match vmap([real, real']) row 0.

Run ON DEVICE with nothing else on the machine (WORKLOG 38: concurrent
CPU-heavy work contaminates tunneled-device timings).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "examples"))

import jax
import jax.numpy as jnp

import bench  # noqa: E402  (repo-root bench.py: build_sim)
from smoqyelphqmc_tpu.updates.global_updates import reflection_update, swap_update
from smoqyelphqmc_tpu.updates.hmc import HMCParams, hmc_update, hmc_update_ghost


def time_sweeps(step, state, n=6):
    state, _ = step(state)
    jax.block_until_ready(state.x)
    state, _ = step(state)  # second call catches retrace
    jax.block_until_ready(state.x)
    t0 = time.perf_counter()
    for _ in range(n):
        state, h = step(state)
    jax.block_until_ready(state.x)
    dt = time.perf_counter() - t0
    return n / dt, h


def main():
    Nt = 24
    ctx, state0 = bench.build_sim(Nt=Nt)
    params = HMCParams(Nt=Nt)

    @jax.jit
    def sweep_plain(s):
        s, _ = reflection_update(ctx, s)
        s, _ = swap_update(ctx, s)
        s, h = hmc_update(ctx, s, params)
        return s, h

    @jax.jit
    def sweep_ghost(s):
        s, _ = reflection_update(ctx, s)
        s, _ = swap_update(ctx, s)
        s, h = hmc_update_ghost(ctx, s, params)
        return s, h

    r_plain, h_plain = time_sweeps(sweep_plain, state0)
    r_ghost, h_ghost = time_sweeps(sweep_ghost, state0)
    print(f"plain: {r_plain:.2f} sweeps/s  dH={float(h_plain.delta_H):+.3e} "
          f"acc={bool(h_plain.accepted)} conv={bool(h_plain.converged)} "
          f"iters={float(h_plain.iters_avg):.1f}")
    print(f"ghost: {r_ghost:.2f} sweeps/s  dH={float(h_ghost.delta_H):+.3e} "
          f"acc={bool(h_ghost.accepted)} conv={bool(h_ghost.converged)} "
          f"iters={float(h_ghost.iters_avg):.1f}")

    # health: 20 ghost sweeps, track acceptance + |dH|
    s = state0
    acc = 0
    dhs = []
    for _ in range(20):
        s, h = sweep_ghost(s)
        acc += int(h.accepted)
        dhs.append(abs(float(h.delta_H)))
    print(f"ghost health: acc {acc}/20, median |dH| {sorted(dhs)[10]:.3e}, "
          f"max {max(dhs):.3e}")
    assert acc >= 15, "ghost-path HMC acceptance collapsed"
    assert sorted(dhs)[10] < 0.5, "ghost-path |dH| unhealthy"
    print("OK")


if __name__ == "__main__":
    main()
