"""Honest-barrier single-chain (W=1) and W=8 sweep rate for WHATEVER repo
checkout it runs inside (cwd must be the repo root). Used for the r03-HEAD vs
r05-HEAD bisect of the single-chain discrepancy (round-4 VERDICT item 2):
run inside a `git worktree` of any snapshot to compare checkouts under ONE
barrier discipline (results: BENCH.md "Single-chain discrepancy resolved").

Per-iteration barrier = one tiny device->host scalar readback (np.asarray),
the only reliable execution barrier on the tunneled axon backend.

Run: python scripts/honest_sweep.py [--w8] [--n 10] [--discard 2]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def drain(x):
    import jax

    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0:1])


def main():
    n = 10
    discard = 2
    do_w8 = "--w8" in sys.argv
    for i, a in enumerate(sys.argv):
        if a == "--n":
            n = int(sys.argv[i + 1])
        if a == "--discard":
            discard = int(sys.argv[i + 1])
    import jax
    import jax.numpy as jnp

    from bench import build_sim
    from smoqyelphqmc_tpu.updates.global_updates import reflection_update, swap_update
    from smoqyelphqmc_tpu.updates.hmc import HMCParams, hmc_update

    ctx, state = build_sim(Nt=24)
    params = HMCParams(Nt=24)

    @jax.jit
    def sweep(s, iters_acc):
        s, _ = reflection_update(ctx, s)
        s, _ = swap_update(ctx, s)
        s, h = hmc_update(ctx, s, params)
        return s, iters_acc + h.iters_avg

    iters = jnp.zeros((), jnp.float64)
    t0 = time.perf_counter()
    state, iters = sweep(state, iters)
    drain(iters)
    print(f"[honest] W=1 compile+first: {time.perf_counter() - t0:.1f}s", flush=True)
    for _ in range(discard):
        state, iters = sweep(state, iters)
        drain(iters)
    iters = jnp.zeros((), jnp.float64)
    t0 = time.perf_counter()
    for _ in range(n):
        state, iters = sweep(state, iters)
        drain(iters)
    dt = time.perf_counter() - t0
    print(
        f"[honest] W=1: {n / dt:.2f} sweeps/s over {n} sweeps "
        f"({dt / n * 1e3:.1f} ms/sweep), cg_iters/solve={float(iters) / n:.1f}",
        flush=True,
    )

    if do_w8:
        from smoqyelphqmc_tpu.parallel.walkers import init_walker_states, walker_sweep

        states = init_walker_states(ctx, state, 8, seed=1)
        step = jax.jit(lambda s: walker_sweep(ctx, s, params))
        t0 = time.perf_counter()
        states, _ = step(states)
        drain(states.key)
        print(f"[honest] W=8 compile+first: {time.perf_counter() - t0:.1f}s", flush=True)
        for _ in range(discard):
            states, _ = step(states)
            drain(states.key)
        t0 = time.perf_counter()
        for _ in range(n):
            states, _ = step(states)
            drain(states.key)
        dt = time.perf_counter() - t0
        print(
            f"[honest] W=8: {8 * n / dt:.2f} walker-sweeps/s over {n} sweeps",
            flush=True,
        )


if __name__ == "__main__":
    main()
