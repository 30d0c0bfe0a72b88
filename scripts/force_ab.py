"""A/B the fused Pallas force contraction (ops/pallas_fused.py:FusedForce)
against the XLA chain: single force evaluation and one full HMC trajectory,
at W in {1, 8}, on the headline config (L=12, beta=12).

Run: python scripts/force_ab.py
"""

import os
import sys
import time

sys.path.insert(0, ".")


def timeit(fn, *args, n=5):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp

    from bench import build_sim
    from smoqyelphqmc_tpu.ops.pff import (
        fermionic_action_and_force,
        sample_pseudofermion_fields,
    )
    from smoqyelphqmc_tpu.updates.context import make_fdm
    from smoqyelphqmc_tpu.updates.hmc import HMCParams, hmc_update

    ctx, state0 = build_sim()
    params = HMCParams(Nt=24)
    print(f"device: {jax.devices()[0].platform}")

    @jax.jit
    def force_once(state):
        x = state.x
        fdm = make_fdm(ctx, x)
        key = jax.random.PRNGKey(3)
        Phi, _ = sample_pseudofermion_fields(key, ctx.elph, fdm, x)
        res = fermionic_action_and_force(
            Phi.astype(jnp.float32), ctx.elph, fdm, x, ctx.plan,
            precond=state.precond, tol=ctx.tol_force, maxiter=ctx.maxiter,
            solve_dtype="float32",
        )
        return res.force

    @jax.jit
    def traj(state):
        s, h = hmc_update(ctx, state, params)
        return s.x, h.accepted

    import numpy as np
    from smoqyelphqmc_tpu.parallel.walkers import init_walker_states

    states_w = init_walker_states(ctx, state0, n_walkers=8, seed=11)
    traj_w = jax.jit(jax.vmap(lambda s: hmc_update(ctx, s, params)[0].x))
    force_w = jax.jit(jax.vmap(force_once))

    for label in ("fused", "xla"):
        os.environ["SMOQY_FUSED_FORCE"] = "1" if label == "fused" else "0"
        force_once.clear_cache()
        traj.clear_cache()
        traj_w.clear_cache()
        force_w.clear_cache()
        for name, fn, arg, n in (
            ("force W=1", force_once, state0, 5),
            ("traj W=1", traj, state0, 3),
            ("force W=8", force_w, states_w, 5),
            ("traj W=8", traj_w, states_w, 3),
        ):
            t = timeit(fn, arg, n=n)
            print(f"{label:>5}: {name} {t*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
