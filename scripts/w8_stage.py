"""Production-path stage profile of the W-walker sweep (walker_sweep breakdown).

Unlike scripts/walker_profile.py (which times each stage with per-walker
preconditioner refreshes), this times the stages exactly as the production
driver composes them: ONE shared cross-walker preconditioner refresh per sweep,
then vmapped reflection / swap / HMC with refresh_precond_at_start=False.

Run: python scripts/w8_stage.py [--W 8] [--Nt 24]
"""

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
    W = 8
    Nt = 24
    for i, a in enumerate(sys.argv):
        if a == "--W":
            W = int(sys.argv[i + 1])
        if a == "--Nt":
            Nt = int(sys.argv[i + 1])
    import jax

    from bench import build_sim
    from smoqyelphqmc_tpu.parallel.walkers import (
        init_walker_states,
        shared_precond_refresh,
        walker_sweep,
    )
    from smoqyelphqmc_tpu.updates.global_updates import reflection_update, swap_update
    from smoqyelphqmc_tpu.updates.hmc import HMCParams, hmc_update

    ctx, state0 = build_sim(Nt=Nt)
    params = HMCParams(Nt=Nt)
    params_noref = params.replace(refresh_precond_at_start=False)
    states = init_walker_states(ctx, state0, W, seed=1)
    print(f"device: {jax.devices()[0]}, W={W}, Nt={Nt}")

    stages = [
        ("shared refresh", jax.jit(lambda s: shared_precond_refresh(ctx, s).precond)),
        ("reflection (no refresh)", jax.jit(jax.vmap(lambda s: reflection_update(ctx, s)[0].x))),
        ("swap (no refresh)", jax.jit(jax.vmap(lambda s: swap_update(ctx, s)[0].x))),
        (
            "hmc (no refresh)",
            jax.jit(jax.vmap(lambda s: hmc_update(ctx, s, params_noref)[0].x)),
        ),
        ("walker_sweep total", jax.jit(lambda s: walker_sweep(ctx, s, params)[0].x)),
    ]
    print("| stage | t ms | per-walker ms |")
    print("|---|---|---|")
    for name, fn in stages:
        t = timeit(fn, states) * 1e3
        print(f"| {name} | {t:.1f} | {t / W:.2f} |", flush=True)


if __name__ == "__main__":
    main()
