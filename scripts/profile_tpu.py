"""Profile the main compute stages on the real TPU at the headline config."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timeit(fn, *args, n=3):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main(L=12, beta=12.0, dtau=0.05, Nt=24):
    import jax
    import jax.numpy as jnp

    from bench import build_case
    from smoqyelphqmc_tpu.ops.cg import cg_solve
    from smoqyelphqmc_tpu.ops.kpm import KPMPreconditioner, kpm_apply, kpm_update

    fdm = build_case(L=L, beta=beta, dtau=dtau)
    print(f"Ltau={fdm.Ltau} N={fdm.n_sites}")
    v = jnp.asarray(np.random.default_rng(0).standard_normal((2, fdm.Ltau, fdm.n_sites)))

    t = timeit(jax.jit(fdm.mul_MtM), v, n=20)
    print(f"mul_MtM: {t*1e3:.2f} ms -> {1/t:.0f}/s")

    key = jax.random.PRNGKey(0)
    pre = KPMPreconditioner.build(fdm, key)
    print("KPM active:", bool(pre.active), "bounds:", float(pre.lo), float(pre.hi))
    print("caps:", sorted(set(pre.caps.tolist())), "buckets:", pre.buckets[:6])

    t = timeit(jax.jit(kpm_apply), pre, v, n=10)
    print(f"kpm_apply: {t*1e3:.2f} ms")

    t = timeit(jax.jit(lambda p, f: kpm_update(p, f, key)), pre, fdm, n=5)
    print(f"kpm_update: {t*1e3:.2f} ms")

    solve_plain = jax.jit(lambda b: cg_solve(fdm.mul_MtM, b, tol=1e-10, maxiter=4000))
    x, stats = solve_plain(v)
    jax.block_until_ready(x)
    print(f"plain CG iters: {int(stats.iters)}")
    t = timeit(lambda b: solve_plain(b)[0], v, n=2)
    print(f"plain CG solve: {t*1e3:.1f} ms")

    solve_pre = jax.jit(
        lambda b: cg_solve(fdm.mul_MtM, b, precond=pre.as_operator(), tol=1e-10, maxiter=4000)
    )
    x, stats = solve_pre(v)
    jax.block_until_ready(x)
    print(f"precond CG iters: {int(stats.iters)}")
    t = timeit(lambda b: solve_pre(b)[0], v, n=2)
    print(f"precond CG solve: {t*1e3:.1f} ms")


if __name__ == "__main__":
    main()
