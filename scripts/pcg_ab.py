"""A/B the fused whole-solve PCG at the headline config on the TPU.

Measures cold and warm-started solve wall time + iteration counts at batch 2
(single-walker force path) and batch 8 (W=8 walker path), comparing against
the XLA CG path (SMOQY_FUSED_CG=0 re-run). Used for the half-spectrum + bf16
preconditioner A/B (BENCH.md).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from bench import build_case
    from smoqyelphqmc_tpu.ops.fermion_det import solve_MtM
    from smoqyelphqmc_tpu.ops.spectral_precond import build_spectral

    fdm = build_case()
    pre = build_spectral(fdm)

    rng = np.random.default_rng(0)

    @jax.jit
    def solve(fdm_, pre_, b, x0):
        return solve_MtM(fdm_, b, precond=pre_, tol=1e-5, maxiter=500, x0=x0)

    for B in (2, 8):
        b = jnp.asarray(
            rng.standard_normal((B, fdm.Ltau, fdm.n_sites)), dtype=jnp.float32
        )
        x, st = solve(fdm, pre, b, None)
        jax.block_until_ready(x)
        # cold
        t0 = time.perf_counter()
        reps = 10
        for _ in range(reps):
            x, st = solve(fdm, pre, b, None)
        jax.block_until_ready(x)
        cold = (time.perf_counter() - t0) / reps * 1e3
        it_cold = int(st.iters)
        # warm (exact solution as guess — measures fixed overhead; then a
        # perturbed guess for the realistic trajectory case)
        xw = x + 0.01 * jnp.asarray(
            rng.standard_normal(x.shape), dtype=jnp.float32
        ) * jnp.sqrt(jnp.mean(x * x))
        xj, stj = solve(fdm, pre, b, xw)
        jax.block_until_ready(xj)
        t0 = time.perf_counter()
        for _ in range(reps):
            xj, stj = solve(fdm, pre, b, xw)
        jax.block_until_ready(xj)
        warm = (time.perf_counter() - t0) / reps * 1e3
        resid = float(jnp.linalg.norm(fdm.mul_MtM(x) - b) / jnp.linalg.norm(b))
        print(
            f"B={B}: cold {cold:7.2f} ms ({it_cold} iters)  "
            f"warm {warm:7.2f} ms ({int(stj.iters)} iters)  "
            f"resid {resid:.2e}  converged {bool(st.converged)}"
        )


if __name__ == "__main__":
    main()
