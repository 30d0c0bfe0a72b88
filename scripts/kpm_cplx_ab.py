"""On-device apply-time A/B: fused complex-hopping KPM kernel vs the XLA scan.

The round-4 fused matrix-free KPM kernel excluded complex-hopping models
(ops/kpm.py gated fused_plan on `not complex_pair`), leaving them on the XLA
scan apply — the dispatch-latency-bound path (~24 ms/apply class at N = 1152).
Round 5 lifted the exclusion (_kpm_mf_cplx_kernel); this script measures the
apply time of both paths at production-like sizes for BOTH factorizations, on
a complex-flux Holstein chain (t e^{i phi}), beta = 12, Ltau = 240.

Run: python scripts/kpm_cplx_ab.py [--sizes 288,1152] [--iters 50]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tests")


def timed_apply(pre, r, n):
    import jax
    from smoqyelphqmc_tpu.ops.kpm import kpm_apply
    from jax import lax

    @jax.jit
    def loop(r):
        def body(_, r):
            r = kpm_apply(pre, r)
            import jax.numpy as jnp

            return r / jnp.sqrt(jnp.mean(r * r))

        return lax.fori_loop(0, n, body, r)

    def drain(x):
        np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0:1])

    drain(loop(r))  # compile
    t0 = time.perf_counter()
    drain(loop(r))
    return (time.perf_counter() - t0) / n * 1e3  # ms/apply


def main():
    import os

    sizes = [288, 1152]
    n = 50
    for i, a in enumerate(sys.argv):
        if a == "--sizes":
            sizes = [int(s) for s in sys.argv[i + 1].split(",")]
        if a == "--iters":
            n = int(sys.argv[i + 1])
    import jax
    import jax.numpy as jnp

    from test_complex_hoppings import complex_chain_model
    from smoqyelphqmc_tpu.models.fermion_path_integral import build_path_integral
    from smoqyelphqmc_tpu.ops.checkerboard import build_checkerboard_structure
    from smoqyelphqmc_tpu.ops.fermion_det import FermionDetMatrix
    from smoqyelphqmc_tpu.ops.kpm import KPMPreconditioner

    print(f"device: {jax.devices()[0]}")
    print("| N | factorization | XLA scan ms/apply | fused ms/apply | speedup |")
    print("|---|---|---|---|---|")
    for N in sizes:
        geo, tbm, tbp, em, elph = complex_chain_model(L=N, beta=12.0, dtau=0.05)
        fpi = build_path_integral(tbp, elph)
        st = build_checkerboard_structure(np.asarray(tbp.neighbor_table), tbp.n_sites)
        for symmetric in (True, False):
            fdm = FermionDetMatrix.from_path_integral(fpi, st, symmetric=symmetric)
            assert fdm.complex_hops
            pre = KPMPreconditioner.build(fdm, jax.random.PRNGKey(0), matrix_free=True)
            if not bool(pre.active):
                print(f"| {N} | {'sym' if symmetric else 'asym'} | INACTIVE | | |")
                continue
            rng = np.random.default_rng(1)
            r = jnp.asarray(
                rng.standard_normal((2, fdm.Ltau, fdm.n_sites)), jnp.float32
            )
            os.environ["SMOQY_FUSED_KPM"] = "0"
            t_xla = timed_apply(pre, r, n)
            os.environ["SMOQY_FUSED_KPM"] = "auto"
            t_fused = timed_apply(pre, r, n)
            print(
                f"| {N} | {'sym' if symmetric else 'asym'} | {t_xla:.2f} | "
                f"{t_fused:.2f} | {t_xla / t_fused:.1f}x |",
                flush=True,
            )


if __name__ == "__main__":
    main()
