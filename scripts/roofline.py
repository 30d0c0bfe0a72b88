"""Roofline accounting for the M^T M matvec (BASELINE.md: >= 50% of HBM roofline).

Uses XLA's compiled cost analysis for the bytes-accessed and FLOP counts of the
jitted kernel, measures wall time on the live device, and reports achieved
bandwidth / FLOP rate against the TPU v5e peaks (819 GB/s HBM, ~49 TFLOP/s f32,
~197 TFLOP/s bf16). The matvec is memory-bound (arithmetic intensity ~1 flop/B),
so the meaningful number is the HBM fraction.

Run: python scripts/roofline.py [--cpu] [--L 12]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

V5E_HBM_GBS = 819.0
V5E_F32_TFLOPS = 49.0


def main():
    if "--cpu" in sys.argv:
        import jax

        jax.config.update("jax_platforms", "cpu")
    L = 12
    for i, a in enumerate(sys.argv):
        if a == "--L":
            L = int(sys.argv[i + 1])
    import jax
    import jax.numpy as jnp
    from jax import lax

    from bench import build_case

    fdm = build_case(L=L)
    N, Ltau = fdm.n_sites, fdm.Ltau
    print(f"device: {jax.devices()[0].platform}, L={L}, N={N}, Ltau={Ltau}")

    for batch, dtype in [(2, jnp.float64), (2, jnp.float32), (8, jnp.float32)]:
        v = jnp.asarray(
            np.random.default_rng(0).standard_normal((batch, Ltau, N)), dtype=dtype
        )
        fdm_dt = fdm.astype(dtype)
        fn = jax.jit(fdm_dt.mul_MtM)
        lowered = fn.lower(v)
        compiled = lowered.compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, list):  # older jax returns [dict]
            cost = cost[0]
        bytes_moved = float(cost.get("bytes accessed", 0.0))
        flops = float(cost.get("flops", 0.0))

        # timing: loop on device to amortize dispatch
        n_iters = 200

        @jax.jit
        def loop(v):
            def body(_, v):
                v = fdm_dt.mul_MtM(v)
                return v / jnp.sqrt(jnp.mean(v * v))

            return lax.fori_loop(0, n_iters, body, v)

        jax.block_until_ready(loop(v))
        t0 = time.perf_counter()
        jax.block_until_ready(loop(v))
        dt_apply = (time.perf_counter() - t0) / n_iters

        gbs = bytes_moved / dt_apply / 1e9
        tflops = flops / dt_apply / 1e12
        print(
            f"batch={batch} {np.dtype(dtype).name}: {dt_apply * 1e3:.3f} ms/apply, "
            f"XLA bytes={bytes_moved / 1e6:.1f} MB, flops={flops / 1e6:.0f} MF -> "
            f"{gbs:.0f} GB/s ({100 * gbs / V5E_HBM_GBS:.0f}% of v5e HBM), "
            f"{tflops:.2f} TF/s ({100 * tflops / V5E_F32_TFLOPS:.1f}% of f32 peak)"
        )


if __name__ == "__main__":
    main()
