"""Minimal-repro ladder for the UNVMAPPED fused solve+force miscompile.

Round-2 forensics (WORKLOG 35, scripts/device_sanity.py): the fused PCG kernel
with the in-kernel force epilogue (_pcg_force_kernel) emits deterministically
~30x-wrong P1/P2 planes when lowered UNVMAPPED *and* its consumers compile into
the same program — while (a) every in-kernel stage matches interpret mode, (b)
the kernel in an isolated jit is exact, and (c) the identical program vmapped
over >= 2 walkers is exact. This script shrinks the failing context one rung at
a time so the trigger can be filed against the toolchain (VERDICT round 2,
item 3c): each rung jits the SAME solve_force call with a progressively larger
surrounding program and compares P1/P2 against the isolated call.

Run on the real device: python scripts/miscompile_repro.py [--rungs 1,2,...]
Exit code 0 = no rung corrupts (toolchain fixed -> re-enable the unvmapped
gate in ops/pff.py); nonzero = prints the first failing rung.
"""

import os
import sys

sys.path.insert(0, ".")

os.environ.setdefault("SMOQY_FUSED_CG", "auto")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import build_sim
    from smoqyelphqmc_tpu.ops.derivatives import holstein_force_from_planes
    from smoqyelphqmc_tpu.ops.lambda_shift import build_lambda, ldiv_lambda_T
    from smoqyelphqmc_tpu.ops.pallas_fused import build_fused_pcg
    from smoqyelphqmc_tpu.ops.pff import sample_pseudofermion_fields
    from smoqyelphqmc_tpu.updates.context import make_fdm

    L, beta = 12, 12.0
    for i, a in enumerate(sys.argv):
        if a == "--L":
            L = int(sys.argv[i + 1])
        if a == "--beta":
            beta = float(sys.argv[i + 1])
    ctx, state = build_sim(L=L, beta=beta)
    elph, x64 = ctx.elph, state.x
    x = x64.astype(jnp.float32)
    fdm64 = make_fdm(ctx, x64)
    Phi64, _ = sample_pseudofermion_fields(jax.random.PRNGKey(0), elph, fdm64, x64)
    Phi = Phi64.astype(jnp.float32)

    import jax.tree_util as jtu

    elph32 = jtu.tree_map(
        lambda a: a.astype(jnp.float32)
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
        else a,
        elph,
    )

    def solve_force(xv, want_planes=True):
        """The production composition from ops/pff.py:fermionic_action_and_force."""
        fdm = make_fdm(ctx, xv, dtype=jnp.float32)
        pre = state.precond
        Lam = build_lambda(elph32, xv, fdm.n_sites)
        rhs = ldiv_lambda_T(Lam, Phi)
        fused = build_fused_pcg(fdm, pre)
        assert fused is not None and fused.can_force
        psi_raw, P1, P2, stats = fused.solve_force(
            rhs, Lam, tol=1e-6, maxiter=2000, want_p2=True
        )
        return psi_raw, P1, P2, Lam, stats

    # ------------------------------------------------------------------
    # reference: the kernel in ISOLATION (known-exact per round-2 forensics)
    # ------------------------------------------------------------------
    iso = jax.jit(lambda xv: solve_force(xv)[:3])
    ref_psi, ref_P1, ref_P2 = [np.asarray(a) for a in iso(x)]

    def compare(name, got_P1, got_P2, extra=""):
        s1 = np.max(np.abs(ref_P1)) + 1e-30
        s2 = np.max(np.abs(ref_P2)) + 1e-30
        d1 = np.max(np.abs(np.asarray(got_P1) - ref_P1)) / s1
        d2 = np.max(np.abs(np.asarray(got_P2) - ref_P2)) / s2
        bad = d1 > 1e-3 or d2 > 1e-3
        print(f"[{'CORRUPT' if bad else 'ok':7s}] {name}: P1 {d1:.2e} P2 {d2:.2e} {extra}")
        return bad

    # ------------------------------------------------------------------
    # the ladder: each rung adds one consumer/producer to the jitted program
    # ------------------------------------------------------------------
    def rung1(xv):
        "planes + trivial consumer (scalar sums returned alongside)"
        _, P1, P2, _, _ = solve_force(xv)
        return P1, P2, jnp.sum(P1), jnp.sum(P2)

    def rung2(xv):
        "planes consumed by holstein_force_from_planes (production consumer)"
        _, P1, P2, Lam, _ = solve_force(xv)
        from smoqyelphqmc_tpu.ops.derivatives import ForcePlan  # noqa: F401

        force = holstein_force_from_planes(P1, P2, elph32, xv, Lam, ctx.plan)
        return P1, P2, force

    def rung3(xv):
        "force consumed by a momentum-like update (p -= dt * F)"
        _, P1, P2, Lam, _ = solve_force(xv)
        force = holstein_force_from_planes(P1, P2, elph32, xv, Lam, ctx.plan)
        p = jnp.zeros_like(force) - 0.01 * force
        return P1, P2, p

    def rung4(xv):
        "x itself updated from the force and RETURNED (carry-shaped dataflow)"
        _, P1, P2, Lam, _ = solve_force(xv)
        force = holstein_force_from_planes(P1, P2, elph32, xv, Lam, ctx.plan)
        xv2 = xv - 0.01 * force
        return P1, P2, xv2

    def rung5(xv):
        "two chained solve_force calls through an x update (2-step trajectory)"
        psi, P1a, P2a, Lam, _ = solve_force(xv)
        force = holstein_force_from_planes(P1a, P2a, elph32, xv, Lam, ctx.plan)
        xv2 = xv - 0.01 * force
        _, P1b, P2b, Lam2, _ = solve_force(xv2)
        return P1a, P2a, (P1b, P2b)

    def rung6(xv):
        "lax.scan over 3 leapfrog-like steps (the production trajectory shape)"
        def body(carry, _):
            xc, pc = carry
            _, P1, P2, Lam, _ = solve_force(xc)
            force = holstein_force_from_planes(P1, P2, elph32, xc, Lam, ctx.plan)
            pc = pc - 0.01 * force
            xc = xc + 0.01 * pc
            return (xc, pc), (P1, P2)

        (xf, pf), (P1s, P2s) = jax.lax.scan(body, (xv, jnp.zeros_like(xv)), None, length=3)
        return P1s[0], P2s[0], xf

    rungs = [rung1, rung2, rung3, rung4, rung5, rung6]
    pick = None
    for i, a in enumerate(sys.argv):
        if a == "--rungs":
            pick = {int(s) for s in sys.argv[i + 1].split(",")}
    failed = []
    for k, fn in enumerate(rungs, start=1):
        if pick and k not in pick:
            continue
        try:
            out = jax.jit(fn)(x)
            jax.block_until_ready(out)
            if compare(f"rung{k} ({fn.__doc__})", out[0], out[1]):
                failed.append(k)
        except Exception as e:  # pragma: no cover
            print(f"[ERROR  ] rung{k}: {e}")
            failed.append(k)

    # ------------------------------------------------------------------
    # rung 7: the FULL W=1 production sweep through the fused epilogue.
    # Round-5 measurement: rungs 1-6 run clean on the current toolchain yet
    # this rung still corrupts (acceptance 0.000, ~353 iters/solve vs 8.3
    # healthy) — the trigger needs the full reflection + swap + 24-step-HMC
    # context (warm-start history carry + carried preconditioner), not just
    # a 3-step scan. Health is probed through acceptance/iteration counts:
    # corrupt forces produce garbage proposals that the (separate, exact)
    # f64 endpoint actions reject.
    # ------------------------------------------------------------------
    if pick is None or 7 in pick:
        from smoqyelphqmc_tpu.updates.global_updates import reflection_update, swap_update
        from smoqyelphqmc_tpu.updates.hmc import HMCParams, hmc_update

        params = HMCParams(Nt=24, fused_step_force=True)

        @jax.jit
        def sweep(s, acc, iters):
            s, _ = reflection_update(ctx, s)
            s, _ = swap_update(ctx, s)
            s, h = hmc_update(ctx, s, params)
            return s, acc + h.accepted.astype(jnp.float64), iters + h.iters_avg

        s = state
        acc = jnp.zeros((), jnp.float64)
        it = jnp.zeros((), jnp.float64)
        n = 6
        for _ in range(n):
            s, acc, it = sweep(s, acc, it)
            np.asarray(it.ravel()[0:1])
        acc_rate = float(acc) / n
        iters = float(it) / n
        bad = acc_rate < 0.5 or iters > 50.0
        print(
            f"[{'CORRUPT' if bad else 'ok':7s}] rung7 (full W=1 production sweep, "
            f"fused_step_force=True): acceptance {acc_rate:.3f}, iters/solve {iters:.1f}"
        )
        if bad:
            failed.append(7)

    if failed:
        print(f"\nfirst corrupting rung: {failed[0]} — minimal repro context")
        sys.exit(1)
    print("\nall rungs clean INCLUDING the full production sweep: the unvmapped "
          "miscompile is fixed on this toolchain — re-enable the unvmapped "
          "fused_step default (updates/hmc.py HMCParams.fused_step_force)")


if __name__ == "__main__":
    main()
