"""Tests of the Pallas-fused matvec / whole-solve CG (ops/pallas_fused.py).

These run the kernels in interpret mode (the CPU test backend has no Mosaic);
the compiled path is exercised on the real TPU by bench.py and the driver.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from smoqyelphqmc_tpu.models.fermion_path_integral import build_path_integral
from smoqyelphqmc_tpu.ops.cg import cg_solve
from smoqyelphqmc_tpu.ops.checkerboard import build_checkerboard_structure
from smoqyelphqmc_tpu.ops.fermion_det import FermionDetMatrix
from smoqyelphqmc_tpu.ops.pallas_fused import (
    build_fused_mtm,
    build_fused_pcg,
    partner_onehot,
    shift_classes,
)
from smoqyelphqmc_tpu.ops.spectral_precond import build_spectral

from _models import chain_model, honeycomb_model


def _fdm(model_fn, symmetric=True, **kw):
    geo, tbm, tbp, elph_model, elph = model_fn(**kw)
    fpi = build_path_integral(tbp, elph)
    structure = build_checkerboard_structure(np.asarray(tbp.neighbor_table), tbp.n_sites)
    return FermionDetMatrix.from_path_integral(fpi, structure, symmetric=symmetric)


def test_shift_classes_cover_partner():
    """Every color's partner map decomposes into masked lane shifts."""
    fdm = _fdm(honeycomb_model, L=2, beta=1.0)
    cls = shift_classes(fdm.cb.partner)
    assert cls is not None
    shifts, masks = cls
    N = fdm.n_sites
    for c, (sh, mk) in enumerate(zip(shifts, masks)):
        rebuilt = np.zeros(N, np.int64)
        for s, m in zip(sh, mk):
            rebuilt += ((np.arange(N) + s) % N) * m.astype(np.int64)
        np.testing.assert_array_equal(rebuilt, fdm.cb.partner[c])


def test_partner_onehot_permutes():
    fdm = _fdm(chain_model, L=6, beta=0.5)
    PT = partner_onehot(fdm.cb.partner)
    u = np.random.default_rng(0).standard_normal(fdm.n_sites).astype(np.float32)
    for c in range(fdm.cb.n_colors):
        np.testing.assert_allclose(u @ PT[c], u[fdm.cb.partner[c]], atol=0)


@pytest.mark.parametrize("model_fn,kw", [(chain_model, dict(L=6, beta=0.6)),
                                         (honeycomb_model, dict(L=2, beta=0.6))])
def test_fused_mtm_matches_xla(model_fn, kw, rng):
    fdm = _fdm(model_fn, **kw)
    fused = build_fused_mtm(fdm, interpret=True)
    assert fused is not None and fused.mode == "roll"
    v = jnp.asarray(rng.standard_normal((2, fdm.Ltau, fdm.n_sites)), jnp.float32)
    ref = fdm.astype("float32").mul_MtM(v)
    got = fused(v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-6, atol=2e-6)


@pytest.mark.parametrize("model_fn,kw", [(chain_model, dict(L=6, beta=0.6)),
                                         (honeycomb_model, dict(L=2, beta=0.6))])
def test_fused_mtm_asym_matches_xla(model_fn, kw, rng):
    """ASYMMETRIC-factorization standalone matvec kernel (B = D CB,
    B^T = CB^T D) vs the XLA mul_MtM — closes the round-4 sym-only gap
    (reference asym branch: FermionDetMatrix.jl:329-340)."""
    fdm = _fdm(model_fn, symmetric=False, **kw)
    assert not fdm.symmetric
    fused = build_fused_mtm(fdm, interpret=True)
    assert fused is not None and fused.mode == "roll" and not fused.symmetric
    v = jnp.asarray(rng.standard_normal((2, fdm.Ltau, fdm.n_sites)), jnp.float32)
    ref = fdm.astype("float32").mul_MtM(v)
    got = fused(v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-6, atol=2e-6)


def test_fused_pcg_matches_cg(rng):
    """Whole-solve fused CG agrees with the reference cg_solve + spectral path."""
    fdm = _fdm(chain_model, L=6, beta=0.8, alpha=0.4)
    pre = build_spectral(fdm)
    fused = build_fused_pcg(fdm, pre, interpret=True)
    assert fused is not None
    b = jnp.asarray(rng.standard_normal((2, fdm.Ltau, fdm.n_sites)), jnp.float32)
    x_ref, s_ref = cg_solve(
        fdm.astype("float32").mul_MtM, b, precond=pre.as_operator(), tol=1e-5, maxiter=200
    )
    x, s = fused(b, tol=1e-5, maxiter=200)
    assert bool(s.converged)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref), rtol=2e-4, atol=2e-5)


def test_fused_pcg_warm_start(rng):
    """A warm start from the exact solution converges immediately."""
    fdm = _fdm(chain_model, L=6, beta=0.8, alpha=0.4)
    pre = build_spectral(fdm)
    fused = build_fused_pcg(fdm, pre, interpret=True)
    b = jnp.asarray(rng.standard_normal((2, fdm.Ltau, fdm.n_sites)), jnp.float32)
    x, s = fused(b, tol=1e-5, maxiter=200)
    x2, s2 = fused(b, x0=x, tol=1e-5, maxiter=200)
    assert int(s2.iters) <= 1
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("model_fn,kw", [(chain_model, dict(L=6, beta=0.8, alpha=0.4)),
                                         (honeycomb_model, dict(L=2, beta=0.6, alpha=0.3)),
                                         (honeycomb_model, dict(L=2, beta=0.6, alpha=0.3, ph_sym=False))])
def test_fused_force_matches_xla(model_fn, kw, rng, monkeypatch):
    """The fused force-contraction kernel reproduces the XLA dS_f/dx chain."""
    from smoqyelphqmc_tpu.models.fermion_path_integral import build_path_integral
    from smoqyelphqmc_tpu.ops.pff import fermionic_action_and_force, sample_pseudofermion_fields
    from smoqyelphqmc_tpu.ops.derivatives import build_force_plan
    from smoqyelphqmc_tpu.ops.spectral_precond import build_spectral

    geo, tbm, tbp, elph_model, elph = model_fn(**kw)
    structure = build_checkerboard_structure(np.asarray(tbp.neighbor_table), tbp.n_sites)
    plan = build_force_plan(elph, structure)
    x = jnp.asarray(0.3 * rng.standard_normal(elph.x.shape))
    fpi = build_path_integral(tbp, elph, x=x)
    fdm = FermionDetMatrix.from_path_integral(fpi, structure, symmetric=True)
    pre = build_spectral(fdm)
    key = jax.random.PRNGKey(7)
    Phi, _ = sample_pseudofermion_fields(key, elph, fdm, x)

    def run():
        return fermionic_action_and_force(
            Phi, elph, fdm, x, plan, precond=pre, tol=1e-5, maxiter=400,
            solve_dtype="float32",
        )

    monkeypatch.setenv("SMOQY_FUSED_CG", "0")
    ref = run()
    monkeypatch.setenv("SMOQY_FUSED_CG", "interpret")
    monkeypatch.setenv("SMOQY_FUSED_FORCE", "1")  # opt-in (see ops/pff.py gate)
    monkeypatch.setenv("SMOQY_FUSED_STEP", "0")  # isolate the two-kernel path
    got = run()
    np.testing.assert_allclose(
        np.asarray(got.force), np.asarray(ref.force), rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(float(got.Sf), float(ref.Sf), rtol=2e-5)


@pytest.mark.parametrize("model_fn,kw", [(chain_model, dict(L=6, beta=0.8, alpha=0.4)),
                                         (honeycomb_model, dict(L=2, beta=0.6, alpha=0.3)),
                                         (honeycomb_model, dict(L=2, beta=0.6, alpha=0.3, ph_sym=False))])
def test_fused_pcg_force_matches_xla(model_fn, kw, rng, monkeypatch):
    """The single-call solve+force kernel (default production path) reproduces
    the XLA dS_f/dx chain, cold and warm-started."""
    from smoqyelphqmc_tpu.models.fermion_path_integral import build_path_integral
    from smoqyelphqmc_tpu.ops.pff import fermionic_action_and_force, sample_pseudofermion_fields
    from smoqyelphqmc_tpu.ops.derivatives import build_force_plan
    from smoqyelphqmc_tpu.ops.spectral_precond import build_spectral

    geo, tbm, tbp, elph_model, elph = model_fn(**kw)
    structure = build_checkerboard_structure(np.asarray(tbp.neighbor_table), tbp.n_sites)
    plan = build_force_plan(elph, structure)
    x = jnp.asarray(0.3 * rng.standard_normal(elph.x.shape))
    fpi = build_path_integral(tbp, elph, x=x)
    fdm = FermionDetMatrix.from_path_integral(fpi, structure, symmetric=True)
    pre = build_spectral(fdm)
    key = jax.random.PRNGKey(7)
    Phi, _ = sample_pseudofermion_fields(key, elph, fdm, x)

    def run(warm=None):
        return fermionic_action_and_force(
            Phi, elph, fdm, x, plan, precond=pre, tol=1e-5, maxiter=400,
            solve_dtype="float32", warm_start=warm,
        )

    monkeypatch.setenv("SMOQY_FUSED_CG", "0")
    ref = run()
    monkeypatch.setenv("SMOQY_FUSED_CG", "interpret")
    monkeypatch.setenv("SMOQY_FUSED_STEP", "1")
    got = run()
    scale = float(np.max(np.abs(np.asarray(ref.force)))) + 1e-12
    np.testing.assert_allclose(
        np.asarray(got.force), np.asarray(ref.force), rtol=2e-4, atol=2e-4 * scale
    )
    np.testing.assert_allclose(float(got.Sf), float(ref.Sf), rtol=2e-5)
    assert bool(got.stats.converged)
    # warm start from a perturbation of the solution: fewer iterations, same force
    warm = ref.psi_raw + 0.05 * jnp.asarray(
        rng.standard_normal(ref.psi_raw.shape), ref.psi_raw.dtype
    )
    got_w = run(warm=warm)
    assert int(got_w.stats.iters) <= int(got.stats.iters)
    np.testing.assert_allclose(
        np.asarray(got_w.force), np.asarray(ref.force), rtol=2e-4, atol=2e-4 * scale
    )


def test_fused_step_reachable_with_mixed_precision(rng, monkeypatch):
    """mixed=True (the production driver default) must not mask the fused
    solve+force path: for an f32 force solve, defect correction is meaningless
    and the gate treats mixed as False. Regression for the round-2 gate
    mismatch (driver ran the XLA force chain while bench ran the fused one)."""
    from smoqyelphqmc_tpu.models.fermion_path_integral import build_path_integral
    from smoqyelphqmc_tpu.ops.pff import fermionic_action_and_force, sample_pseudofermion_fields
    from smoqyelphqmc_tpu.ops.derivatives import build_force_plan
    from smoqyelphqmc_tpu.ops.spectral_precond import build_spectral

    geo, tbm, tbp, elph_model, elph = chain_model(L=6, beta=0.8, alpha=0.4)
    structure = build_checkerboard_structure(np.asarray(tbp.neighbor_table), tbp.n_sites)
    plan = build_force_plan(elph, structure)
    x = jnp.asarray(0.3 * rng.standard_normal(elph.x.shape))
    fpi = build_path_integral(tbp, elph, x=x)
    fdm = FermionDetMatrix.from_path_integral(fpi, structure, symmetric=True)
    pre = build_spectral(fdm)
    Phi, _ = sample_pseudofermion_fields(jax.random.PRNGKey(7), elph, fdm, x)

    def run(mixed):
        return fermionic_action_and_force(
            Phi, elph, fdm, x, plan, precond=pre, tol=1e-5, maxiter=400,
            solve_dtype="float32", mixed=mixed,
        )

    monkeypatch.setenv("SMOQY_FUSED_CG", "interpret")
    monkeypatch.setenv("SMOQY_FUSED_STEP", "1")
    a = run(mixed=False)
    b = run(mixed=True)
    # identical program: both take the fused solve+force branch
    np.testing.assert_array_equal(np.asarray(a.force), np.asarray(b.force))
    np.testing.assert_array_equal(np.asarray(a.psi_raw), np.asarray(b.psi_raw))


def test_vmem_gate_refuses_oversize():
    """Configurations whose Krylov state cannot fit VMEM must fall back to the
    XLA path (build_* returns None) instead of hard-failing the Mosaic compile
    (observed at N = 648, Ltau = 240 before the gate)."""
    from smoqyelphqmc_tpu.ops.pallas_fused import _fits_vmem, build_fused_pcg
    from smoqyelphqmc_tpu.ops.spectral_precond import build_spectral

    # headline config fits at chunk 2, not 4; L = 18 (N = 648) fits at none
    extra = 2 * 240 * 240 + 288 * 288
    assert _fits_vmem(240, 288, 3, 8, 12, 2, extra)
    assert not _fits_vmem(240, 288, 3, 8, 12, 4, extra)
    assert not _fits_vmem(240, 648, 3, 8, 12, 1, 2 * 240 * 240 + 648 * 648)

    # builder-level: a small model still builds the fused solver
    fdm = _fdm(chain_model, L=6, beta=0.8, alpha=0.4)
    pre = build_spectral(fdm)
    assert build_fused_pcg(fdm, pre, interpret=True) is not None
    # a genuinely large shape is refused regardless of chunk
    assert not _fits_vmem(800, 1152, 4, 10, 12, 1, 1152 * 1152)
    from smoqyelphqmc_tpu.ops.pallas_fused import _VMEM_BUDGET_BYTES

    assert _VMEM_BUDGET_BYTES <= 16 * 1024 * 1024  # v5e per-core VMEM


def test_solve_mtm_fused_gate_matches(rng, monkeypatch):
    """solve_MtM routed through the fused path (SMOQY_FUSED_CG=interpret)
    agrees with the default XLA path."""
    from smoqyelphqmc_tpu.ops.fermion_det import solve_MtM

    fdm = _fdm(chain_model, L=6, beta=0.8, alpha=0.4)
    pre = build_spectral(fdm)
    fdm32 = fdm.astype("float32")  # callers pass dtype-consistent operators (ops/pff.py)
    b = jnp.asarray(rng.standard_normal((2, fdm.Ltau, fdm.n_sites)), jnp.float32)
    monkeypatch.setenv("SMOQY_FUSED_CG", "0")
    x_ref, _ = solve_MtM(fdm32, b, precond=pre, tol=1e-5, maxiter=200)
    monkeypatch.setenv("SMOQY_FUSED_CG", "interpret")
    x, s = solve_MtM(fdm32, b, precond=pre, tol=1e-5, maxiter=200)
    assert bool(s.converged)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref), rtol=2e-4, atol=2e-5)
    # mixed f64 defect correction with the fused inner solver
    b64 = b.astype(jnp.float64)
    x64_ref, _ = solve_MtM(fdm, b64, precond=pre, tol=1e-10, maxiter=400, mixed=False)
    x64, s64 = solve_MtM(fdm, b64, precond=pre, tol=1e-10, maxiter=400, mixed=True)
    assert bool(s64.converged)
    np.testing.assert_allclose(np.asarray(x64), np.asarray(x64_ref), rtol=1e-8, atol=1e-9)


def test_fused_pcg_asymmetric_matches_cg(rng):
    """The fused whole-solve kernel also covers the ASYMMETRIC factorization
    (B = D CB, B^T = CB^T D) with the half-angle spectral preconditioner."""
    geo, tbm, tbp, elph_model, elph = chain_model(L=6, beta=0.8, alpha=0.4)
    fpi = build_path_integral(tbp, elph)
    structure = build_checkerboard_structure(np.asarray(tbp.neighbor_table), tbp.n_sites)
    fdm = FermionDetMatrix.from_path_integral(fpi, structure, symmetric=False)
    pre = build_spectral(fdm)
    fused = build_fused_pcg(fdm, pre, interpret=True)
    assert fused is not None and not fused.symmetric
    b = jnp.asarray(rng.standard_normal((2, fdm.Ltau, fdm.n_sites)), jnp.float32)
    x_ref, s_ref = cg_solve(
        fdm.astype("float32").mul_MtM, b, precond=pre.as_operator(), tol=1e-5, maxiter=400
    )
    x, s = fused(b, tol=1e-5, maxiter=400)
    assert bool(s.converged)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref), rtol=2e-4, atol=2e-5)


def test_fused_pcg_ssh_matches_cg(rng):
    """SSH couplings make the hopping tables time-dependent ((Ltau, N) planes,
    no static-row compression) — the fused solver must still match XLA."""
    geo, tbm, tbp, elph_model, elph = chain_model(L=6, beta=0.8, alpha=0.4, ssh=True)
    x = jnp.asarray(0.3 * np.random.default_rng(1).standard_normal(elph.x.shape))
    fpi = build_path_integral(tbp, elph, x=x)
    structure = build_checkerboard_structure(np.asarray(tbp.neighbor_table), tbp.n_sites)
    fdm = FermionDetMatrix.from_path_integral(fpi, structure, symmetric=True)
    assert not fdm.static_hops
    pre = build_spectral(fdm)
    fused = build_fused_pcg(fdm, pre, interpret=True)
    assert fused is not None
    b = jnp.asarray(rng.standard_normal((2, fdm.Ltau, fdm.n_sites)), jnp.float32)
    x_ref, _ = cg_solve(
        fdm.astype("float32").mul_MtM, b, precond=pre.as_operator(), tol=1e-5, maxiter=400
    )
    xs, s = fused(b, tol=1e-5, maxiter=400)
    assert bool(s.converged)
    np.testing.assert_allclose(np.asarray(xs), np.asarray(x_ref), rtol=2e-4, atol=2e-5)


def test_fused_step_ghost_walker_rows(rng, monkeypatch):
    """The ghost-walker trick (updates/hmc.py:hmc_update_ghost): vmapping the
    fused solve+force over [real, zero-Phi ghost] must (a) reproduce the XLA
    force on the REAL row, and (b) solve the ghost row in ZERO iterations
    (|b| = 0 exits the in-kernel Krylov loop immediately) with finite
    outputs — the property that makes the ghost near-free."""
    from smoqyelphqmc_tpu.models.fermion_path_integral import build_path_integral
    from smoqyelphqmc_tpu.ops.pff import fermionic_action_and_force, sample_pseudofermion_fields
    from smoqyelphqmc_tpu.ops.derivatives import build_force_plan
    from smoqyelphqmc_tpu.ops.spectral_precond import build_spectral

    geo, tbm, tbp, elph_model, elph = chain_model(L=6, beta=0.8, alpha=0.4)
    structure = build_checkerboard_structure(np.asarray(tbp.neighbor_table), tbp.n_sites)
    plan = build_force_plan(elph, structure)
    x = jnp.asarray(0.3 * rng.standard_normal(elph.x.shape))
    fpi = build_path_integral(tbp, elph, x=x)
    fdm = FermionDetMatrix.from_path_integral(fpi, structure, symmetric=True)
    pre = build_spectral(fdm)
    Phi, _ = sample_pseudofermion_fields(jax.random.PRNGKey(7), elph, fdm, x)

    def run(phi):
        return fermionic_action_and_force(
            Phi * phi, elph, fdm, x, plan, precond=pre, tol=1e-5, maxiter=400,
            solve_dtype="float32",
        )

    monkeypatch.setenv("SMOQY_FUSED_CG", "0")
    ref = run(jnp.asarray(1.0))
    monkeypatch.setenv("SMOQY_FUSED_CG", "interpret")
    monkeypatch.setenv("SMOQY_FUSED_STEP", "1")
    got = jax.vmap(run)(jnp.asarray([1.0, 0.0]))
    scale = float(np.max(np.abs(np.asarray(ref.force)))) + 1e-12
    np.testing.assert_allclose(
        np.asarray(got.force[0]), np.asarray(ref.force), rtol=2e-4, atol=2e-4 * scale
    )
    np.testing.assert_allclose(float(got.Sf[0]), float(ref.Sf), rtol=2e-5)
    # ghost row: zero rhs -> zero iterations, all outputs exactly zero
    assert int(got.stats.iters[1]) == 0
    np.testing.assert_array_equal(np.asarray(got.force[1]), 0.0)
    np.testing.assert_array_equal(np.asarray(got.psi_raw[1]), 0.0)
    assert bool(got.stats.converged[1])
