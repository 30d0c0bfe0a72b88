"""Disorder hooks and spin-resolved correlation kinds."""

import jax
import numpy as np

from smoqyelphqmc_tpu import (
    Bond,
    ElectronPhononModel,
    ElectronPhononParameters,
    HolsteinCoupling,
    Lattice,
    ModelGeometry,
    PhononMode,
    TightBindingModel,
    TightBindingParameters,
    UnitCell,
)
from smoqyelphqmc_tpu.measure.container import MeasurementSpec, make_measurements
from smoqyelphqmc_tpu.measure.greens_estimator import build_greens_estimator, update_greens_estimator
from smoqyelphqmc_tpu.updates.context import initialize_qmc, make_fdm

from _models import honeycomb_model


def test_disorder_expansion():
    """t_std / eps_std / Omega_std / alpha_std produce per-cell variation."""
    uc = UnitCell(lattice_vecs=[[1.0]], basis_vecs=[[0.0]])
    geo = ModelGeometry(uc, Lattice(L=[8]))
    bond = Bond(orbitals=(0, 0), displacement=[1])
    geo.add_bond(bond)
    tbm = TightBindingModel(geo, [bond], [1.0], [0.1], mu=0.0, t_std=[0.2], eps_std=[0.3])
    em = ElectronPhononModel(geo, tbm)
    p = em.add_phonon_mode(PhononMode([0.0], 1.0, Omega_std=0.1))
    em.add_holstein_coupling(HolsteinCoupling(p, 0, [0], 0.5, alpha_std=0.05))
    rng = np.random.default_rng(7)
    tbp = TightBindingParameters.from_model(tbm, rng)
    elph = ElectronPhononParameters.from_model(1.0, 0.1, em, tbp, rng)
    assert np.std(np.asarray(tbp.t0)) > 0.05
    assert np.std(np.asarray(tbp.eps)) > 0.1
    assert np.std(np.asarray(elph.Omega)) > 0.02
    assert np.std(np.asarray(elph.hol_alpha)) > 0.01


def test_spin_resolved_correlations_run():
    geo, tbm, tbp, _, elph = honeycomb_model(L=2, beta=0.4, dtau=0.1, alpha=0.4)
    ctx, state = initialize_qmc(tbp, elph, seed=0, tol=1e-7, use_preconditioner=False)
    fdm = make_fdm(ctx, state.x)
    est = build_greens_estimator(elph.Ltau, geo.n_orbitals, geo.L, Nrv=4)
    est = update_greens_estimator(est, fdm, jax.random.PRNGKey(1), tol=1e-7, maxiter=2000).estimator
    spec = MeasurementSpec(geometry=geo)
    spec.add_correlation("density_upup", [(0, 0)])
    spec.add_correlation("density_updn", [(0, 0)])
    spec.add_correlation("spin_x", [(0, 0)])
    spec.add_correlation("bond_upup", [(2, 2)])
    spec.add_correlation("bond_updn", [(2, 2)])
    spec.add_correlation("current_upup", [(2, 2)])
    out = make_measurements(ctx, spec, est, state.x)
    for name, arr in out["correlations"].items():
        assert np.all(np.isfinite(np.asarray(arr[0]))), name
    # up-up + up-dn parts recombine into the spin-summed density correlation:
    # D = 2 (upup + updn) for identical spin species
    spec2 = MeasurementSpec(geometry=geo)
    spec2.add_correlation("density", [(0, 0)])
    out2 = make_measurements(ctx, spec2, est, state.x)
    upup = np.asarray(out["correlations"]["density_upup"][0])
    updn = np.asarray(out["correlations"]["density_updn"][0])
    total = np.asarray(out2["correlations"]["density"][0])
    np.testing.assert_allclose(total, 2 * (upup + updn), atol=1e-10)


def test_full_reference_name_surface():
    """Every correlation-kind name in the reference's dispatch table
    (make_measurements.jl:93-394) resolves, and under spin symmetry the dn
    variants equal their up counterparts; the reference's NaN globals and the
    action_bosonic name are present."""
    geo, tbm, tbp, _, elph = honeycomb_model(L=2, beta=0.4, dtau=0.1, alpha=0.4)
    ctx, state = initialize_qmc(tbp, elph, seed=0, tol=1e-7, use_preconditioner=False)
    fdm = make_fdm(ctx, state.x)
    est = build_greens_estimator(elph.Ltau, geo.n_orbitals, geo.L, Nrv=4)
    est = update_greens_estimator(est, fdm, jax.random.PRNGKey(1), tol=1e-7, maxiter=2000).estimator
    spec = MeasurementSpec(geometry=geo)
    pairs = {"greens": [(0, 1)], "density": [(0, 0)], "bond": [(2, 2)], "current": [(2, 2)]}
    for kind in ("greens", "greens_up", "greens_dn"):
        spec.add_correlation(kind, pairs["greens"])
    for kind in ("density_upup", "density_updn", "density_dndn", "density_dnup"):
        spec.add_correlation(kind, pairs["density"])
    for kind in ("bond_upup", "bond_updn", "bond_dndn", "bond_dnup"):
        spec.add_correlation(kind, pairs["bond"])
    for kind in ("current_upup", "current_updn", "current_dndn", "current_dnup"):
        spec.add_correlation(kind, pairs["current"])
    out = make_measurements(ctx, spec, est, state.x)
    corr = {k: np.asarray(v[0]) for k, v in out["correlations"].items()}
    np.testing.assert_allclose(corr["greens_up"], corr["greens"], atol=1e-12)
    np.testing.assert_allclose(corr["greens_dn"], corr["greens"], atol=1e-12)
    for base in ("density", "bond", "current"):
        np.testing.assert_allclose(corr[f"{base}_dndn"], corr[f"{base}_upup"], atol=1e-12)
        np.testing.assert_allclose(corr[f"{base}_dnup"], corr[f"{base}_updn"], atol=1e-12)
    g = out["global"]
    assert "action_bosonic" in g and np.isfinite(float(g["action_bosonic"][0]))
    for name in ("sgndetGup", "sgndetGdn", "logdetGup", "logdetGdn",
                 "action_fermionic", "action_total"):
        assert name in g and np.isnan(float(g[name][0]))


def test_current_on_non_t_bond_raises():
    """Requesting a current correlation for a bond that carries no hopping must
    be a hard error, not a silent fallback."""
    import pytest

    geo, tbm, tbp, _, elph = honeycomb_model(L=2, beta=0.4, dtau=0.1, alpha=0.4)
    ctx, state = initialize_qmc(tbp, elph, seed=0, tol=1e-7, use_preconditioner=False)
    fdm = make_fdm(ctx, state.x)
    est = build_greens_estimator(elph.Ltau, geo.n_orbitals, geo.L, Nrv=4)
    est = update_greens_estimator(est, fdm, jax.random.PRNGKey(1), tol=1e-7, maxiter=2000).estimator
    # add a non-hopping bond to the geometry, then ask for its current
    from smoqyelphqmc_tpu import Bond

    extra = geo.add_bond(Bond(orbitals=(0, 0), displacement=[1, 0]))
    spec = MeasurementSpec(geometry=geo)
    spec.add_correlation("current", [(extra, extra)])
    with pytest.raises(ValueError, match="not a hopping"):
        make_measurements(ctx, spec, est, state.x)
