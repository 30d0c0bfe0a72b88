"""Measurement orchestrator tests: scalar oracle checks against exact free-fermion
values, correlation shapes, composite assembly, jit-compilation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smoqyelphqmc_tpu.measure.container import (
    MeasurementAccumulator,
    MeasurementSpec,
    make_measurements,
)
from smoqyelphqmc_tpu.measure.greens_estimator import build_greens_estimator, update_greens_estimator
from smoqyelphqmc_tpu.measure.scalar import measure_n
from smoqyelphqmc_tpu.ops.fermion_det import dense_M
from smoqyelphqmc_tpu.updates.context import initialize_qmc, make_fdm

from _models import chain_model, honeycomb_model


def _setup(model_fn, Nrv=40, seed=0, **kw):
    geo, tbm, tbp, elph_model, elph = model_fn(seed=seed, **kw)
    ctx, state = initialize_qmc(tbp, elph, seed=seed, tol=1e-12, use_preconditioner=False)
    fdm = make_fdm(ctx, state.x)
    est = build_greens_estimator(elph.Ltau, geo.n_orbitals, geo.L, Nrv=Nrv)
    upd = update_greens_estimator(est, fdm, jax.random.PRNGKey(seed + 1), tol=1e-12, maxiter=5000)
    assert bool(upd.converged)
    return geo, ctx, state, fdm, upd.estimator


def test_density_matches_dense():
    geo, ctx, state, fdm, est = _setup(chain_model, Nrv=60, L=4, beta=0.8, mu=0.3)
    Ginv = np.linalg.inv(dense_M(fdm))
    Ltau, N = fdm.Ltau, fdm.n_sites
    TrG = np.trace(Ginv) / (Ltau * N)
    exact_n = 1.0 - TrG
    n_re, n_im = measure_n(est)
    np.testing.assert_allclose(float(n_re), exact_n, atol=0.02)
    assert abs(float(n_im)) < 0.02


def test_make_measurements_full_pass():
    geo, ctx, state, fdm, est = _setup(honeycomb_model, Nrv=6, L=2, beta=0.6, alpha=0.5)
    spec = MeasurementSpec(geometry=geo)
    spec.add_correlation("greens", [(0, 0), (1, 1), (0, 1)], time_displaced=True)
    spec.add_correlation("phonon_greens", [(0, 0), (1, 1)], time_displaced=True)
    spec.add_correlation("density", [(0, 0), (1, 1)], integrated=True)
    spec.add_correlation("pair", [(0, 0), (1, 1)], integrated=True)
    spec.add_correlation("spin_z", [(0, 0), (1, 1)], integrated=True)
    spec.add_correlation("bond", [(2, 2)], integrated=True)
    spec.add_correlation("current", [(2, 2)], integrated=True)
    spec.add_composite_correlation(
        "cdw", "density", ids=[0, 1], coefficients=[1.0, -1.0],
        displacement_vecs=[[0.0, 0.0], [0.0, 0.0]], integrated=True,
    )
    spec.add_composite_correlation(
        "tr_greens", "greens", id_pairs=[(0, 0), (1, 1)], coefficients=[1.0, 1.0],
        time_displaced=True,
    )
    fn = jax.jit(lambda est, x: make_measurements(ctx, spec, est, x))
    out = fn(est, state.x)
    Lt1 = fdm.Ltau + 1
    assert out["correlations"]["greens"][0].shape == (3, Lt1, 2, 2)
    assert out["correlations"]["density"][0].shape == (2, Lt1, 2, 2)
    assert out["composite"]["cdw"][0].shape == (4, Lt1, 2, 2)  # per-pair stack
    g = out["global"]
    assert 0.0 < float(g["density"][0]) < 2.0
    assert np.isfinite(float(g["Nsqrd"][0]))
    assert np.isfinite(float(g["double_occ"][0]))
    loc = out["local"]
    assert loc["onsite_energy"][0].shape == (2,)
    assert loc["holstein_energy"][0].shape == (2,)  # two holstein coupling types
    assert loc["X2"][0].shape == (2,)
    # all finite — except the DQMC-only globals the reference records as NaN
    # (make_measurements.jl:101-107)
    nan_globals = {"sgndetGup", "sgndetGdn", "logdetGup", "logdetGdn",
                   "action_fermionic", "action_total"}
    finite_out = {k: v for k, v in out.items() if k != "global"}
    finite_out["global"] = {k: v for k, v in out["global"].items() if k not in nan_globals}
    for k in nan_globals:
        assert np.isnan(float(out["global"][k][0]))
    flat, _ = jax.tree_util.tree_flatten(finite_out)
    for leaf in flat:
        assert np.all(np.isfinite(np.asarray(leaf)))

    # accumulation
    acc = MeasurementAccumulator(spec)
    acc.accumulate(out)
    acc.accumulate(out)
    avg = acc.finalize_bin()
    np.testing.assert_allclose(avg["global"]["density"][0], float(g["density"][0]), rtol=1e-12)


def test_cdw_composite_consistency():
    """Composite with ids [0,1], coefs [1,-1]: composed stack equals
    C00 + C11 - C01 - C10."""
    from smoqyelphqmc_tpu.measure.container import compose_composite

    geo, ctx, state, fdm, est = _setup(honeycomb_model, Nrv=6, L=2, beta=0.6, alpha=0.5)
    spec = MeasurementSpec(geometry=geo)
    spec.add_correlation("density", [(0, 0), (1, 1), (0, 1), (1, 0)])
    spec.add_composite_correlation("cdw", "density", ids=[0, 1], coefficients=[1.0, -1.0])
    out = make_measurements(ctx, spec, est, state.x)
    C = out["correlations"]["density"][0]
    manual = C[0] + C[1] - C[2] - C[3]
    stack = np.asarray(out["composite"]["cdw"][0])
    composed = compose_composite(
        np.real(np.asarray(spec.composites["cdw"].coefficients)), stack, pairs_axis=0
    )
    np.testing.assert_allclose(composed, np.asarray(manual), atol=1e-10)


def test_phonon_greens_zero_displacement_is_x2():
    geo, ctx, state, fdm, est = _setup(chain_model, Nrv=4, L=4, beta=0.8)
    spec = MeasurementSpec(geometry=geo)
    spec.add_correlation("phonon_greens", [(0, 0)], time_displaced=True)
    out = make_measurements(ctx, spec, est, state.x)
    C = np.asarray(out["correlations"]["phonon_greens"][0][0])  # (Lt+1, L)
    x = np.asarray(state.x)  # (n_ph, Ltau)
    expect = np.mean(x * x)  # <x(i, l) x(i, l)> averaged
    np.testing.assert_allclose(C[0, 0], expect, rtol=1e-8)
    np.testing.assert_allclose(C[-1, 0], expect, rtol=1e-8)  # periodic beta row
