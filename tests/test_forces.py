"""Lambda-operator identities and finite-difference validation of the
pseudofermion force kernels (the reference has no such tests; SURVEY.md section 7
stage 5 prescribes the finite-difference oracle)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smoqyelphqmc_tpu.models.fermion_path_integral import build_path_integral
from smoqyelphqmc_tpu.ops.checkerboard import build_checkerboard_structure
from smoqyelphqmc_tpu.ops.derivatives import build_force_plan
from smoqyelphqmc_tpu.ops.fermion_det import FermionDetMatrix
from smoqyelphqmc_tpu.ops.lambda_shift import (
    build_lambda,
    ldiv_lambda,
    ldiv_lambda_T,
    mul_lambda,
    mul_lambda_T,
)
from smoqyelphqmc_tpu.ops.pff import (
    fermionic_action,
    fermionic_action_and_force,
    sample_pseudofermion_fields,
)

from _models import chain_model, honeycomb_model


def _setup(model_fn, symmetric=True, **kw):
    geo, tbm, tbp, elph_model, elph = model_fn(**kw)
    structure = build_checkerboard_structure(np.asarray(tbp.neighbor_table), tbp.n_sites)

    def make_fdm(x):
        fpi = build_path_integral(tbp, elph, x)
        return FermionDetMatrix.from_path_integral(fpi, structure, symmetric=symmetric)

    plan = build_force_plan(elph, structure)
    return tbp, elph, make_fdm, plan


def test_lambda_identities(rng):
    tbp, elph, make_fdm, _ = _setup(honeycomb_model, beta=0.8)
    fdm = make_fdm(elph.x)
    Lam = build_lambda(elph, elph.x, tbp.n_sites)
    assert Lam.shape == (elph.Ltau, tbp.n_sites)
    v = jnp.asarray(rng.standard_normal((2, elph.Ltau, tbp.n_sites)))
    np.testing.assert_allclose(np.asarray(ldiv_lambda(Lam, mul_lambda(Lam, v))), np.asarray(v), atol=1e-12)
    np.testing.assert_allclose(np.asarray(ldiv_lambda_T(Lam, mul_lambda_T(Lam, v))), np.asarray(v), atol=1e-12)
    u = jnp.asarray(rng.standard_normal(v.shape))
    lhs = float(jnp.vdot(u, mul_lambda(Lam, v)))
    rhs = float(jnp.vdot(mul_lambda_T(Lam, u), v))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-12)
    # sign structure: row 0 positive, others negative (ph-sym holstein present)
    lam = np.asarray(Lam)
    assert np.all(lam[0] > 0) and np.all(lam[1:] < 0)


@pytest.mark.parametrize(
    "model_fn,kw",
    [
        (honeycomb_model, dict(L=2, beta=0.6, alpha=0.7, ph_sym=True)),
        (honeycomb_model, dict(L=2, beta=0.6, alpha=0.7, ph_sym=False)),
        (chain_model, dict(L=4, beta=0.6, alpha=0.6, ssh=True)),
        (chain_model, dict(L=4, beta=0.6, alpha=0.6, ssh=False)),
    ],
)
@pytest.mark.parametrize("symmetric", [True, False])
def test_force_matches_finite_difference(model_fn, kw, symmetric, rng):
    tbp, elph, make_fdm, plan = _setup(model_fn, symmetric=symmetric, **kw)
    x0 = jnp.asarray(elph.x)
    key = jax.random.PRNGKey(7)
    fdm0 = make_fdm(x0)
    Phi, _ = sample_pseudofermion_fields(key, elph, fdm0, x0)

    def S(x):
        fdm = make_fdm(x)
        return float(
            fermionic_action(Phi, elph, fdm, x, tol=1e-13, maxiter=4000).Sf
        )

    res = fermionic_action_and_force(Phi, elph, fdm0, x0, plan, tol=1e-13, maxiter=4000)
    assert bool(res.stats.converged)
    force = np.asarray(res.force)

    h = 1e-5
    x0n = np.asarray(x0)
    # probe a handful of (phonon, slice) entries
    probes = [(0, 0), (0, x0n.shape[1] // 2), (x0n.shape[0] - 1, 1)]
    for (p, l) in probes:
        dx = np.zeros_like(x0n)
        dx[p, l] = h
        fd = (S(jnp.asarray(x0n + dx)) - S(jnp.asarray(x0n - dx))) / (2 * h)
        np.testing.assert_allclose(force[p, l], fd, rtol=2e-5, atol=1e-7)


def test_action_is_positive_and_finite(rng):
    tbp, elph, make_fdm, plan = _setup(honeycomb_model, beta=1.0, alpha=0.5)
    fdm = make_fdm(elph.x)
    key = jax.random.PRNGKey(3)
    Phi, Sf0 = sample_pseudofermion_fields(key, elph, fdm, elph.x)
    res = fermionic_action(Phi, elph, fdm, elph.x, tol=1e-12, maxiter=4000)
    assert bool(res.stats.converged)
    # freshly sampled Phi reproduces |R|^2 exactly: S_f(Phi; x) = |R|^2
    np.testing.assert_allclose(float(res.Sf), float(Sf0), rtol=1e-8)
    assert float(res.Sf) > 0
    assert abs(float(res.Sf_imag)) < 1e-6 * abs(float(res.Sf))
