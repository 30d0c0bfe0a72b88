"""Tests of the tau-Fourier transform, batched CG, and KPM preconditioner."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smoqyelphqmc_tpu.models.fermion_path_integral import build_path_integral
from smoqyelphqmc_tpu.ops.cg import cg_solve
from smoqyelphqmc_tpu.ops.checkerboard import build_checkerboard_structure
from smoqyelphqmc_tpu.ops.fermion_det import FermionDetMatrix, dense_M
from smoqyelphqmc_tpu.ops.fourier import AxisDFT, TauFourier
from smoqyelphqmc_tpu.ops.kpm import KPMPreconditioner, kpm_apply, kpm_update

from _models import chain_model, honeycomb_model


def _fdm(model_fn, symmetric=True, zero_x=False, **kw):
    geo, tbm, tbp, elph_model, elph = model_fn(**kw)
    if zero_x:
        elph = elph.replace(x=jnp.zeros_like(elph.x))
    fpi = build_path_integral(tbp, elph)
    structure = build_checkerboard_structure(np.asarray(tbp.neighbor_table), tbp.n_sites)
    return FermionDetMatrix.from_path_integral(fpi, structure, symmetric=symmetric)


def test_tau_fourier_matches_numpy(rng):
    Ltau, N = 12, 5
    v = rng.standard_normal((Ltau, N))
    ft = TauFourier.build(Ltau)
    ure, uim = ft.forward(jnp.asarray(v))
    theta = np.exp(-1j * np.pi * np.arange(Ltau) / Ltau)
    ref = np.fft.fft(theta[:, None] * v, axis=0) / np.sqrt(Ltau)
    np.testing.assert_allclose(np.asarray(ure), ref.real, atol=1e-12)
    np.testing.assert_allclose(np.asarray(uim), ref.imag, atol=1e-12)
    # unitary roundtrip
    vre, vim = ft.inverse(ure, uim)
    np.testing.assert_allclose(np.asarray(vre), v, atol=1e-12)
    np.testing.assert_allclose(np.asarray(vim), 0.0, atol=1e-12)


def test_tau_fourier_diagonalizes_shift(rng):
    """The antiperiodic shift T (v'[l]=v[l-1], v'[0]=-v[L-1]) becomes
    diag(e^{-i phi_w}) in the transformed basis."""
    Ltau = 8
    v = rng.standard_normal((Ltau, 1))
    Tv = np.roll(v, 1, axis=0)
    Tv[0] *= -1
    ft = TauFourier.build(Ltau)
    u = np.asarray(ft.forward(jnp.asarray(v))[0]) + 1j * np.asarray(ft.forward(jnp.asarray(v))[1])
    uT = np.asarray(ft.forward(jnp.asarray(Tv))[0]) + 1j * np.asarray(ft.forward(jnp.asarray(Tv))[1])
    phi = 2 * np.pi * (np.arange(Ltau) + 0.5) / Ltau
    np.testing.assert_allclose(uT, np.exp(-1j * phi)[:, None] * u, atol=1e-12)


def test_axis_dft(rng):
    n = 6
    v = rng.standard_normal((3, n, 2))
    d = AxisDFT.build(n)
    ure, uim = d.apply(jnp.asarray(v), None, axis=1)
    ref = np.fft.fft(v, axis=1)
    np.testing.assert_allclose(np.asarray(ure), ref.real, atol=1e-12)
    np.testing.assert_allclose(np.asarray(uim), ref.imag, atol=1e-12)
    di = AxisDFT.build(n, inverse=True)
    wre, wim = di.apply(ure, uim, axis=1)
    np.testing.assert_allclose(np.asarray(wre), v, atol=1e-12)


@pytest.mark.parametrize("symmetric", [True, False])
def test_cg_matches_dense_solve(symmetric, rng):
    fdm = _fdm(chain_model, symmetric=symmetric, L=4, beta=0.8)
    A = dense_M(fdm)
    AtA = A.T @ A
    b = rng.standard_normal((2, fdm.Ltau, fdm.n_sites))  # complex channel pair
    x, stats = cg_solve(fdm.mul_MtM, jnp.asarray(b), tol=1e-12, maxiter=500)
    assert bool(stats.converged)
    ref = np.linalg.solve(AtA, b.reshape(2, -1).T).T.reshape(b.shape)
    np.testing.assert_allclose(np.asarray(x), ref, atol=1e-8)


def test_cg_batched_masks(rng):
    """Systems with different conditioning converge at different iterations but
    all solutions are correct."""
    fdm = _fdm(chain_model, L=4, beta=0.8)
    A = dense_M(fdm)
    AtA = A.T @ A
    b = rng.standard_normal((3, 2, fdm.Ltau, fdm.n_sites))
    b[1] *= 1e3  # scale invariance check
    x, stats = cg_solve(fdm.mul_MtM, jnp.asarray(b), tol=1e-11, maxiter=500)
    assert bool(stats.converged)
    ref = np.linalg.solve(AtA, b.reshape(6, -1).T).T.reshape(b.shape)
    np.testing.assert_allclose(np.asarray(x), ref, rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("symmetric", [True, False])
def test_kpm_preconditioner_accelerates_cg(symmetric, rng):
    # beta large enough to give a meaningful Ltau; couple the phonons
    fdm = _fdm(honeycomb_model, symmetric=symmetric, L=2, beta=2.0, alpha=0.4)
    key = jax.random.PRNGKey(0)
    pre = KPMPreconditioner.build(fdm, key)
    assert bool(pre.active), f"preconditioner inactive: bounds {pre.lo}, {pre.hi}"
    b = rng.standard_normal((2, fdm.Ltau, fdm.n_sites))
    x0, s0 = cg_solve(fdm.mul_MtM, jnp.asarray(b), tol=1e-10, maxiter=2000)
    x1, s1 = cg_solve(fdm.mul_MtM, jnp.asarray(b), precond=pre.as_operator(), tol=1e-10, maxiter=2000)
    assert bool(s0.converged) and bool(s1.converged)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x0), rtol=1e-5, atol=1e-7)
    assert int(s1.iters) < int(s0.iters), (int(s1.iters), int(s0.iters))


def test_kpm_exact_for_static_field(rng):
    """With a tau-independent field, Bbar = B_l exactly, so P^{-1} approximates
    [M^T M]^{-1} itself: preconditioned CG should converge almost immediately."""
    fdm = _fdm(honeycomb_model, symmetric=True, zero_x=True, L=2, beta=2.0, alpha=0.0)
    key = jax.random.PRNGKey(1)
    pre = KPMPreconditioner.build(fdm, key)
    assert bool(pre.active)
    b = rng.standard_normal((fdm.Ltau, fdm.n_sites))
    x1, s1 = cg_solve(fdm.mul_MtM, jnp.asarray(b), precond=pre.as_operator(), tol=1e-8, maxiter=2000)
    x0, s0 = cg_solve(fdm.mul_MtM, jnp.asarray(b), tol=1e-8, maxiter=2000)
    assert bool(s1.converged)
    assert int(s1.iters) <= max(8, int(s0.iters) // 4), (int(s1.iters), int(s0.iters))
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x0), rtol=1e-4, atol=1e-6)


def test_kpm_update_is_jittable():
    fdm = _fdm(chain_model, L=4, beta=1.0)
    key = jax.random.PRNGKey(2)
    pre = KPMPreconditioner.build(fdm, key)
    upd = jax.jit(kpm_update)
    pre2 = upd(pre, fdm, key)
    r = jnp.ones((2, fdm.Ltau, fdm.n_sites))
    z = jax.jit(kpm_apply)(pre2, r)
    assert np.all(np.isfinite(np.asarray(z)))


def test_solve_mtm_f32_rhs_f64_matrix():
    """An f32 rhs against f64 propagator tables must solve in f32 (the request
    wins) instead of crashing the while-loop carry with promoted dtypes —
    regression for the XLA fallback path of large configs."""
    import jax.numpy as jnp

    from smoqyelphqmc_tpu.ops.fermion_det import solve_MtM
    from smoqyelphqmc_tpu.ops.spectral_precond import build_spectral

    fdm = _fdm(chain_model, L=4, beta=1.0, alpha=0.4)
    assert fdm.exp_nV.dtype == jnp.float64
    pre = build_spectral(fdm)
    rng = np.random.default_rng(0)
    b = jnp.asarray(
        rng.standard_normal((2, fdm.Ltau, fdm.n_sites)), dtype=jnp.float32
    )
    x, st = solve_MtM(fdm, b, precond=pre, tol=1e-5, maxiter=2000)
    assert x.dtype == jnp.float32
    assert bool(st.converged)
    r = fdm.mul_MtM(x.astype(jnp.float64)) - b.astype(jnp.float64)
    assert float(jnp.linalg.norm(r) / jnp.linalg.norm(b)) < 5e-5


def test_kpm_natural_caps_grow_with_ltau():
    """cap_max=None (default) must keep the reference's unbounded low-frequency
    order growth (KPMPreconditioner.jl:711): the max order scales ~ Ltau and is
    NOT silently truncated (a too-small cap makes the Chebyshev fit of 1/q
    non-positive and the preconditioner indefinite — observed divergence at
    cap 32, Ltau = 240)."""
    from smoqyelphqmc_tpu.ops.kpm import _static_plan

    caps_small = _static_plan(40, 2.0, 1.0, 1.0)[3]
    caps_large = _static_plan(240, 2.0, 1.0, 1.0)[3]
    assert caps_large.max() > 2 * caps_small.max()
    capped = _static_plan(240, 2.0, 1.0, 1.0, cap_max=16)[3]
    assert capped.max() == 16
