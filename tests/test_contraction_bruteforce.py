"""Realization-exact brute-force oracles for the four-point contraction engine.

Given the SAME random vectors, the FFT cross-correlation machinery (with its
static shifts, hopping weights and tau = 0 / beta delta corrections) must equal a
literal loop-based evaluation of the estimator formulas
(/root/reference/src/Measurements/GreensEstimator.jl:241-606) to machine
precision — not just in expectation."""

import itertools

import jax
import numpy as np
import pytest

from smoqyelphqmc_tpu.measure.greens_estimator import (
    build_greens_estimator,
    measure_G0D_GD0,
    measure_GD0_GD0,
    measure_GDD_G00,
    update_greens_estimator,
)
from smoqyelphqmc_tpu.updates.context import initialize_qmc, make_fdm

from _models import chain_model, honeycomb_model


def _setup(model_fn, Nrv=4, **kw):
    geo, tbm, tbp, _, elph = model_fn(**kw)
    ctx, state = initialize_qmc(tbp, elph, seed=0, tol=1e-11, use_preconditioner=False)
    fdm = make_fdm(ctx, state.x)
    est = build_greens_estimator(elph.Ltau, geo.n_orbitals, geo.L, Nrv=Nrv)
    est = update_greens_estimator(est, fdm, jax.random.PRNGKey(2), tol=1e-11, maxiter=4000).estimator
    return geo, est


def _complex_fields(est):
    """GR and conj(R) as complex numpy arrays shaped (Nrv, Ltau, *L, n_orb)."""
    GR = np.asarray(est.GR[:, 0] + 1j * est.GR[:, 1])
    Rc = np.asarray(est.R[:, 0] - 1j * est.R[:, 1])
    shape = (est.Nrv, est.Ltau) + est.L + (est.n_orb,)
    return GR.reshape(shape), Rc.reshape(shape)


def _xcorr_pairs(P, Q, Ltau, L):
    """C[tau, r] = (1/Npairs) sum_pairs (1/Nvol) sum_{l,i} P[l+tau, i+r] Q[l, i]
    with periodic wrapping, brute force."""
    D = len(L)
    Nvol = Ltau * int(np.prod(L))
    C = np.zeros((Ltau,) + L, dtype=complex)
    for tau in range(Ltau):
        Ps = np.roll(P, -tau, axis=1)
        for r in itertools.product(*[range(l) for l in L]):
            Ps_r = np.roll(Ps, [-v for v in r], axis=tuple(range(2, 2 + D)))
            C[(tau,) + r] = np.sum(Ps_r * Q) / Nvol
    return C


def _shift(A, r, D):
    """A[.., i + r] view: roll cells by -r (cell axes 2..2+D of (Nrv, Lt, *L))."""
    return np.roll(A, [-v for v in r], axis=tuple(range(2, 2 + D)))


@pytest.mark.parametrize(
    "model_fn,kw,r1,r2,r3,r4",
    [
        (chain_model, dict(L=4, beta=0.6, dtau=0.1), (1,), (0,), (0,), (2,)),
        (honeycomb_model, dict(L=2, beta=0.4, dtau=0.1), (1, 0), (0, 1), (0, 0), (1, 1)),
    ],
)
def test_topologies_vs_bruteforce(model_fn, kw, r1, r2, r3, r4):
    geo, est = _setup(model_fn, **kw)
    GR, Rc = _complex_fields(est)
    D = est.D
    Ltau, L, Nrv = est.Ltau, est.L, est.Nrv
    pairs = [(n, m) for n in range(Nrv) for m in range(n + 1, Nrv)]
    orbs = (0, 0, 0, 0) if geo.n_orbitals == 1 else (0, 1, 1, 0)
    a, b, c, d = orbs
    GA, RB = _shift(GR[..., a], r1, D), _shift(Rc[..., b], r2, D)
    GC, RD = _shift(GR[..., c], r3, D), _shift(Rc[..., d], r4, D)

    def pair_avg(build_P, build_Q):
        C = np.zeros((Ltau,) + L, dtype=complex)
        for (n, m) in pairs:
            C += _xcorr_pairs(build_P(n, m), build_Q(n, m), Ltau, L)
        return C / len(pairs)

    # ---- GDD_G00 (factorized engine averages over ordered pairs n != m) ----
    pairs_ord = [(n, m) for n in range(Nrv) for m in range(Nrv) if n != m]
    ref = np.zeros((Ltau,) + L, dtype=complex)
    for (n, m) in pairs_ord:
        ref += _xcorr_pairs((GA[n] * RB[n])[None], (GC[m] * RD[m])[None], Ltau, L)
    ref /= len(pairs_ord)
    got_r, got_i = measure_GDD_G00(est, orbs, r1, r2, r3, r4, 1.0)
    got = np.asarray(got_r) + 1j * np.asarray(got_i)
    np.testing.assert_allclose(got[:Ltau], ref, atol=1e-10)
    np.testing.assert_allclose(got[Ltau], ref[0], atol=1e-10)

    # ---- GD0_GD0 (raw xcorr part + delta corrections) ----
    ref = pair_avg(
        lambda n, m: (GA[n] * GC[m])[None],
        lambda n, m: (RB[n] * RD[m])[None],
    )
    Nvol = Ltau * int(np.prod(L))
    refC = np.concatenate([ref, ref[0][None]], axis=0)
    if a == b:
        shift = tuple(r1[k] - r2[k] - r3[k] + r4[k] for k in range(D))
        GC_s = _shift(GR[..., c], tuple(-v for v in shift), D)  # GR[i - shift] = roll +shift
        GC_s = np.roll(GR[..., c], list(shift), axis=tuple(range(2, 2 + D)))
        val = np.sum(GC_s * Rc[..., d]) / (Nrv * Nvol)
        cell = tuple((r2[k] - r1[k]) % L[k] for k in range(D))
        refC[(Ltau,) + cell] -= val
    if c == d:
        shift = tuple(-r1[k] + r2[k] + r3[k] - r4[k] for k in range(D))
        GA_s = np.roll(GR[..., a], list(shift), axis=tuple(range(2, 2 + D)))
        val = np.sum(GA_s * Rc[..., b]) / (Nrv * Nvol)
        cell = tuple((r4[k] - r3[k]) % L[k] for k in range(D))
        refC[(Ltau,) + cell] -= val
    if a == b and c == d and all((r2[k] - r1[k]) % L[k] == (r4[k] - r3[k]) % L[k] for k in range(D)):
        cell = tuple((r2[k] - r1[k]) % L[k] for k in range(D))
        refC[(Ltau,) + cell] += 1.0
    got_r, got_i = measure_GD0_GD0(est, orbs, r1, r2, r3, r4, 1.0)
    got = np.asarray(got_r) + 1j * np.asarray(got_i)
    np.testing.assert_allclose(got, refC, atol=1e-10)

    # ---- G0D_GD0 ----
    ref = pair_avg(
        lambda n, m: (RB[n] * GC[m])[None],
        lambda n, m: (GA[n] * RD[m])[None],
    )
    refC = np.concatenate([ref, ref[0][None]], axis=0)
    shift = tuple(-r1[k] + r2[k] - r3[k] + r4[k] for k in range(D))
    if a == b:
        GC_s = np.roll(GR[..., c], list(shift), axis=tuple(range(2, 2 + D)))
        val = np.sum(GC_s * Rc[..., d]) / (Nrv * Nvol)
        cell = tuple((r1[k] - r2[k]) % L[k] for k in range(D))
        refC[(0,) + cell] -= val
    if c == d:
        GA_s = np.roll(GR[..., a], list(shift), axis=tuple(range(2, 2 + D)))
        val = np.sum(GA_s * Rc[..., b]) / (Nrv * Nvol)
        cell = tuple((r4[k] - r3[k]) % L[k] for k in range(D))
        refC[(Ltau,) + cell] -= val
    got_r, got_i = measure_G0D_GD0(est, orbs, r1, r2, r3, r4, 1.0)
    got = np.asarray(got_r) + 1j * np.asarray(got_i)
    np.testing.assert_allclose(got, refC, atol=1e-10)


def test_weighted_contraction_vs_bruteforce():
    """Hopping-weight fields with conjugation flags (current-correlation path)."""
    geo, est = _setup(chain_model, L=4, beta=0.6, dtau=0.1)
    GR, Rc = _complex_fields(est)
    Ltau, L, Nrv, D = est.Ltau, est.L, est.Nrv, est.D
    rng = np.random.default_rng(3)
    t1 = rng.standard_normal((Ltau,) + L)
    t2 = rng.standard_normal((Ltau,) + L)
    import jax.numpy as jnp

    tD = (jnp.asarray(t1), None)
    t0 = (jnp.asarray(t2), None)
    pairs = [(n, m) for n in range(Nrv) for m in range(Nrv) if n != m]
    z = (0,)
    ref = np.zeros((Ltau,) + L, dtype=complex)
    for (n, m) in pairs:
        P = t1[None] * (GR[n, ..., 0] * Rc[n, ..., 0])[None]
        Q = t2[None] * (GR[m, ..., 0] * Rc[m, ..., 0])[None]
        ref += _xcorr_pairs(P, Q, Ltau, L)
    ref /= len(pairs)
    got_r, got_i = measure_GDD_G00(est, (0, 0, 0, 0), z, z, z, z, 1.0, tD, t0, True, False)
    got = np.asarray(got_r) + 1j * np.asarray(got_i)
    np.testing.assert_allclose(got[:Ltau], ref, atol=1e-10)
