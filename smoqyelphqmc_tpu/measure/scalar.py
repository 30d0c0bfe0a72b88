"""Scalar stochastic measurements: density, <N^2>, double occupancy.

Re-design of /root/reference/src/Measurements/scalar_measurements.jl with the
same estimators expressed as batched reductions over the (Nrv, channel, Ltau, N)
random-vector block; pairwise quantities use the sum-minus-diagonal identity

    sum_{i != j} a_i b_j = (sum a)(sum b) - sum a_i b_i

so no pair loop appears. All results are (re, im) scalar pairs (the reference
stores complex measurements)."""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from .greens_estimator import GreensEstimator, _cmul

Pair = Tuple[jnp.ndarray, jnp.ndarray]


def _fields(est: GreensEstimator, orbital: Optional[int]):
    """(GR_re, GR_im, Rc_re, Rc_im), each (Nrv, Ltau, cells...) restricted to an
    orbital, or flattened over all sites when orbital is None."""
    if orbital is None:
        GR = est.GR
        R = est.R
        return GR[:, 0], GR[:, 1], R[:, 0], -R[:, 1]
    return est.orbital_fields(orbital)


def measure_n(est: GreensEstimator, orbital: Optional[int] = None) -> Pair:
    """Single-spin density n = 1 - <conj(R) . GR> / V (measure_n, scalar_measurements.jl:2-27)."""
    GRr, GRi, Rcr, Rci = _fields(est, orbital)
    V = GRr.size
    tr_re = jnp.sum(Rcr * GRr - Rci * GRi)
    tr_im = jnp.sum(Rcr * GRi + Rci * GRr)
    return 1.0 - tr_re / V, -tr_im / V


def measure_Nsqrd(est: GreensEstimator) -> Pair:
    """<N^2> from pairs of independent random vectors
    (measure_Nsqrd, scalar_measurements.jl:31-95). Spin-degenerate: N = 2 sum_i n_i."""
    GR = est.GR
    R = est.R
    Nrv = est.Nrv
    Ltau = est.Ltau
    V = est.Ltau * est.n_sites
    # D[i, j] = <R_i, GR_j> (conjugating R): complex matrix as a pair
    Rc_re, Rc_im = R[:, 0], -R[:, 1]
    Dre = jnp.einsum("iln,jln->ij", Rc_re, GR[:, 0]) - jnp.einsum("iln,jln->ij", Rc_im, GR[:, 1])
    Dim = jnp.einsum("iln,jln->ij", Rc_re, GR[:, 1]) + jnp.einsum("iln,jln->ij", Rc_im, GR[:, 0])
    trG_re = jnp.diag(Dre)  # per-vector Tr[G] estimates
    trG_im = jnp.diag(Dim)

    npairs2 = Nrv * (Nrv - 1)  # ordered pairs

    # <N>^2 = 4 mean_{i != j} (V - TrG_i)(V - TrG_j) / Ltau^2
    ar = V - trG_re
    ai = -trG_im
    s_re, s_im = jnp.sum(ar), jnp.sum(ai)
    sum_sq_re = jnp.sum(ar * ar - ai * ai)
    sum_sq_im = jnp.sum(2 * ar * ai)
    prod_re, prod_im = _cmul(s_re, s_im, s_re, s_im)
    Nbar2_re = 4.0 * (prod_re - sum_sq_re) / (npairs2 * Ltau**2)
    Nbar2_im = 4.0 * (prod_im - sum_sq_im) / (npairs2 * Ltau**2)

    # Tr[G] (all vectors)
    TrG_re = jnp.sum(trG_re) / (Nrv * Ltau)
    TrG_im = jnp.sum(trG_im) / (Nrv * Ltau)

    # Tr[G]^2 cross estimate: mean_{i != j} D[j,i] D[i,j] / Ltau^2
    cross_re = jnp.sum(Dre * Dre.T - Dim * Dim.T) - jnp.sum(trG_re**2 - trG_im**2)
    cross_im = jnp.sum(Dre * Dim.T + Dim * Dre.T) - jnp.sum(2 * trG_re * trG_im)
    TrG2_re = cross_re / (npairs2 * Ltau**2)
    TrG2_im = cross_im / (npairs2 * Ltau**2)

    return (
        Nbar2_re + 2.0 * TrG_re / Ltau - 2.0 * TrG2_re,
        Nbar2_im + 2.0 * TrG_im / Ltau - 2.0 * TrG2_im,
    )


def measure_double_occ(est: GreensEstimator, orbital: Optional[int] = None) -> Pair:
    """<n_up n_dn> = mean over vector pairs of (1/V) sum_r (1 - GR_i conj(R_i)) (1 - GR_j conj(R_j))
    (measure_double_occ, scalar_measurements.jl:99-148)."""
    GRr, GRi, Rcr, Rci = _fields(est, orbital)
    V = GRr[0].size
    Nrv = est.Nrv
    Wre = 1.0 - (GRr * Rcr - GRi * Rci)  # (Nrv, ...)
    Wim = -(GRr * Rci + GRi * Rcr)
    sum_re = jnp.sum(Wre, axis=0)
    sum_im = jnp.sum(Wim, axis=0)
    tot_re, tot_im = _cmul(sum_re, sum_im, sum_re, sum_im)
    diag_re = jnp.sum(Wre * Wre - Wim * Wim, axis=0)
    diag_im = jnp.sum(2 * Wre * Wim, axis=0)
    npairs2 = Nrv * (Nrv - 1)
    d_re = jnp.sum(tot_re - diag_re) / (npairs2 * V)
    d_im = jnp.sum(tot_im - diag_im) / (npairs2 * V)
    return d_re, d_im
