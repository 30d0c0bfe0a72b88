"""Stochastic Green's-function estimator and FFT contraction engine.

Re-design of /root/reference/src/Measurements/GreensEstimator.jl. The estimator
holds Nrv unit-phase complex random vectors R and GR = M^{-1} R, obtained from ONE
batched CG solve of [M^T M] x = M^T R over all (vector, channel) systems — the
TPU replacement for the reference's sequential per-vector solves
(GreensEstimator.jl:154-168).

Estimators (complex fields are (re, im) array pairs; no complex dtypes):

- single-particle G(r, tau) via FFT cross-correlation of GR with conj(R) using the
  aperiodic sign-extension along tau (GreensEstimator.jl:656-671) and the
  boundary fix G(r, beta) = delta(r) - G(r, 0) (:221-227);
- four-fermion contractions G.G from pairs of independent random vectors in three
  topologies (GdG d0.Gd0 / Gdd.G00 / G0d.Gd0, :241-606) with orbital 4-tuples,
  four static unit-cell displacements, optional hopping-amplitude weight fields
  with conjugation flags, and tau = 0 / beta delta-function boundary corrections;
- translational averaging S[r] += (1/Nvol) sum_i a[i+r] b[i] as multi-axis DFT
  matmuls (ops/fourier.py), batched over all random-vector pairs at once.

All correlation outputs have shape (Ltau + 1, *L) — displacement tau = 0..beta —
as (re, im) pairs; accumulation into named containers happens one level up.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.fermion_det import FermionDetMatrix
from ..ops.fourier import AxisDFT, FactoredDFT
from ..utils.pytree import register_pytree_dataclass, static_field

Pair = Tuple[jnp.ndarray, jnp.ndarray]


def _cmul(ar, ai, br, bi) -> Pair:
    return ar * br - ai * bi, ar * bi + ai * br


@register_pytree_dataclass
class GreensEstimator:
    """R, GR = M^{-1} R and the DFT operators for translational averaging."""

    R: jnp.ndarray  # (Nrv, 2, Ltau, N) random vectors (channel axis = re/im)
    GR: jnp.ndarray  # (Nrv, 2, Ltau, N)
    tau2_fwd: AxisDFT  # length-2Ltau transforms (single-G aperiodic doubling)
    tau2_inv: AxisDFT
    tau_fwd: AxisDFT  # length-Ltau transforms (pair contractions)
    tau_inv: AxisDFT
    space_fwd: Tuple[AxisDFT, ...]  # one per lattice dimension
    space_inv: Tuple[AxisDFT, ...]
    Nrv: int = static_field()
    Ltau: int = static_field()
    n_orb: int = static_field()
    L: Tuple[int, ...] = static_field()
    # dtype of the contraction engine: float32 rounding (~1e-7) is far below the
    # 1/sqrt(Nrv...) statistical noise of the estimators, so the FFT/product
    # arithmetic can run at native MXU speed while the CG solves stay f64
    dtype: str = static_field(default="float64")

    # ------------------------------------------------------------------
    @property
    def n_cells(self) -> int:
        return int(np.prod(self.L))

    @property
    def n_sites(self) -> int:
        return self.n_cells * self.n_orb

    @property
    def D(self) -> int:
        return len(self.L)

    def shaped(self, arr: jnp.ndarray) -> jnp.ndarray:
        """(.., Ltau, N) -> (.., Ltau, *L, n_orb)."""
        return arr.reshape(arr.shape[:-1] + self.L + (self.n_orb,))

    def orbital_fields(self, orb: int) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """(GR_re, GR_im, Rc_re, Rc_im) for one orbital, each (Nrv, Ltau, *L);
        Rc = conj(R)."""
        GR = self.shaped(self.GR)[..., orb]
        R = self.shaped(self.R)[..., orb]
        return GR[:, 0], GR[:, 1], R[:, 0], -R[:, 1]

    # ------------------------------------------------------------------
    def _fft_all(self, ar, ai, tau_dft: AxisDFT, inverse: bool) -> Pair:
        """Multi-axis DFT over (tau, *L) — the trailing D+1 axes of ar/ai."""
        dfts = self.space_inv if inverse else self.space_fwd
        ndim = ar.ndim
        tau_axis = ndim - 1 - self.D
        ar, ai = tau_dft.apply(ar, ai, axis=tau_axis)
        for d in range(self.D):
            ar, ai = dfts[d].apply(ar, ai, axis=tau_axis + 1 + d)
        return ar, ai

    def xcorr_accumulate(self, ar, ai, br, bi, doubled: bool) -> Pair:
        """S[r] = (1/Nvol) sum_i a[i+r] b[i] over (tau, *L) for batched a, b;
        sums the leading batch axes (_translational_average!,
        GreensEstimator.jl:677-708, batched)."""
        tf = self.tau2_fwd if doubled else self.tau_fwd
        ti = self.tau2_inv if doubled else self.tau_inv
        fr, fi = self._fft_all(ar, ai, tf, inverse=False)
        hr, hi = self._fft_all(br, bi, ti, inverse=True)
        pr, pi = _cmul(fr, fi, hr, hi)
        # sum over every leading axis before the final inverse transform
        extra = pr.ndim - (1 + self.D)
        if extra > 0:
            pr = jnp.sum(pr, axis=tuple(range(extra)))
            pi = jnp.sum(pi, axis=tuple(range(extra)))
        return self._fft_all(pr, pi, ti, inverse=True)


class EstimatorUpdate(NamedTuple):
    estimator: GreensEstimator
    iters: jnp.ndarray
    converged: jnp.ndarray


def build_greens_estimator(
    Ltau: int, n_orb: int, L: Sequence[int], Nrv: int = 10, dtype: str = "float64"
) -> GreensEstimator:
    L = tuple(int(x) for x in L)
    n_sites = int(np.prod(L)) * n_orb
    dt = jnp.dtype(dtype)
    zeros = jnp.zeros((Nrv, 2, Ltau, n_sites), dtype=dt)
    return GreensEstimator(
        R=zeros,
        GR=zeros,
        tau2_fwd=FactoredDFT.build(2 * Ltau, dtype=dtype),
        tau2_inv=FactoredDFT.build(2 * Ltau, inverse=True, norm=1.0 / (2 * Ltau), dtype=dtype),
        tau_fwd=FactoredDFT.build(Ltau, dtype=dtype),
        tau_inv=FactoredDFT.build(Ltau, inverse=True, norm=1.0 / Ltau, dtype=dtype),
        space_fwd=tuple(AxisDFT.build(l, dtype=dtype) for l in L),
        space_inv=tuple(AxisDFT.build(l, inverse=True, dtype=dtype) for l in L),
        Nrv=Nrv,
        Ltau=Ltau,
        n_orb=n_orb,
        L=L,
        dtype=dtype,
    )


def update_greens_estimator(
    est: GreensEstimator,
    fdm: FermionDetMatrix,
    key,
    precond=None,
    tol: float = 1e-10,
    maxiter: int = 10_000,
    mixed: bool = False,
    solve_dtype: "str | None" = None,
) -> EstimatorUpdate:
    """Draw fresh unit-phase random vectors and solve GR = M^{-1} R in one
    batched CG (update_greens_estimator!, GreensEstimator.jl:125-175).

    solve_dtype='float32' runs the Nrv solves in f32 (riding the fused Pallas
    solver on TPU). The solve residual enters measurements only as a BIAS of
    relative size ~tol — at the clamped 2e-5 this sits 3-4 orders below the
    stochastic estimator noise (~1/sqrt(Nrv)) and below the f32 rounding of the
    stored GR fields (est.dtype is float32 in the production driver), while the
    Markov chain's exactness never involves these solves at all. f64 solves
    exist for validation (solve_dtype=None with float64 inputs)."""
    from ..ops.fermion_det import solve_MtM

    theta = jax.random.uniform(key, (est.Nrv, est.Ltau, fdm.n_sites), maxval=2.0 * np.pi)
    R = jnp.stack([jnp.cos(theta), jnp.sin(theta)], axis=1)  # (Nrv, 2, Ltau, N)
    if solve_dtype is not None and jnp.dtype(solve_dtype) == jnp.float32:
        fdm = fdm.astype(jnp.float32)
        R_s = R.astype(jnp.float32)
        tol = max(tol, 2e-5)  # f32 resolution floor
        mixed = False
    else:
        R_s = R
    MtR = fdm.mul_Mt(R_s)
    GR, stats = solve_MtM(fdm, MtR, precond=precond, tol=tol, maxiter=maxiter, mixed=mixed)
    dt = jnp.dtype(est.dtype)
    est = est.replace(R=R.astype(dt), GR=GR.astype(dt))
    return EstimatorUpdate(estimator=est, iters=stats.iters, converged=stats.converged)


# ----------------------------------------------------------------------
# Single-particle Green's function
# ----------------------------------------------------------------------


def measure_G(est: GreensEstimator, orbitals: Tuple[int, int]) -> Pair:
    """G_ab(r, tau) for tau = 0..beta, shape (Ltau+1, *L)
    (measure_GD0!, GreensEstimator.jl:179-233)."""
    a, b = orbitals
    GAr, GAi, RBr, RBi = *est.orbital_fields(a)[:2], *est.orbital_fields(b)[2:]
    # aperiodic sign extension along tau
    Ar = jnp.concatenate([GAr, -GAr], axis=1)
    Ai = jnp.concatenate([GAi, -GAi], axis=1)
    Br = jnp.concatenate([RBr, -RBr], axis=1)
    Bi = jnp.concatenate([RBi, -RBi], axis=1)
    Sr, Si = est.xcorr_accumulate(Ar, Ai, Br, Bi, doubled=True)
    Sr = Sr / est.Nrv
    Si = Si / est.Nrv
    Gr = Sr[: est.Ltau]
    Gi = Si[: est.Ltau]
    # boundary: G(r, beta) = delta_ab delta(r) - G(r, 0)
    Gb_r = -Sr[0]
    Gb_i = -Si[0]
    if a == b:
        Gb_r = Gb_r.at[(0,) * est.D].add(1.0)
    return (
        jnp.concatenate([Gr, Gb_r[None]], axis=0),
        jnp.concatenate([Gi, Gb_i[None]], axis=0),
    )


# ----------------------------------------------------------------------
# Pairwise four-fermion contractions
# ----------------------------------------------------------------------


def _pair_indices(Nrv: int) -> Tuple[np.ndarray, np.ndarray]:
    n, m = np.triu_indices(Nrv, k=1)
    return n.astype(np.int32), m.astype(np.int32)


def _roll_cells(est: GreensEstimator, arr: jnp.ndarray, r: Sequence[int], sign: int) -> jnp.ndarray:
    """Roll the trailing D cell axes by sign*r (arr trailing dims = (*L,) or (tau, *L))."""
    r = tuple(int(v) for v in r)
    if all(v == 0 for v in r):
        return arr
    axes = tuple(range(arr.ndim - est.D, arr.ndim))
    return jnp.roll(arr, tuple(sign * v for v in r), axes)


def _apply_weight(est, pr, pi, t_field, conj_t, shift=None):
    """Multiply a (.., Ltau, *L) pair by a hopping-weight field (Ltau, *L) pair."""
    if t_field is None:
        return pr, pi
    tr, ti = t_field
    if shift is not None:
        tr = _roll_cells(est, tr, shift, +1)
        ti = None if ti is None else _roll_cells(est, ti, shift, +1)
    if ti is None:
        return pr * tr, pi * tr
    if conj_t:
        ti = -ti
    return _cmul(pr, pi, tr, ti)


def _four_point(
    est: GreensEstimator,
    fields: Tuple,  # ((X1, X2), (Y1, Y2)): delta-side and zero-side factor pairs
    tD: Optional[Pair],
    t0: Optional[Pair],
    conj_tD: bool,
    conj_t0: bool,
) -> Pair:
    """sum over ordered random-vector pairs (n, m), n -> first slot, m -> second:
    xcorr( tD (.) X1_n (.) X2_m ,  t0 (.) Y1_n (.) Y2_m ) / Npairs."""
    (X1r, X1i, X2r, X2i), (Y1r, Y1i, Y2r, Y2i) = fields
    pn, pm = _pair_indices(est.Nrv)
    pn = jnp.asarray(pn)
    pm = jnp.asarray(pm)
    Pr, Pi = _cmul(X1r[pn], X1i[pn], X2r[pm], X2i[pm])  # (Npairs, Ltau, *L)
    Qr, Qi = _cmul(Y1r[pn], Y1i[pn], Y2r[pm], Y2i[pm])
    Pr, Pi = _apply_weight(est, Pr, Pi, tD, conj_tD)
    Qr, Qi = _apply_weight(est, Qr, Qi, t0, conj_t0)
    Sr, Si = est.xcorr_accumulate(Pr, Pi, Qr, Qi, doubled=False)
    npairs = len(np.triu_indices(est.Nrv, k=1)[0])
    return Sr / npairs, Si / npairs


def _extend_beta(est: GreensEstimator, Sr: jnp.ndarray, Si: jnp.ndarray) -> Pair:
    """(Ltau, *L) -> (Ltau+1, *L) with the beta row equal to the tau = 0 row
    (periodic product of two antiperiodic factors)."""
    return (
        jnp.concatenate([Sr, Sr[0][None]], axis=0),
        jnp.concatenate([Si, Si[0][None]], axis=0),
    )


def _site_sum_correction(
    est: GreensEstimator,
    GXr, GXi, RYr, RYi,
    shift: Sequence[int],
    tD: Optional[Pair],
    t0: Optional[Pair],
    conj_tD: bool,
    conj_t0: bool,
    t_shift: Sequence[int],
) -> Pair:
    """(1/(Nrv Nvol)) sum_rv sum_i [t-weights] GX[i + shift] RY[i] — the building
    block of the tau = 0 / beta delta-corrections (GreensEstimator.jl:308-382)."""
    GXr_s = _roll_cells(est, GXr, shift, +1)
    GXi_s = _roll_cells(est, GXi, shift, +1)
    pr, pi = _cmul(GXr_s, GXi_s, RYr, RYi)  # (Nrv, Ltau, *L)
    if tD is not None or t0 is not None:
        if tD is not None:
            wr_, wi_ = tD
            wr_ = _roll_cells(est, wr_, t_shift, +1)
            if wi_ is not None:
                wi_ = _roll_cells(est, wi_, t_shift, +1)
                if conj_tD:
                    wi_ = -wi_
                pr, pi = _cmul(pr, pi, wr_, wi_)
            else:
                pr, pi = pr * wr_, pi * wr_
        if t0 is not None:
            tr_, ti_ = t0
            if ti_ is not None:
                if conj_t0:
                    ti_ = -ti_
                pr, pi = _cmul(pr, pi, tr_, ti_)
            else:
                pr, pi = pr * tr_, pi * tr_
    nvol = est.Ltau * est.n_cells
    return jnp.sum(pr) / (est.Nrv * nvol), jnp.sum(pi) / (est.Nrv * nvol)


def _delta_cell(est: GreensEstimator, r: Sequence[int]) -> Tuple[int, ...]:
    return tuple(int(v) % l for v, l in zip(r, est.L))


def measure_GD0_GD0(
    est: GreensEstimator,
    orbitals: Tuple[int, int, int, int],
    r1, r2, r3, r4,
    coef: float,
    tD: Optional[Pair] = None,
    t0: Optional[Pair] = None,
    conj_tD: bool = False,
    conj_t0: bool = False,
) -> Pair:
    """G(D,0).G(D,0) contraction with its two tau = beta boundary corrections and
    the double-delta term (measure_GD0_GD0!, GreensEstimator.jl:241-388)."""
    a, b, c, d = orbitals
    GAr, GAi, _, _ = est.orbital_fields(a)
    _, _, RBr, RBi = est.orbital_fields(b)
    GCr, GCi, _, _ = est.orbital_fields(c)
    _, _, RDr, RDi = est.orbital_fields(d)
    D = est.D

    sh = lambda arr, r: _roll_cells(est, arr, r, -1)  # view at i + r
    fields = (
        (sh(GAr, r1), sh(GAi, r1), sh(GCr, r3), sh(GCi, r3)),
        (sh(RBr, r2), sh(RBi, r2), sh(RDr, r4), sh(RDi, r4)),
    )
    Sr, Si = _four_point(est, fields, tD, t0, conj_tD, conj_t0)
    Cr, Ci = _extend_beta(est, Sr, Si)

    # tau = beta corrections
    if a == b:
        shift = tuple(r1[k] - r2[k] - r3[k] + r4[k] for k in range(D))
        vr, vi = _site_sum_correction(
            est, GCr, GCi, RDr, RDi, shift, tD, t0, conj_tD, conj_t0,
            t_shift=tuple(r1[k] - r2[k] for k in range(D)),
        )
        cell = _delta_cell(est, tuple(r2[k] - r1[k] for k in range(D)))
        Cr = Cr.at[(est.Ltau,) + cell].add(-vr)
        Ci = Ci.at[(est.Ltau,) + cell].add(-vi)
    if c == d:
        shift = tuple(-r1[k] + r2[k] + r3[k] - r4[k] for k in range(D))
        vr, vi = _site_sum_correction(
            est, GAr, GAi, RBr, RBi, shift, tD, t0, conj_tD, conj_t0,
            t_shift=tuple(r3[k] - r4[k] for k in range(D)),
        )
        cell = _delta_cell(est, tuple(r4[k] - r3[k] for k in range(D)))
        Cr = Cr.at[(est.Ltau,) + cell].add(-vr)
        Ci = Ci.at[(est.Ltau,) + cell].add(-vi)
    if (
        a == b
        and c == d
        and all((r2[k] - r1[k]) % est.L[k] == (r4[k] - r3[k]) % est.L[k] for k in range(D))
    ):
        cell = _delta_cell(est, tuple(r2[k] - r1[k] for k in range(D)))
        if tD is None and t0 is None:
            Cr = Cr.at[(est.Ltau,) + cell].add(1.0)
        else:
            # mean of the weight product over the lattice
            wr = jnp.ones((est.Ltau,) + est.L)
            wi = jnp.zeros((est.Ltau,) + est.L)
            wr, wi = _apply_weight(
                est, wr, wi, tD, conj_tD, shift=tuple(r1[k] - r2[k] for k in range(D))
            )
            wr, wi = _apply_weight(est, wr, wi, t0, conj_t0)
            nvol = est.Ltau * est.n_cells
            Cr = Cr.at[(est.Ltau,) + cell].add(jnp.sum(wr) / nvol)
            Ci = Ci.at[(est.Ltau,) + cell].add(jnp.sum(wi) / nvol)
    return coef * Cr, coef * Ci


def measure_GDD_G00(
    est: GreensEstimator,
    orbitals: Tuple[int, int, int, int],
    r1, r2, r3, r4,
    coef: float,
    tD: Optional[Pair] = None,
    t0: Optional[Pair] = None,
    conj_tD: bool = False,
    conj_t0: bool = False,
) -> Pair:
    """G(D,D).G(0,0) contraction (measure_GDD_G00!, GreensEstimator.jl:396-467) —
    equal-time factors at both ends, no boundary corrections."""
    a, b, c, d = orbitals
    GAr, GAi, _, _ = est.orbital_fields(a)
    _, _, RBr, RBi = est.orbital_fields(b)
    GCr, GCi, _, _ = est.orbital_fields(c)
    _, _, RDr, RDi = est.orbital_fields(d)
    sh = lambda arr, r: _roll_cells(est, arr, r, -1)
    fields = (
        (sh(GAr, r1), sh(GAi, r1), sh(RBr, r2), sh(RBi, r2)),
        (sh(GCr, r3), sh(GCi, r3), sh(RDr, r4), sh(RDi, r4)),
    )
    # slot pairing: delta side takes vector n (GR_a, R_b), zero side vector m
    (X1r, X1i, X2r, X2i), (Y1r, Y1i, Y2r, Y2i) = fields
    pn, pm = _pair_indices(est.Nrv)
    pn = jnp.asarray(pn)
    pm = jnp.asarray(pm)
    Pr, Pi = _cmul(X1r[pn], X1i[pn], X2r[pn], X2i[pn])
    Qr, Qi = _cmul(Y1r[pm], Y1i[pm], Y2r[pm], Y2i[pm])
    Pr, Pi = _apply_weight(est, Pr, Pi, tD, conj_tD)
    Qr, Qi = _apply_weight(est, Qr, Qi, t0, conj_t0)
    Sr, Si = est.xcorr_accumulate(Pr, Pi, Qr, Qi, doubled=False)
    npairs = pn.shape[0]
    Cr, Ci = _extend_beta(est, Sr / npairs, Si / npairs)
    return coef * Cr, coef * Ci


def measure_G0D_GD0(
    est: GreensEstimator,
    orbitals: Tuple[int, int, int, int],
    r1, r2, r3, r4,
    coef: float,
    tD: Optional[Pair] = None,
    t0: Optional[Pair] = None,
    conj_tD: bool = False,
    conj_t0: bool = False,
) -> Pair:
    """G(0,D).G(D,0) contraction with tau = 0 and tau = beta delta-corrections
    (measure_G0D_GD0!, GreensEstimator.jl:475-606)."""
    a, b, c, d = orbitals
    GAr, GAi, _, _ = est.orbital_fields(a)
    _, _, RBr, RBi = est.orbital_fields(b)
    GCr, GCi, _, _ = est.orbital_fields(c)
    _, _, RDr, RDi = est.orbital_fields(d)
    D = est.D
    sh = lambda arr, r: _roll_cells(est, arr, r, -1)
    # delta side: (Rt_b_r2)_n (.) (GR_c_r3)_m ; zero side: (GR_a_r1)_n (.) (Rt_d_r4)_m
    fields = (
        (sh(RBr, r2), sh(RBi, r2), sh(GCr, r3), sh(GCi, r3)),
        (sh(GAr, r1), sh(GAi, r1), sh(RDr, r4), sh(RDi, r4)),
    )
    Sr, Si = _four_point(est, fields, tD, t0, conj_tD, conj_t0)
    Cr, Ci = _extend_beta(est, Sr, Si)

    shift = tuple(-r1[k] + r2[k] - r3[k] + r4[k] for k in range(D))
    if a == b:
        vr, vi = _site_sum_correction(
            est, GCr, GCi, RDr, RDi, shift, tD, t0, conj_tD, conj_t0,
            t_shift=tuple(-r1[k] + r2[k] for k in range(D)),
        )
        cell = _delta_cell(est, tuple(r1[k] - r2[k] for k in range(D)))
        Cr = Cr.at[(0,) + cell].add(-vr)
        Ci = Ci.at[(0,) + cell].add(-vi)
    if c == d:
        vr, vi = _site_sum_correction(
            est, GAr, GAi, RBr, RBi, shift, tD, t0, conj_tD, conj_t0,
            t_shift=tuple(-r4[k] + r3[k] for k in range(D)),
        )
        cell = _delta_cell(est, tuple(r4[k] - r3[k] for k in range(D)))
        Cr = Cr.at[(est.Ltau,) + cell].add(-vr)
        Ci = Ci.at[(est.Ltau,) + cell].add(-vi)
    return coef * Cr, coef * Ci
