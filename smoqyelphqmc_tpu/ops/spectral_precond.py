"""Spectral preconditioner: exact [Mbar^T Mbar]^{-1} via eigendecomposition.

A TPU-native upgrade of the KPM preconditioner (ops/kpm.py,
/root/reference/src/KPMPreconditioner.jl): for the SYMMETRIC propagator
factorization, Bbar = CB Dbar CB^T is a real symmetric N x N matrix, so instead
of a per-frequency Chebyshev expansion (sequential recurrence, latency-bound on
TPU) we diagonalize Bbar = Q diag(lam) Q^T ONCE per field update and apply the
per-Matsubara-frequency inverse EXACTLY:

    P^{-1} u = F^dag  Q  diag( 1 / (lam^2 - 2 lam cos(phi_w) + 1) )  Q^T  F u,

i.e. tau-FFT -> one dense (N x N) matmul -> elementwise (Ltau x N) scaling ->
one dense matmul -> inverse FFT. Everything is MXU-shaped with zero sequential
loops, and the preconditioner is exact (no Lanczos bounds, no order truncation,
no activation heuristics — though we keep a guard for degenerate spectra).

Cost: one eigh(N) per update + 4 DFT matmuls and 2 dense matmuls per apply.
The eigh can run at lower precision than the CG without affecting correctness
(a preconditioner only needs to be a fixed SPD map)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..utils.pytree import register_pytree_dataclass, static_field
from .fermion_det import FermionDetMatrix
from .fourier import TauFourier
from .kpm import averaged_propagator


@register_pytree_dataclass
class SpectralPreconditioner:
    """Eigendecomposition of Bbar + per-frequency inverse filters.

    `dtype` selects the APPLY precision: a preconditioner is just a fixed SPD
    map, so running its matmuls in float32 (native MXU speed) leaves the f64 CG
    exact while slashing the per-iteration cost; the eigendecomposition itself
    stays f64."""

    Q: jnp.ndarray  # (N, N) eigenvectors of Bbar (2N x 2N for complex hoppings)
    filt: jnp.ndarray  # (Ltau, N) 1 / (lam^2 - 2 lam cos(phi_w) + 1)
    fft: TauFourier
    Ltau: int = static_field()
    n_sites: int = static_field()
    dtype: str = static_field(default="float32")
    complex_pair: bool = static_field(default=False)

    def as_operator(self):
        return lambda r: spectral_apply(self, r)


def build_spectral(fdm: FermionDetMatrix, dtype: str = "float32") -> SpectralPreconditioner:
    """Construct from the current fermion matrix (also the update path).

    In float32 mode the eigendecomposition itself runs in f32 (~20x faster on
    TPU, measured 15 ms vs 300 ms at N = 288); eigenvector rounding only
    perturbs the preconditioner, never the solution.

    For the ASYMMETRIC factorization (Bbar = D CB, not symmetric) the
    preconditioner uses the half-angle symmetrization CB(dtau/2) D CB(dtau/2)^T
    built from the same averaged factors — it differs from the true Bbar by
    O(dtau^2) commutators, which only costs a few CG iterations.

    COMPLEX hoppings: Bbar is complex Hermitian, equivalently the real SYMMETRIC
    2N x 2N embedding E = [[B_re, -B_im], [B_im, B_re]] acting on the stacked
    (re, im)-channel site vector; eigh(E) carries every eigenvalue of Bbar twice
    and the same per-frequency filter applies in the doubled basis."""
    dt = jnp.dtype(dtype)
    if fdm.symmetric:
        bbar = averaged_propagator(fdm)
    else:
        bbar = _symmetrized_propagator(fdm)
    N = fdm.n_sites
    if not fdm.complex_hops:
        eye = jnp.eye(N)
        B = bbar.apply(eye).T  # dense Bbar
        B = 0.5 * (B + B.T)  # symmetrize against roundoff
    else:
        # dense complex Bbar columns via channel-paired basis vectors
        eye = jnp.eye(N)
        basis = jnp.stack([eye, jnp.zeros_like(eye)], axis=1)[:, :, None, :]  # (N, 2, 1, N)
        out = bbar.apply(basis)  # (N, 2, 1, N): row k = Bbar e_k
        B_re = out[:, 0, 0, :].T
        B_im = out[:, 1, 0, :].T
        B = jnp.block([[B_re, -B_im], [B_im, B_re]])
        B = 0.5 * (B + B.T)
    lam, Q = jnp.linalg.eigh(B.astype(dt))
    lam = lam.astype(jnp.float64)
    Ltau = fdm.Ltau
    phi = 2.0 * np.pi * (np.arange(Ltau) + 0.5) / Ltau
    cos_phi = jnp.asarray(np.cos(phi))
    denom = lam[None, :] ** 2 - 2.0 * lam[None, :] * cos_phi[:, None] + 1.0  # (Ltau, N)
    # guard: denom >= (1-|lam|)^2 > 0 unless lam = +-1 exactly at phi = 0/pi
    filt = 1.0 / jnp.maximum(denom, 1e-12)
    return SpectralPreconditioner(
        Q=Q.astype(dt),
        filt=filt.astype(dt),
        fft=TauFourier.build(Ltau, dtype=dtype),
        Ltau=Ltau,
        n_sites=N,
        dtype=dtype,
        complex_pair=fdm.complex_hops,
    )


def _symmetrized_propagator(fdm: FermionDetMatrix):
    """Half-angle symmetrized averaged propagator for asymmetric factorizations:
    per hop, cosh/sinh at dtau become cosh/sinh at dtau/2 via half-angle
    identities, giving a Hermitian CB(dtau/2) D CB(dtau/2)^dag surrogate."""
    from .checkerboard import build_checkerboard_op
    from .kpm import AveragedPropagator

    if fdm.complex_hops:
        expV_bar = jnp.mean(fdm.exp_nV, axis=0)
        cosh_bar = jnp.mean(fdm.cosh_hop, axis=0)
        sinh_bar = jnp.mean(fdm.sinh_hop, axis=0)
        sinh_bar_im = jnp.mean(fdm.sinh_hop_im, axis=0)
        ch2 = jnp.sqrt((1.0 + cosh_bar) / 2.0)
        safe = 2.0 * jnp.where(ch2 > 0, ch2, 1.0)
        cb = build_checkerboard_op(fdm.structure, ch2, sinh_bar / safe, sinh_bar_im / safe)
        return AveragedPropagator(cb=cb, expV=expV_bar, symmetric=True)
    expV_bar, cosh_bar, sinh_bar = fdm.averaged_factors()
    ch2 = jnp.sqrt((1.0 + cosh_bar) / 2.0)
    sh2 = sinh_bar / (2.0 * jnp.where(ch2 > 0, ch2, 1.0))
    cb = build_checkerboard_op(fdm.structure, ch2, sh2)
    return AveragedPropagator(cb=cb, expV=expV_bar, symmetric=True)


def spectral_update(pre: SpectralPreconditioner, fdm: FermionDetMatrix, key=None) -> SpectralPreconditioner:
    """Refresh for a new field configuration (key accepted for API parity)."""
    return build_spectral(fdm, dtype=pre.dtype)


def spectral_apply(pre: SpectralPreconditioner, r: jnp.ndarray) -> jnp.ndarray:
    """z = P^{-1} r; batch axes broadcast. For real hoppings r is (..., Ltau, N)
    with independent channels; for complex hoppings r is the channel pair
    (..., 2, Ltau, N) and the filter acts in the doubled (re, im)-site basis."""
    in_dtype = r.dtype
    r = r.astype(pre.Q.dtype)
    if not pre.complex_pair:
        ur, ui = pre.fft.forward(r)
        ur = ur @ pre.Q
        ui = ui @ pre.Q
        ur = ur * pre.filt
        ui = ui * pre.filt
        ur = ur @ pre.Q.T
        ui = ui @ pre.Q.T
        zr, _ = pre.fft.inverse(ur, ui)
        return zr.astype(in_dtype)
    N = pre.n_sites
    ur, ui = pre.fft.forward(r[..., 0, :, :], r[..., 1, :, :])
    w = jnp.concatenate([ur, ui], axis=-1)  # (..., Ltau, 2N) per frequency row
    w = w @ pre.Q
    w = w * pre.filt
    w = w @ pre.Q.T
    zre, zim = pre.fft.inverse(w[..., :N], w[..., N:])
    return jnp.stack([zre, zim], axis=-3).astype(in_dtype)


def dense_spectral(pre: SpectralPreconditioner) -> np.ndarray:
    """Dense (Ltau N, Ltau N) matrix of P^{-1} (testing oracle)."""
    import jax

    dim = pre.Ltau * pre.n_sites
    eye = np.eye(dim).reshape(dim, pre.Ltau, pre.n_sites)
    cols = jax.vmap(lambda e: spectral_apply(pre, e))(jnp.asarray(eye))
    return np.asarray(cols).reshape(dim, dim).T
