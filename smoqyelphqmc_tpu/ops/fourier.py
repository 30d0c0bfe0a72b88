"""Imaginary-time (antiperiodic) Fourier transform as MXU matmuls.

Re-design of /root/reference/src/FourierTransformer.jl: the unitary change of basis
tau -> omega_n for antiperiodic fermionic boundary conditions,

    u[w] = (1/sqrt(Ltau)) sum_l exp(-i (2 pi w + pi) l / Ltau) v[l],

which maps the antiperiodic one-slice shift operator to diag(exp(-i phi_w)) with
phi_w = 2 pi (w + 1/2) / Ltau. The TPU backend exposes no complex dtypes and no
FFT, so the transform is applied as dense DFT *matmuls* with precomputed real and
imaginary matrices — (Ltau, Ltau) @ (Ltau, N) contractions that map straight onto
the MXU and batch over leading axes. Complex fields are (re, im) array pairs.

For the problem sizes of this framework (Ltau in the hundreds) the matmul DFT is
bandwidth-friendly and fuses with the surrounding KPM arithmetic; a factored
Cooley-Tukey variant (two small matmuls + twiddles) is a planned optimization.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..utils.pytree import register_pytree_dataclass, static_field


def dft_matrices(n: int, sign: float = -1.0, phase_shift: float = 0.0, norm: float = 1.0):
    """Real/imag parts of W[k, l] = norm * exp(sign * i * (2 pi k + phase_shift) l / n)."""
    k = np.arange(n)[:, None]
    l = np.arange(n)[None, :]
    ang = sign * (2.0 * np.pi * k + phase_shift) * l / n
    return norm * np.cos(ang), norm * np.sin(ang)


@register_pytree_dataclass
class TauFourier:
    """Unitary antiperiodic tau -> omega transform (and inverse) as matmul pairs."""

    Wre: jnp.ndarray  # (Ltau, Ltau)
    Wim: jnp.ndarray
    Ltau: int = static_field()

    @staticmethod
    def build(Ltau: int, dtype: str = "float64") -> "TauFourier":
        wre, wim = dft_matrices(Ltau, sign=-1.0, phase_shift=np.pi, norm=1.0 / np.sqrt(Ltau))
        dt = jnp.dtype(dtype)
        return TauFourier(Wre=jnp.asarray(wre, dtype=dt), Wim=jnp.asarray(wim, dtype=dt), Ltau=Ltau)

    def forward(
        self, vre: jnp.ndarray, vim: Optional[jnp.ndarray] = None
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(..., Ltau, N) pair -> frequency-space pair along axis -2."""
        ure = jnp.einsum("wl,...ln->...wn", self.Wre, vre)
        uim = jnp.einsum("wl,...ln->...wn", self.Wim, vre)
        if vim is not None:
            ure = ure - jnp.einsum("wl,...ln->...wn", self.Wim, vim)
            uim = uim + jnp.einsum("wl,...ln->...wn", self.Wre, vim)
        return ure, uim

    def inverse(self, ure: jnp.ndarray, uim: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Frequency-space pair -> (..., Ltau, N) pair (unitary: W^{-1} = W^dagger)."""
        vre = jnp.einsum("wl,...wn->...ln", self.Wre, ure) + jnp.einsum(
            "wl,...wn->...ln", self.Wim, uim
        )
        vim = jnp.einsum("wl,...wn->...ln", self.Wre, uim) - jnp.einsum(
            "wl,...wn->...ln", self.Wim, ure
        )
        return vre, vim


@register_pytree_dataclass
class AxisDFT:
    """Plain (periodic) DFT along one axis as a matmul pair — building block for
    space-time correlation FFTs and structure factors (no complex dtype needed)."""

    Wre: jnp.ndarray  # (n, n)
    Wim: jnp.ndarray
    n: int = static_field()
    inverse_norm: bool = static_field()

    @staticmethod
    def build(n: int, inverse: bool = False, dtype: str = "float64") -> "AxisDFT":
        sign = 1.0 if inverse else -1.0
        norm = 1.0 / n if inverse else 1.0
        wre, wim = dft_matrices(n, sign=sign, norm=norm)
        dt = jnp.dtype(dtype)
        return AxisDFT(
            Wre=jnp.asarray(wre, dtype=dt), Wim=jnp.asarray(wim, dtype=dt), n=n, inverse_norm=inverse
        )

    def apply(
        self, vre: jnp.ndarray, vim: Optional[jnp.ndarray], axis: int
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        vre_m = jnp.moveaxis(vre, axis, -1)
        ure = vre_m @ self.Wre.T
        uim = vre_m @ self.Wim.T
        if vim is not None:
            vim_m = jnp.moveaxis(vim, axis, -1)
            ure = ure - vim_m @ self.Wim.T
            uim = uim + vim_m @ self.Wre.T
        return jnp.moveaxis(ure, -1, axis), jnp.moveaxis(uim, -1, axis)
