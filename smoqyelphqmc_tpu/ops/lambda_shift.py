"""Holstein shift matrix Lambda and its products.

Re-design of /root/reference/src/holstein_shift_matrix.jl: the transform Lambda
arising from the particle-hole-symmetric Holstein parameterization alpha X (n - 1)
(PRE 105, 065302). Lambda is diagonal-per-site with a one-slice tau shift:

  Lambda[l, n] = s_l * exp(+dtau (alpha x_{p,l} + alpha3 x_{p,l}^3) / 2),
  s_0 = +1, s_l = -1 (l > 0),

where only ph-sym-form Holstein couplings contribute the exponential factor.
All products are rolls + elementwise multiplies over (..., Ltau, N) real arrays
(complex fields ride a leading channel axis; Lambda itself is real)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..models.electron_phonon import ElectronPhononParameters


def build_lambda(elph: ElectronPhononParameters, x: jnp.ndarray, n_sites: int) -> jnp.ndarray:
    """(Ltau, n_sites) shift matrix for the current phonon field
    (update_Lambda!, holstein_shift_matrix.jl:2-44)."""
    Ltau = elph.Ltau
    sign = np.full((Ltau, 1), -1.0)
    sign[0, 0] = 1.0
    base = jnp.asarray(sign, dtype=x.dtype)
    idx = np.where(elph.hol_ph_sym)[0]
    if idx.size == 0:
        return jnp.broadcast_to(base, (Ltau, n_sites))
    idx_j = jnp.asarray(idx.astype(np.int32))
    xp = x[elph.hol_to_phonon[idx], :]  # (n_phsym, Ltau)
    expo = 0.5 * elph.dtau * (
        elph.hol_alpha[idx_j][:, None] * xp + elph.hol_alpha3[idx_j][:, None] * xp**3
    )
    factors = jnp.exp(expo)  # (n_phsym, Ltau)
    prod = jnp.ones((n_sites, Ltau), dtype=x.dtype).at[elph.hol_to_site[idx]].multiply(factors)
    return base * prod.T


def mul_lambda(Lam: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """v' = Lambda v: v'[l] = Lambda[l+1] v[l+1] (cyclic), holstein_shift_matrix.jl:47-71."""
    return jnp.roll(Lam * v, -1, axis=-2)


def ldiv_lambda(Lam: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """v' = Lambda^{-1} v: v'[l] = v[l-1] / Lambda[l], holstein_shift_matrix.jl:74-98."""
    return jnp.roll(v, 1, axis=-2) / Lam


def mul_lambda_T(Lam: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """v' = Lambda^T v: v'[l] = Lambda[l] v[l-1], holstein_shift_matrix.jl:102-126."""
    return Lam * jnp.roll(v, 1, axis=-2)


def ldiv_lambda_T(Lam: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """v' = Lambda^{-T} v: v'[l] = v[l+1] / Lambda[l+1], holstein_shift_matrix.jl:129-153."""
    return jnp.roll(v / Lam, -1, axis=-2)


def add_lambda_derivative_force(
    force: jnp.ndarray,
    nu: float,
    up: jnp.ndarray,
    v: jnp.ndarray,
    Lam: jnp.ndarray,
    elph: ElectronPhononParameters,
    x: jnp.ndarray,
) -> jnp.ndarray:
    """force[p, l] += nu * Re <up | dLambda/dx_{p,l} | v>
    (mul_nuRe_dLambda_dx!, holstein_shift_matrix.jl:156-201).

    up, v carry a leading complex-channel axis (2, Ltau, N); Lambda is real so
    Re(conj(a) c b) = sum_ch a_ch b_ch * c. x must be the field Lam was built from.
    """
    idx = np.where(elph.hol_ph_sym)[0]
    if idx.size == 0:
        return force
    idx_j = jnp.asarray(idx.astype(np.int32))
    sites = elph.hol_to_site[idx]  # static (n_phsym,)
    phonons = elph.hol_to_phonon[idx]
    xp = x[phonons, :]  # (n_c, Ltau)
    dcoup = 0.5 * elph.dtau * (
        elph.hol_alpha[idx_j][:, None] + 3.0 * elph.hol_alpha3[idx_j][:, None] * xp**2
    )  # (n_c, Ltau)
    lam_site = Lam[:, sites]  # (Ltau, n_c)
    # Re( conj(up[l-1, site]) * dLam * v[l, site] ): channel sum of products
    up_shift = jnp.roll(up, 1, axis=-2)  # up[l-1]
    prod = jnp.sum(up_shift[..., sites] * v[..., sites], axis=0)  # (Ltau, n_c) after channel sum
    val = nu * (dcoup.T * lam_site * prod)  # (Ltau, n_c)
    return force.at[phonons].add(val.T)
