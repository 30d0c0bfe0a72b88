"""Fermion-matrix derivative forces: force[p, l] += nu * Re <u | dM/dx_{p,l} | v>.

Re-design of /root/reference/src/fermion_det_matrix_dervative.jl: the derivative of
the checkerboard-factorized M is never formed. Instead the algorithm walks the
checkerboard colors, incrementally transforming u' and v' with forward / inverse
color applications so the derivative of each factor is evaluated in the correct
basis. Per color, the SSH (hopping-derivative) contributions of all couplings in
that color are evaluated as one gather + elementwise + scatter-add; the Holstein
(potential-derivative) term is a single vectorized pass.

u, v carry a leading complex-channel axis (2, Ltau, N); with real couplings the
real part of <u|A|v> is the channel sum of elementwise products."""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from ..models.electron_phonon import ElectronPhononParameters
from .checkerboard import CheckerboardStructure
from .fermion_det import FermionDetMatrix, _boundary_sign_first


@dataclasses.dataclass(frozen=True)
class ForcePlan:
    """Static grouping of SSH couplings by checkerboard color.

    For each color: index arrays (into the SSH coupling axis) of the couplings
    whose hop lives in that color, plus the site pair and phonon pair per coupling
    and finite-mass masks (frozen phonons take no force,
    fermion_det_matrix_dervative.jl:227-247)."""

    ssh_by_color: Tuple[np.ndarray, ...]  # coupling indices per color
    site_i: Tuple[np.ndarray, ...]
    site_j: Tuple[np.ndarray, ...]
    phonon_i: Tuple[np.ndarray, ...]
    phonon_f: Tuple[np.ndarray, ...]
    finite_i: Tuple[np.ndarray, ...]
    finite_f: Tuple[np.ndarray, ...]
    hol_finite: np.ndarray  # (n_holstein,) finite-mass mask


def build_force_plan(
    elph: ElectronPhononParameters, structure: CheckerboardStructure
) -> ForcePlan:
    n_colors = structure.n_colors
    color_of_hop = np.zeros(structure.n_hops, dtype=np.int64)
    for c, (start, stop) in enumerate(structure.color_slices):
        color_of_hop[structure.perm[start:stop]] = c
    frozen = elph.frozen_mask
    ssh_by_color, site_i, site_j, phonon_i, phonon_f, finite_i, finite_f = [], [], [], [], [], [], []
    for c in range(n_colors):
        idx = np.where(color_of_hop[elph.ssh_to_hop] == c)[0] if elph.n_ssh else np.zeros(0, np.int64)
        ssh_by_color.append(idx.astype(np.int32))
        hops = elph.ssh_to_hop[idx]
        site_i.append(structure.neighbor_table[0, hops].astype(np.int32))
        site_j.append(structure.neighbor_table[1, hops].astype(np.int32))
        p_i = elph.ssh_to_phonon[0, idx]
        p_f = elph.ssh_to_phonon[1, idx]
        phonon_i.append(p_i.astype(np.int32))
        phonon_f.append(p_f.astype(np.int32))
        finite_i.append((~frozen[p_i]).astype(np.float64))
        finite_f.append((~frozen[p_f]).astype(np.float64))
    hol_finite = (
        (~frozen[elph.hol_to_phonon]).astype(np.float64) if elph.n_holstein else np.zeros(0)
    )
    return ForcePlan(
        ssh_by_color=tuple(ssh_by_color),
        site_i=tuple(site_i),
        site_j=tuple(site_j),
        phonon_i=tuple(phonon_i),
        phonon_f=tuple(phonon_f),
        finite_i=tuple(finite_i),
        finite_f=tuple(finite_f),
        hol_finite=hol_finite,
    )


def _add_ssh_color_force(
    force: jnp.ndarray,
    nu: float,
    up: jnp.ndarray,
    vp: jnp.ndarray,
    elph: ElectronPhononParameters,
    x: jnp.ndarray,
    plan: ForcePlan,
    dtau_eff: float,
    color: int,
) -> jnp.ndarray:
    """SSH kinetic-derivative contribution of one checkerboard color
    (_mul_nuRe_dtau_dKc_dx!, fermion_det_matrix_dervative.jl:196-254)."""
    idx = plan.ssh_by_color[color]
    if idx.size == 0:
        return force
    i = plan.site_i[color]
    j = plan.site_j[color]
    p = plan.phonon_i[color]
    pf = plan.phonon_f[color]
    idx_j = jnp.asarray(idx)
    dx = x[pf, :] - x[p, :]  # (n_c, Ltau)
    dK = dtau_eff * (
        elph.ssh_alpha[idx_j][:, None]
        + 2.0 * elph.ssh_alpha2[idx_j][:, None] * dx
        + 3.0 * elph.ssh_alpha3[idx_j][:, None] * dx**2
        + 4.0 * elph.ssh_alpha4[idx_j][:, None] * dx**3
    )  # (n_c, Ltau)
    # Re( conj(up[l,j]) dK v'[l,i] + conj(up[l,i]) dK v'[l,j] ) for real dK
    prod = jnp.sum(up[..., j] * vp[..., i] + up[..., i] * vp[..., j], axis=0)  # (Ltau, n_c)
    val = nu * dK * prod.T  # (n_c, Ltau)
    force = force.at[p].add(-val * jnp.asarray(plan.finite_i[color], dtype=val.dtype)[:, None])
    force = force.at[pf].add(val * jnp.asarray(plan.finite_f[color], dtype=val.dtype)[:, None])
    return force


def _add_holstein_V_force(
    force: jnp.ndarray,
    nu: float,
    up: jnp.ndarray,
    vp: jnp.ndarray,
    elph: ElectronPhononParameters,
    x: jnp.ndarray,
    plan: ForcePlan,
) -> jnp.ndarray:
    """Holstein potential-derivative contribution
    (_mul_nuRe_dtau_dV_dx!, fermion_det_matrix_dervative.jl:258-290)."""
    if elph.n_holstein == 0:
        return force
    sites = elph.hol_to_site
    phonons = elph.hol_to_phonon
    xp = x[phonons, :]  # (n_hol, Ltau)
    dV = elph.dtau * (
        elph.hol_alpha[:, None]
        + 2.0 * elph.hol_alpha2[:, None] * xp
        + 3.0 * elph.hol_alpha3[:, None] * xp**2
        + 4.0 * elph.hol_alpha4[:, None] * xp**3
    )
    prod = jnp.sum(up[..., sites] * vp[..., sites], axis=0)  # (Ltau, n_hol)
    val = nu * dV * prod.T * jnp.asarray(plan.hol_finite, dtype=prod.dtype)[:, None]
    return force.at[phonons].add(val)


def add_M_derivative_force(
    force: jnp.ndarray,
    nu: float,
    u: jnp.ndarray,
    v: jnp.ndarray,
    fdm: FermionDetMatrix,
    elph: ElectronPhononParameters,
    x: jnp.ndarray,
    plan: ForcePlan,
) -> jnp.ndarray:
    """force += nu * Re <u | dM/dx | v>  (mul_nuRe_dMdx!,
    fermion_det_matrix_dervative.jl:2-114 sym / :117-191 asym).

    u, v: (2, Ltau, N) channel pairs; force: (n_phonon, Ltau).
    """
    cb = fdm.cb
    n_colors = cb.n_colors
    dtau = elph.dtau

    # v' = B_l (+-v[l-1]): the tau-shifted, sign-fixed column the derivative acts on
    vp = jnp.roll(v, 1, axis=-2) * _boundary_sign_first(fdm.Ltau).astype(v.dtype)
    vp = fdm.apply_B(vp)
    up = u

    if fdm.symmetric:
        # term 1: d(exp(-dtau K/2)) on the left factor — walk colors in reverse
        if elph.n_ssh > 0:
            for color in reversed(range(n_colors)):
                force = _add_ssh_color_force(force, -nu, up, vp, elph, x, plan, dtau / 2, color)
                up = cb.apply_color(up, color)
                vp = cb.apply_color(vp, color, inverse=True)
        else:
            # pair <u| CB dD CB^dag |w>: u-side takes CB^dag (reversed colors),
            # v-side peels the LEFT factor CB, i.e. the plain inverse. (The
            # reference peels with the transposed inverse here,
            # fermion_det_matrix_dervative.jl:70-74, which differs at
            # O([K_c, K_c']) for non-commuting colors; verified exact by
            # finite differences and a direct derivative bracket.)
            up = cb.apply(up, transpose=True)
            vp = cb.apply(vp, inverse=True)
        # term 2: d(exp(-dtau V)) in the middle
        if elph.n_holstein > 0:
            force = _add_holstein_V_force(force, -nu, up, vp, elph, x, plan)
        up = up * fdm.exp_nV
        vp = vp / fdm.exp_nV
        # term 3: d(exp(-dtau K/2)^T) on the right factor — walk colors forward
        if elph.n_ssh > 0:
            for color in range(n_colors):
                force = _add_ssh_color_force(force, -nu, up, vp, elph, x, plan, dtau / 2, color)
                up = cb.apply_color(up, color)
                vp = cb.apply_color(vp, color, inverse=True)
    else:
        # asym B = exp(-dtau V) CB: potential term first, then kinetic walk
        if elph.n_holstein > 0:
            force = _add_holstein_V_force(force, -nu, up, vp, elph, x, plan)
        if elph.n_ssh > 0:
            up = up * fdm.exp_nV
            vp = vp / fdm.exp_nV
            for color in reversed(range(n_colors)):
                force = _add_ssh_color_force(force, -nu, up, vp, elph, x, plan, dtau, color)
                up = cb.apply_color(up, color)
                vp = cb.apply_color(vp, color, inverse=True)
    return force
