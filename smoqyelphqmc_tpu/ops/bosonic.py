"""Bosonic (phonon) action and its derivatives.

Covers the capability surface of SmoQyDQMC's bosonic_action /
eval_derivative_anharmonic_action! / eval_derivative_dispersive_action! as used by
the reference updaters (SURVEY.md section 2b; call sites
/root/reference/src/EFAPFFHMCUpdater.jl:136,190,193).

Conventions (spelled out because this framework re-derives them):

  S_b = sum_p sum_l [ M_p / (2 dtau) (x_{p,l+1} - x_{p,l})^2
                      + dtau ( (1/2) M_p Omega_p^2 x_{p,l}^2 + Omega4_p x_{p,l}^4 ) ]
      + dtau sum_d sum_l [ (1/2) Mr_d Omegad_d^2 (x_{f,l} - x_{i,l})^2
                           + Omegad4_d (x_{f,l} - x_{i,l})^4 ]

with Mr the reduced mass of the coupled pair. Frozen modes (infinite mass) are
masked out of the on-site terms; a dispersion pair with one frozen member uses the
live member's mass."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..models.electron_phonon import ElectronPhononParameters


def _live_mass(elph: ElectronPhononParameters) -> jnp.ndarray:
    """(n_phonon,) mass with frozen entries replaced by 0 (their terms are masked)."""
    live = jnp.asarray(~elph.frozen_mask)
    return jnp.where(live, elph.mass, 0.0)


def _reduced_mass(elph: ElectronPhononParameters) -> jnp.ndarray:
    """(n_dispersion,) reduced mass of each coupled pair, with infinite-mass
    members dropping out (Mr -> live mass; both frozen -> 0)."""
    if elph.n_dispersion == 0:
        return jnp.zeros(0)
    m_i = elph.mass[elph.disp_to_phonon[0]]
    m_f = elph.mass[elph.disp_to_phonon[1]]
    fi = jnp.isfinite(m_i)
    ff = jnp.isfinite(m_f)
    both = fi & ff
    mr = jnp.where(both, m_i * m_f / jnp.where(both, m_i + m_f, 1.0), 0.0)
    mr = jnp.where(fi & ~ff, m_i, mr)
    mr = jnp.where(~fi & ff, m_f, mr)
    return mr


def bosonic_action(elph: ElectronPhononParameters, x: jnp.ndarray) -> jnp.ndarray:
    """Total bosonic action S_b(x) for x of shape (n_phonon, Ltau)."""
    dtau = elph.dtau
    m = _live_mass(elph)
    dx_tau = jnp.roll(x, -1, axis=1) - x
    kinetic = jnp.sum(m[:, None] / (2.0 * dtau) * dx_tau**2)
    potential = jnp.sum(
        dtau * (0.5 * m[:, None] * elph.Omega[:, None] ** 2 * x**2 + jnp.where(m > 0, elph.Omega4, 0.0)[:, None] * x**4)
    )
    S = kinetic + potential
    if elph.n_dispersion > 0:
        mr = _reduced_mass(elph)
        dxp = x[elph.disp_to_phonon[1], :] - x[elph.disp_to_phonon[0], :]
        S = S + jnp.sum(
            dtau * (0.5 * mr[:, None] * elph.disp_Omega[:, None] ** 2 * dxp**2 + elph.disp_Omega4[:, None] * dxp**4)
        )
    return S


def add_anharmonic_force(
    force: jnp.ndarray, elph: ElectronPhononParameters, x: jnp.ndarray
) -> jnp.ndarray:
    """force += d/dx of the quartic on-site term (frozen modes masked)."""
    m = _live_mass(elph)
    quartic = jnp.where(m > 0, elph.Omega4, 0.0)
    return force + elph.dtau * 4.0 * quartic[:, None] * x**3


def add_dispersive_force(
    force: jnp.ndarray, elph: ElectronPhononParameters, x: jnp.ndarray
) -> jnp.ndarray:
    """force += d/dx of the dispersive pair coupling."""
    if elph.n_dispersion == 0:
        return force
    dtau = elph.dtau
    mr = _reduced_mass(elph)
    p_i = elph.disp_to_phonon[0]
    p_f = elph.disp_to_phonon[1]
    dxp = x[p_f, :] - x[p_i, :]
    g = dtau * (mr[:, None] * elph.disp_Omega[:, None] ** 2 * dxp + 4.0 * elph.disp_Omega4[:, None] * dxp**3)
    live = jnp.asarray(~elph.frozen_mask)
    force = force.at[p_f].add(jnp.where(live[p_f][:, None], g, 0.0))
    force = force.at[p_i].add(jnp.where(live[p_i][:, None], -g, 0.0))
    return force


def harmonic_curvature(elph: ElectronPhononParameters) -> jnp.ndarray:
    """(n_phonon, Ltau) Fourier-space curvature Q_k of the harmonic part of S_b:

      S_harm = (1/2) sum_{p,k} Q_{p,k} |x-tilde_{p,k}|^2,
      Q_{p,k} = M_p ( (4/dtau) sin^2(pi k / Ltau) + dtau Omega_p^2 ),

    the quantity the exact Fourier accelerator integrates analytically."""
    Ltau = elph.Ltau
    k = np.arange(Ltau)
    sin2 = np.sin(np.pi * k / Ltau) ** 2
    m = _live_mass(elph)
    return m[:, None] * (4.0 / elph.dtau * jnp.asarray(sin2)[None, :] + elph.dtau * elph.Omega[:, None] ** 2)
