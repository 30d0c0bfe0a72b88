"""Local (per-unit-cell-averaged) measurements: tight-binding and electron-phonon
energies, phonon moments.

Re-design of /root/reference/src/Measurements/tight_binding_measurements.jl and
electron_phonon_measurements.jl: every quantity is a batched reduction over the
random-vector block; per-hop/per-coupling structure enters through static index
tables. Results are (re, im) scalar pairs per type id; spin-degenerate totals
(factor 2) are assembled by the orchestrator."""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from ..models.electron_phonon import ElectronPhononParameters
from ..models.fermion_path_integral import FermionPathIntegral
from ..models.tight_binding import TightBindingParameters
from .greens_estimator import GreensEstimator

Pair = Tuple[jnp.ndarray, jnp.ndarray]


def _site_density_fields(est: GreensEstimator):
    """W = 1 - GR (.) conj(R): per-point single-spin density estimate,
    (Nrv, Ltau, N) pair."""
    GRr, GRi = est.GR[:, 0], est.GR[:, 1]
    Rcr, Rci = est.R[:, 0], -est.R[:, 1]
    Wre = 1.0 - (GRr * Rcr - GRi * Rci)
    Wim = -(GRr * Rci + GRi * Rcr)
    return Wre, Wim


def measure_onsite_energy(
    est: GreensEstimator, tbp: TightBindingParameters, orbital: int
) -> Pair:
    """(1/Nc) sum_cells (eps - mu) <n> (tight_binding_measurements.jl:59-96)."""
    Wre, Wim = _site_density_fields(est)
    eps = tbp.eps.reshape(est.n_cells, est.n_orb)[:, orbital] - tbp.mu  # (Nc,)
    Wre_o = Wre.reshape(est.Nrv, est.Ltau, est.n_cells, est.n_orb)[..., orbital]
    Wim_o = Wim.reshape(est.Nrv, est.Ltau, est.n_cells, est.n_orb)[..., orbital]
    norm = est.Nrv * est.Ltau * est.n_cells
    return (
        jnp.sum(eps[None, None, :] * Wre_o) / norm,
        jnp.sum(eps[None, None, :] * Wim_o) / norm,
    )


def _hopping_energy(
    est: GreensEstimator, tbp: TightBindingParameters, t_lh, hopping_id: int, t_lh_im=None
) -> Pair:
    """h = < t GR(i) conj(R)(f) + conj(t) GR(f) conj(R)(i) > normalized by
    (Ltau * Nsites * Nrv) (tight_binding_measurements.jl:99-209). t_lh(_im):
    (Ltau, n_hops) real/imag parts of the hopping amplitudes."""
    start, stop = tbp.bond_slices[hopping_id]
    nt = tbp.neighbor_table[:, start:stop]
    i = jnp.asarray(nt[0])
    f = jnp.asarray(nt[1])
    t = t_lh[:, start:stop]  # (Ltau, Nc)
    GRr, GRi = est.GR[:, 0], est.GR[:, 1]
    Rcr, Rci = est.R[:, 0], -est.R[:, 1]
    # forward: GR(i) conj(R)(f); reverse: GR(f) conj(R)(i)
    fw_re = GRr[..., i] * Rcr[..., f] - GRi[..., i] * Rci[..., f]
    fw_im = GRr[..., i] * Rci[..., f] + GRi[..., i] * Rcr[..., f]
    rv_re = GRr[..., f] * Rcr[..., i] - GRi[..., f] * Rci[..., i]
    rv_im = GRr[..., f] * Rci[..., i] + GRi[..., f] * Rcr[..., i]
    norm = est.Ltau * est.n_sites * est.Nrv
    h_re = jnp.sum(t[None] * (fw_re + rv_re)) / norm
    h_im = jnp.sum(t[None] * (fw_im + rv_im)) / norm
    if t_lh_im is not None:
        ti = t_lh_im[:, start:stop]
        # t fw: re -= t_im fw_im, im += t_im fw_re; conj(t) rv: re += t_im rv_im, im -= t_im rv_re
        h_re = h_re + jnp.sum(ti[None] * (rv_im - fw_im)) / norm
        h_im = h_im + jnp.sum(ti[None] * (fw_re - rv_re)) / norm
    return h_re, h_im


def measure_bare_hopping_energy(
    est: GreensEstimator, tbp: TightBindingParameters, hopping_id: int
) -> Pair:
    t = jnp.broadcast_to(tbp.t0[None, :], (est.Ltau, tbp.n_hops))
    ti = None if tbp.t0_im is None else jnp.broadcast_to(tbp.t0_im[None, :], (est.Ltau, tbp.n_hops))
    return _hopping_energy(est, tbp, t, hopping_id, ti)


def measure_hopping_energy(
    est: GreensEstimator, tbp: TightBindingParameters, fpi: FermionPathIntegral, hopping_id: int
) -> Pair:
    return _hopping_energy(est, tbp, fpi.t, hopping_id, fpi.t_im)


def measure_hopping_amplitude(
    tbp: TightBindingParameters, fpi: FermionPathIntegral, hopping_id: int
) -> Pair:
    """Mean dressed hopping amplitude of one hopping type."""
    start, stop = tbp.bond_slices[hopping_id]
    im = jnp.asarray(0.0) if fpi.t_im is None else jnp.mean(fpi.t_im[:, start:stop])
    return jnp.mean(fpi.t[:, start:stop]), im


def measure_hopping_inversion(
    tbp: TightBindingParameters, fpi: FermionPathIntegral, hopping_id: int
) -> Pair:
    """Fraction of (hop, slice) entries whose dressed hopping has the opposite
    sign of the bare hopping — signals SSH-driven bond-order inversion."""
    start, stop = tbp.bond_slices[hopping_id]
    t = fpi.t[:, start:stop]
    t0 = tbp.t0[start:stop][None, :]
    inverted = jnp.mean((t * t0 < 0).astype(jnp.float64))
    return inverted, jnp.asarray(0.0)


# ----------------------------------------------------------------------
# Electron-phonon measurements
# ----------------------------------------------------------------------


def _type_slice(elph: ElectronPhononParameters, type_id: int) -> slice:
    return slice(type_id * elph.n_cells, (type_id + 1) * elph.n_cells)


def measure_phonon_kinetic_energy(
    elph: ElectronPhononParameters, x: jnp.ndarray, phonon_id: int
) -> jnp.ndarray:
    """Primitive estimator KE = 1/(2 dtau) - M <(x_{l+1}-x_l)^2> / (2 dtau^2),
    averaged over the cells of one phonon type; frozen modes report 0."""
    sl = _type_slice(elph, phonon_id)
    xs = x[sl]
    m = elph.mass[sl]
    live = jnp.isfinite(m)
    dx = jnp.roll(xs, -1, axis=1) - xs
    ke = 0.5 / elph.dtau - jnp.where(live, m, 0.0)[:, None] * dx**2 / (2.0 * elph.dtau**2)
    ke = jnp.where(live[:, None], ke, 0.0)
    denom = jnp.maximum(jnp.sum(live), 1)
    return jnp.sum(jnp.mean(ke, axis=1)) / denom


def measure_phonon_potential_energy(
    elph: ElectronPhononParameters, x: jnp.ndarray, phonon_id: int
) -> jnp.ndarray:
    """<(1/2) M Omega^2 x^2 + Omega4 x^4> per mode of one type."""
    sl = _type_slice(elph, phonon_id)
    xs = x[sl]
    m = elph.mass[sl]
    live = jnp.isfinite(m)
    pe = 0.5 * jnp.where(live, m, 0.0)[:, None] * elph.Omega[sl][:, None] ** 2 * xs**2
    pe = pe + jnp.where(live, elph.Omega4[sl], 0.0)[:, None] * xs**4
    denom = jnp.maximum(jnp.sum(live), 1)
    return jnp.sum(jnp.mean(pe, axis=1)) / denom


def measure_phonon_position_moment(
    elph: ElectronPhononParameters, x: jnp.ndarray, phonon_id: int, power: int
) -> jnp.ndarray:
    sl = _type_slice(elph, phonon_id)
    return jnp.mean(x[sl] ** power)


def measure_holstein_energy(
    est: GreensEstimator, elph: ElectronPhononParameters, x: jnp.ndarray, holstein_id: int
) -> Pair:
    """Single-spin Holstein coupling energy of one coupling type
    (electron_phonon_measurements.jl:61-123): even powers couple to n, odd powers
    to (n - 1/2) in the ph-symmetric form."""
    nc = elph.n_cells
    sl = slice(holstein_id * nc, (holstein_id + 1) * nc)
    phonons = elph.hol_to_phonon[sl]
    sites = elph.hol_to_site[sl]
    phs = bool(elph.hol_ph_sym[holstein_id * nc])
    xp = x[phonons, :]  # (Nc, Ltau)
    a1 = elph.hol_alpha[sl][:, None]
    a2 = elph.hol_alpha2[sl][:, None]
    a3 = elph.hol_alpha3[sl][:, None]
    a4 = elph.hol_alpha4[sl][:, None]
    even = a2 * xp**2 + a4 * xp**4  # (Nc, Ltau)
    odd = a1 * xp + a3 * xp**3
    Wre, Wim = _site_density_fields(est)  # (Nrv, Ltau, N)
    n_re = jnp.mean(Wre[..., sites], axis=0)  # (Ltau, Nc)
    n_im = jnp.mean(Wim[..., sites], axis=0)
    shift = 0.5 if phs else 0.0
    e_re = jnp.sum(even * n_re.T + odd * (n_re.T - shift))
    e_im = jnp.sum(even * n_im.T + odd * n_im.T)
    norm = nc * est.Ltau
    return e_re / norm, e_im / norm


def measure_ssh_energy(
    est: GreensEstimator,
    elph: ElectronPhononParameters,
    tbp: TightBindingParameters,
    x: jnp.ndarray,
    ssh_id: int,
) -> Pair:
    """Single-spin SSH coupling energy of one coupling type
    (electron_phonon_measurements.jl:126-187)."""
    nc = elph.n_cells
    sl = slice(ssh_id * nc, (ssh_id + 1) * nc)
    hops = elph.ssh_to_hop[sl]
    s_i = jnp.asarray(tbp.neighbor_table[0, hops])
    s_f = jnp.asarray(tbp.neighbor_table[1, hops])
    p_i = elph.ssh_to_phonon[0, sl]
    p_f = elph.ssh_to_phonon[1, sl]
    dx = x[p_f, :] - x[p_i, :]  # (Nc, Ltau)
    c = (
        elph.ssh_alpha[sl][:, None] * dx
        + elph.ssh_alpha2[sl][:, None] * dx**2
        + elph.ssh_alpha3[sl][:, None] * dx**3
        + elph.ssh_alpha4[sl][:, None] * dx**4
    )
    GRr, GRi = est.GR[:, 0], est.GR[:, 1]
    Rcr, Rci = est.R[:, 0], -est.R[:, 1]
    hf_re = -jnp.mean(GRr[..., s_i] * Rcr[..., s_f] - GRi[..., s_i] * Rci[..., s_f], axis=0)
    hf_im = -jnp.mean(GRr[..., s_i] * Rci[..., s_f] + GRi[..., s_i] * Rcr[..., s_f], axis=0)
    hr_re = -jnp.mean(GRr[..., s_f] * Rcr[..., s_i] - GRi[..., s_f] * Rci[..., s_i], axis=0)
    hr_im = -jnp.mean(GRr[..., s_f] * Rci[..., s_i] + GRi[..., s_f] * Rcr[..., s_i], axis=0)
    # c hf + conj(c) hr (complex coupling constants carry c_im)
    e_re = jnp.sum(c * (hf_re.T + hr_re.T))
    e_im = jnp.sum(c * (hf_im.T + hr_im.T))
    if elph.ssh_alpha_im is not None:
        c_im = (
            elph.ssh_alpha_im[sl][:, None] * dx
            + elph.ssh_alpha2_im[sl][:, None] * dx**2
            + elph.ssh_alpha3_im[sl][:, None] * dx**3
            + elph.ssh_alpha4_im[sl][:, None] * dx**4
        )
        e_re = e_re + jnp.sum(c_im * (hr_im.T - hf_im.T))
        e_im = e_im + jnp.sum(c_im * (hf_re.T - hr_re.T))
    norm = nc * est.Ltau
    return e_re / norm, e_im / norm


def measure_dispersion_energy(
    elph: ElectronPhononParameters, x: jnp.ndarray, dispersion_id: int
) -> jnp.ndarray:
    """<(1/2) Mr Omega_d^2 (dx)^2 + Omega4_d (dx)^4> for one dispersive coupling type."""
    from ..ops.bosonic import _reduced_mass

    nc = elph.n_cells
    sl = slice(dispersion_id * nc, (dispersion_id + 1) * nc)
    mr = _reduced_mass(elph)[sl]
    dxp = x[elph.disp_to_phonon[1, sl], :] - x[elph.disp_to_phonon[0, sl], :]
    u = 0.5 * mr[:, None] * elph.disp_Omega[sl][:, None] ** 2 * dxp**2
    u = u + elph.disp_Omega4[sl][:, None] * dxp**4
    return jnp.mean(jnp.sum(u, axis=0) / nc)
