"""Electron-phonon model definition and lattice-expanded parameters.

Covers the capability surface of SmoQyDQMC's ElectronPhononModel /
ElectronPhononParameters as consumed by the reference (SURVEY.md section 2b):

- `PhononMode` (dispersionless Einstein mode with optional anharmonic X^4 term,
  optional Gaussian disorder of Omega, and optionally infinite mass = frozen field,
  see /root/reference/examples/bssh_chain.jl:164-175);
- `HolsteinCoupling` alpha X (n - 1/2 ph_sym) with polynomial terms alpha_k X^k
  (k = 1..4), /root/reference/tutorials/holstein_honeycomb.jl:241-248;
- `SSHCoupling` modulating a hopping by alpha_k (x_f - x_i)^k,
  /root/reference/examples/bssh_chain.jl:178-191;
- `DispersionCoupling` harmonic + quartic coupling between pairs of phonon modes.

Layout conventions: phonon modes and couplings are stored type-major,
index = type * n_cells + cell (cell flattened C-order), mirroring the reference's
`coupling = (type-1) * Nunitcells + uc` layout (/root/reference/src/holstein_shift_matrix.jl:25).
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import jax.numpy as jnp
import numpy as np

from ..lattice import Bond, ModelGeometry
from ..utils.pytree import register_pytree_dataclass, static_field
from .tight_binding import TightBindingModel, TightBindingParameters


@dataclasses.dataclass(frozen=True)
class PhononMode:
    """Dispersionless phonon mode living in every unit cell.

    M = inf defines a frozen (quenched) field: it contributes to couplings but is
    never updated (zero momentum / force masking downstream).
    """

    basis_vec: Tuple[float, ...]
    Omega_mean: float
    Omega_std: float = 0.0
    M: float = 1.0
    Omega4_mean: float = 0.0  # anharmonic (1/24?) convention: U_anh = Omega4 * X^4
    Omega4_std: float = 0.0

    def __init__(self, basis_vec, Omega_mean, Omega_std=0.0, M=1.0, Omega4_mean=0.0, Omega4_std=0.0):
        object.__setattr__(self, "basis_vec", tuple(float(x) for x in basis_vec))
        object.__setattr__(self, "Omega_mean", float(Omega_mean))
        object.__setattr__(self, "Omega_std", float(Omega_std))
        object.__setattr__(self, "M", float(M))
        object.__setattr__(self, "Omega4_mean", float(Omega4_mean))
        object.__setattr__(self, "Omega4_std", float(Omega4_std))


@dataclasses.dataclass(frozen=True)
class HolsteinCoupling:
    """Local coupling sum_k alpha_k X_p^k n_i between phonon p and density n_i.

    With `ph_sym_form=True` the odd-power terms couple to (n - 1/2) per spin
    (the particle-hole-symmetric parameterization alpha X (n - 1) summed over spin),
    implemented downstream via the Lambda shift matrix (PRE 105, 065302).
    The phonon of `phonon_id` in cell i couples to the density of `orbital_id` in
    cell i + displacement.
    """

    phonon_id: int
    orbital_id: int
    displacement: Tuple[int, ...]
    alpha_mean: float
    alpha_std: float = 0.0
    alpha2_mean: float = 0.0
    alpha2_std: float = 0.0
    alpha3_mean: float = 0.0
    alpha3_std: float = 0.0
    alpha4_mean: float = 0.0
    alpha4_std: float = 0.0
    ph_sym_form: bool = False

    def __init__(self, phonon_id, orbital_id, displacement, alpha_mean, alpha_std=0.0,
                 alpha2_mean=0.0, alpha2_std=0.0, alpha3_mean=0.0, alpha3_std=0.0,
                 alpha4_mean=0.0, alpha4_std=0.0, ph_sym_form=False):
        object.__setattr__(self, "phonon_id", int(phonon_id))
        object.__setattr__(self, "orbital_id", int(orbital_id))
        object.__setattr__(self, "displacement", tuple(int(d) for d in displacement))
        for name, val in [("alpha_mean", alpha_mean), ("alpha_std", alpha_std),
                          ("alpha2_mean", alpha2_mean), ("alpha2_std", alpha2_std),
                          ("alpha3_mean", alpha3_mean), ("alpha3_std", alpha3_std),
                          ("alpha4_mean", alpha4_mean), ("alpha4_std", alpha4_std)]:
            object.__setattr__(self, name, float(val))
        object.__setattr__(self, "ph_sym_form", bool(ph_sym_form))


@dataclasses.dataclass(frozen=True)
class SSHCoupling:
    """SSH coupling: hopping on `bond` is dressed t -> t - sum_k alpha_k (Dx)^k,
    Dx = x_{p_final} - x_{p_initial} for phonon_ids = (p_initial, p_final).

    Bond-SSH models use one frozen phonon (/root/reference/examples/bssh_chain.jl:178-191);
    optical SSH couples two live modes.
    """

    phonon_ids: Tuple[int, int]
    bond: Bond
    alpha_mean: complex
    alpha_std: float = 0.0
    alpha2_mean: complex = 0.0
    alpha2_std: float = 0.0
    alpha3_mean: complex = 0.0
    alpha3_std: float = 0.0
    alpha4_mean: complex = 0.0
    alpha4_std: float = 0.0

    def __init__(self, phonon_ids, bond, alpha_mean, alpha_std=0.0, alpha2_mean=0.0,
                 alpha2_std=0.0, alpha3_mean=0.0, alpha3_std=0.0, alpha4_mean=0.0, alpha4_std=0.0):
        object.__setattr__(self, "phonon_ids", (int(phonon_ids[0]), int(phonon_ids[1])))
        object.__setattr__(self, "bond", bond)
        for name, val in [("alpha_mean", alpha_mean), ("alpha_std", alpha_std),
                          ("alpha2_mean", alpha2_mean), ("alpha2_std", alpha2_std),
                          ("alpha3_mean", alpha3_mean), ("alpha3_std", alpha3_std),
                          ("alpha4_mean", alpha4_mean), ("alpha4_std", alpha4_std)]:
            object.__setattr__(self, name, complex(val) if "alpha" in name and "std" not in name else float(val))


@dataclasses.dataclass(frozen=True)
class DispersionCoupling:
    """Dispersive phonon coupling between phonon `phonon_ids[0]` in cell i and
    `phonon_ids[1]` in cell i + displacement:
    U = (1/2) Omega^2 Mr (x_f - x_i)^2 + Omega4 (x_f - x_i)^4 per time slice
    (Mr = reduced mass of the two modes), integrated with weight dtau.
    """

    phonon_ids: Tuple[int, int]
    displacement: Tuple[int, ...]
    Omega_mean: float
    Omega_std: float = 0.0
    Omega4_mean: float = 0.0
    Omega4_std: float = 0.0

    def __init__(self, phonon_ids, displacement, Omega_mean, Omega_std=0.0, Omega4_mean=0.0, Omega4_std=0.0):
        object.__setattr__(self, "phonon_ids", (int(phonon_ids[0]), int(phonon_ids[1])))
        object.__setattr__(self, "displacement", tuple(int(d) for d in displacement))
        object.__setattr__(self, "Omega_mean", float(Omega_mean))
        object.__setattr__(self, "Omega_std", float(Omega_std))
        object.__setattr__(self, "Omega4_mean", float(Omega4_mean))
        object.__setattr__(self, "Omega4_std", float(Omega4_std))


class ElectronPhononModel:
    """Registry of phonon modes and couplings (translationally invariant)."""

    def __init__(self, model_geometry: ModelGeometry, tight_binding_model: TightBindingModel):
        self.model_geometry = model_geometry
        self.tight_binding_model = tight_binding_model
        self.phonon_modes: List[PhononMode] = []
        self.holstein_couplings: List[HolsteinCoupling] = []
        self.ssh_couplings: List[SSHCoupling] = []
        self.dispersion_couplings: List[DispersionCoupling] = []

    def add_phonon_mode(self, phonon_mode: PhononMode) -> int:
        self.phonon_modes.append(phonon_mode)
        return len(self.phonon_modes) - 1

    def add_holstein_coupling(self, holstein_coupling: HolsteinCoupling) -> int:
        assert 0 <= holstein_coupling.phonon_id < len(self.phonon_modes)
        assert 0 <= holstein_coupling.orbital_id < self.model_geometry.n_orbitals
        self.holstein_couplings.append(holstein_coupling)
        return len(self.holstein_couplings) - 1

    def add_ssh_coupling(self, ssh_coupling: SSHCoupling) -> int:
        for p in ssh_coupling.phonon_ids:
            assert 0 <= p < len(self.phonon_modes)
        assert ssh_coupling.bond in self.tight_binding_model.t_bonds, (
            "SSH coupling must modulate a hopping bond present in the tight-binding model"
        )
        self.ssh_couplings.append(ssh_coupling)
        return len(self.ssh_couplings) - 1

    def add_dispersion_coupling(self, dispersion_coupling: DispersionCoupling) -> int:
        for p in dispersion_coupling.phonon_ids:
            assert 0 <= p < len(self.phonon_modes)
        self.dispersion_couplings.append(dispersion_coupling)
        return len(self.dispersion_couplings) - 1


@register_pytree_dataclass
class ElectronPhononParameters:
    """Lattice-expanded electron-phonon parameters + the phonon field state x.

    All couplings are expanded per unit cell, type-major (index = type*n_cells+cell).
    Leaves are device arrays; index tables / sizes are static metadata.
    """

    # phonon field configuration: (n_phonon, Ltau)
    x: jnp.ndarray
    # phonon modes
    Omega: jnp.ndarray  # (n_phonon,)
    Omega4: jnp.ndarray  # (n_phonon,)
    mass: jnp.ndarray  # (n_phonon,) may contain +inf for frozen modes
    # holstein couplings (n_holstein,)
    hol_alpha: jnp.ndarray
    hol_alpha2: jnp.ndarray
    hol_alpha3: jnp.ndarray
    hol_alpha4: jnp.ndarray
    # ssh couplings (n_ssh,); complex coupling constants carry their imaginary
    # parts in the *_im leaves (None for real models), mirroring the package-wide
    # (re, im) real-pair convention
    ssh_alpha: jnp.ndarray
    ssh_alpha2: jnp.ndarray
    ssh_alpha3: jnp.ndarray
    ssh_alpha4: jnp.ndarray
    ssh_alpha_im: "jnp.ndarray | None"
    ssh_alpha2_im: "jnp.ndarray | None"
    ssh_alpha3_im: "jnp.ndarray | None"
    ssh_alpha4_im: "jnp.ndarray | None"
    # dispersion couplings (n_dispersion,)
    disp_Omega: jnp.ndarray
    disp_Omega4: jnp.ndarray

    # static metadata
    beta: float = static_field()
    dtau: float = static_field()
    Ltau: int = static_field()
    n_cells: int = static_field()
    nphonon: int = static_field()  # phonon mode types per unit cell
    nholstein: int = static_field()
    nssh: int = static_field()
    ndispersion: int = static_field()
    hol_to_phonon: np.ndarray = static_field()  # (n_holstein,) int
    hol_to_site: np.ndarray = static_field()  # (n_holstein,) int
    hol_ph_sym: np.ndarray = static_field()  # (n_holstein,) bool
    ssh_to_phonon: np.ndarray = static_field()  # (2, n_ssh) int
    ssh_to_hop: np.ndarray = static_field()  # (n_ssh,) int index into tbp hop axis
    disp_to_phonon: np.ndarray = static_field()  # (2, n_dispersion) int
    frozen_mask: np.ndarray = static_field()  # (n_phonon,) bool, True = infinite mass

    @property
    def n_phonon(self) -> int:
        return self.nphonon * self.n_cells

    @property
    def n_holstein(self) -> int:
        return self.hol_to_phonon.shape[0]

    @property
    def n_ssh(self) -> int:
        return self.ssh_to_hop.shape[0]

    @property
    def n_dispersion(self) -> int:
        return self.disp_to_phonon.shape[1]


def _expand(mean: float | complex, std: float, n: int, rng: np.random.Generator, dtype=np.float64):
    vals = np.full(n, mean, dtype=dtype)
    if std > 0:
        vals = vals + std * rng.standard_normal(n)
    return vals


def initialize_electron_phonon_parameters(
    beta: float,
    dtau: float,
    electron_phonon_model: ElectronPhononModel,
    tight_binding_parameters: TightBindingParameters,
    rng: np.random.Generator | None = None,
    x_init: np.ndarray | None = None,
) -> ElectronPhononParameters:
    """Expand an ElectronPhononModel onto the lattice and sample the initial field."""
    if rng is None:
        rng = np.random.default_rng(0)
    geo = electron_phonon_model.model_geometry
    tbm = electron_phonon_model.tight_binding_model
    n_cells = geo.n_cells
    Ltau = int(round(beta / dtau))
    assert abs(Ltau * dtau - beta) < 1e-10, "beta must be an integer multiple of dtau"

    modes = electron_phonon_model.phonon_modes
    nphonon = len(modes)
    n_phonon = nphonon * n_cells
    Omega = np.concatenate([_expand(m.Omega_mean, m.Omega_std, n_cells, rng) for m in modes]) if modes else np.zeros(0)
    Omega4 = np.concatenate([_expand(m.Omega4_mean, m.Omega4_std, n_cells, rng) for m in modes]) if modes else np.zeros(0)
    mass = np.concatenate([np.full(n_cells, m.M) for m in modes]) if modes else np.zeros(0)
    frozen_mask = ~np.isfinite(mass)

    # ---- holstein couplings: coupling index c = type * n_cells + cell ----
    hols = electron_phonon_model.holstein_couplings
    nholstein = len(hols)
    hol_alpha, hol_alpha2, hol_alpha3, hol_alpha4 = [], [], [], []
    hol_to_phonon, hol_to_site, hol_ph_sym = [], [], []
    from ..lattice import cell_linear_indices

    cells = cell_linear_indices(geo.L)  # (n_cells, D)
    Lvec = np.asarray(geo.L, dtype=np.int64)
    for hc in hols:
        # open boundaries: couplings reaching through a non-periodic edge vanish
        keep = ~geo.displacement_wrap_mask(hc.displacement)
        hol_alpha.append(_expand(hc.alpha_mean, hc.alpha_std, n_cells, rng) * keep)
        hol_alpha2.append(_expand(hc.alpha2_mean, hc.alpha2_std, n_cells, rng) * keep)
        hol_alpha3.append(_expand(hc.alpha3_mean, hc.alpha3_std, n_cells, rng) * keep)
        hol_alpha4.append(_expand(hc.alpha4_mean, hc.alpha4_std, n_cells, rng) * keep)
        cell_lin = np.arange(n_cells)
        hol_to_phonon.append(hc.phonon_id * n_cells + cell_lin)
        disp = np.asarray(hc.displacement, dtype=np.int64)
        tgt = (cells + disp[None, :]) % Lvec[None, :]
        tgt_lin = np.ravel_multi_index(tgt.T, geo.L)
        hol_to_site.append(tgt_lin * geo.n_orbitals + hc.orbital_id)
        hol_ph_sym.append(np.full(n_cells, hc.ph_sym_form, dtype=bool))

    def _cat(lst, dtype=np.float64):
        return np.concatenate(lst).astype(dtype) if lst else np.zeros(0, dtype=dtype)

    # ---- ssh couplings ----
    sshs = electron_phonon_model.ssh_couplings
    nssh = len(sshs)
    ssh_alpha, ssh_alpha2, ssh_alpha3, ssh_alpha4 = [], [], [], []
    ssh_to_phonon_i, ssh_to_phonon_f, ssh_to_hop = [], [], []
    any_complex_ssh = any(
        complex(v).imag != 0
        for sc in sshs
        for v in (sc.alpha_mean, sc.alpha2_mean, sc.alpha3_mean, sc.alpha4_mean)
    )
    # complex coupling constants (e.g. flux-threaded SSH models): expand in
    # complex128, split into (re, im) leaves below; disorder noise perturbs the
    # real part
    ssh_dtype = np.complex128 if any_complex_ssh else np.float64
    for sc in sshs:
        bond_type = tbm.t_bonds.index(sc.bond)
        start, stop = tight_binding_parameters.bond_slices[bond_type]
        assert stop - start == n_cells
        cell_lin = np.arange(n_cells)
        ssh_to_hop.append(start + cell_lin)
        # phonon p_initial lives on the initial-orbital cell (cell i), p_final on
        # the final-orbital cell (cell i + bond displacement)
        p_i, p_f = sc.phonon_ids
        disp = np.asarray(sc.bond.displacement, dtype=np.int64)
        tgt = (cells + disp[None, :]) % Lvec[None, :]
        tgt_lin = np.ravel_multi_index(tgt.T, geo.L)
        ssh_to_phonon_i.append(p_i * n_cells + cell_lin)
        ssh_to_phonon_f.append(p_f * n_cells + tgt_lin)
        a_mean_raw = [sc.alpha_mean, sc.alpha2_mean, sc.alpha3_mean, sc.alpha4_mean]
        if ssh_dtype == np.float64:
            a_mean_raw = [complex(v).real for v in a_mean_raw]
        a_mean = np.asarray(a_mean_raw, dtype=ssh_dtype)
        a_std = np.asarray([sc.alpha_std, sc.alpha2_std, sc.alpha3_std, sc.alpha4_std])
        # open boundaries: no coupling on a zero-amplitude wrapped hop
        keep = ~geo.bond_wrap_mask(sc.bond)
        ssh_alpha.append(_expand(a_mean[0], a_std[0], n_cells, rng, ssh_dtype) * keep)
        ssh_alpha2.append(_expand(a_mean[1], a_std[1], n_cells, rng, ssh_dtype) * keep)
        ssh_alpha3.append(_expand(a_mean[2], a_std[2], n_cells, rng, ssh_dtype) * keep)
        ssh_alpha4.append(_expand(a_mean[3], a_std[3], n_cells, rng, ssh_dtype) * keep)

    # ---- dispersion couplings ----
    disps = electron_phonon_model.dispersion_couplings
    ndispersion = len(disps)
    disp_Omega, disp_Omega4, disp_to_phonon_i, disp_to_phonon_f = [], [], [], []
    for dc in disps:
        keep = ~geo.displacement_wrap_mask(dc.displacement)
        disp_Omega.append(_expand(dc.Omega_mean, dc.Omega_std, n_cells, rng) * keep)
        disp_Omega4.append(_expand(dc.Omega4_mean, dc.Omega4_std, n_cells, rng) * keep)
        p_i, p_f = dc.phonon_ids
        cell_lin = np.arange(n_cells)
        disp = np.asarray(dc.displacement, dtype=np.int64)
        tgt = (cells + disp[None, :]) % Lvec[None, :]
        tgt_lin = np.ravel_multi_index(tgt.T, geo.L)
        disp_to_phonon_i.append(p_i * n_cells + cell_lin)
        disp_to_phonon_f.append(p_f * n_cells + tgt_lin)

    # ---- initial phonon field: quantum-oscillator ground-state width ----
    if x_init is None:
        x_init = np.zeros((n_phonon, Ltau))
        if n_phonon:
            finite = np.isfinite(mass) & (Omega > 0)
            sigma = np.zeros(n_phonon)
            sigma[finite] = 1.0 / np.sqrt(2.0 * mass[finite] * Omega[finite])
            x_init = sigma[:, None] * rng.standard_normal((n_phonon, Ltau))

    return ElectronPhononParameters(
        x=jnp.asarray(x_init),
        Omega=jnp.asarray(Omega),
        Omega4=jnp.asarray(Omega4),
        mass=jnp.asarray(mass),
        hol_alpha=jnp.asarray(_cat(hol_alpha)),
        hol_alpha2=jnp.asarray(_cat(hol_alpha2)),
        hol_alpha3=jnp.asarray(_cat(hol_alpha3)),
        hol_alpha4=jnp.asarray(_cat(hol_alpha4)),
        ssh_alpha=jnp.asarray(_cat(ssh_alpha, ssh_dtype).real.copy()),
        ssh_alpha2=jnp.asarray(_cat(ssh_alpha2, ssh_dtype).real.copy()),
        ssh_alpha3=jnp.asarray(_cat(ssh_alpha3, ssh_dtype).real.copy()),
        ssh_alpha4=jnp.asarray(_cat(ssh_alpha4, ssh_dtype).real.copy()),
        ssh_alpha_im=jnp.asarray(_cat(ssh_alpha, ssh_dtype).imag.copy()) if any_complex_ssh else None,
        ssh_alpha2_im=jnp.asarray(_cat(ssh_alpha2, ssh_dtype).imag.copy()) if any_complex_ssh else None,
        ssh_alpha3_im=jnp.asarray(_cat(ssh_alpha3, ssh_dtype).imag.copy()) if any_complex_ssh else None,
        ssh_alpha4_im=jnp.asarray(_cat(ssh_alpha4, ssh_dtype).imag.copy()) if any_complex_ssh else None,
        disp_Omega=jnp.asarray(_cat(disp_Omega)),
        disp_Omega4=jnp.asarray(_cat(disp_Omega4)),
        beta=float(beta),
        dtau=float(dtau),
        Ltau=Ltau,
        n_cells=n_cells,
        nphonon=nphonon,
        nholstein=nholstein,
        nssh=nssh,
        ndispersion=ndispersion,
        hol_to_phonon=_cat(hol_to_phonon, np.int32),
        hol_to_site=_cat(hol_to_site, np.int32),
        hol_ph_sym=_cat(hol_ph_sym, bool),
        ssh_to_phonon=np.stack([_cat(ssh_to_phonon_i, np.int32), _cat(ssh_to_phonon_f, np.int32)], axis=0)
        if nssh
        else np.zeros((2, 0), np.int32),
        ssh_to_hop=_cat(ssh_to_hop, np.int32),
        disp_to_phonon=np.stack([_cat(disp_to_phonon_i, np.int32), _cat(disp_to_phonon_f, np.int32)], axis=0)
        if ndispersion
        else np.zeros((2, 0), np.int32),
        frozen_mask=frozen_mask,
    )


ElectronPhononParameters.from_model = staticmethod(initialize_electron_phonon_parameters)
