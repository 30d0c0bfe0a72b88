"""Tight-binding model definition and lattice-expanded parameters.

Covers the capability surface of SmoQyDQMC's TightBindingModel/TightBindingParameters
as consumed by the reference (SURVEY.md section 2b; call sites
/root/reference/tutorials/holstein_honeycomb.jl:194-200,298-302 and
/root/reference/src/Measurements/tight_binding_measurements.jl:108-116):
per-bond hopping amplitudes with optional Gaussian disorder, per-orbital on-site
energies with optional disorder, and a (tunable) chemical potential.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..lattice import Bond, ModelGeometry
from ..utils.pytree import register_pytree_dataclass, static_field


@dataclasses.dataclass(frozen=True)
class TightBindingModel:
    """Translationally-invariant tight-binding model definition.

    Attributes:
      t_bonds: bond definitions carrying the hoppings.
      t_mean/t_std: mean and disorder std-dev of each hopping amplitude.
      eps_mean/eps_std: mean / disorder of the on-site energy per orbital.
      mu: chemical potential.
    """

    model_geometry: ModelGeometry
    t_bonds: Tuple[Bond, ...]
    t_mean: Tuple[complex, ...]
    eps_mean: Tuple[float, ...]
    mu: float = 0.0
    t_std: Tuple[float, ...] | None = None
    eps_std: Tuple[float, ...] | None = None

    def __init__(
        self,
        model_geometry: ModelGeometry,
        t_bonds: Sequence[Bond],
        t_mean: Sequence[complex],
        eps_mean: Sequence[float],
        mu: float = 0.0,
        t_std: Sequence[float] | None = None,
        eps_std: Sequence[float] | None = None,
    ):
        object.__setattr__(self, "model_geometry", model_geometry)
        object.__setattr__(self, "t_bonds", tuple(t_bonds))
        object.__setattr__(self, "t_mean", tuple(t_mean))
        object.__setattr__(self, "eps_mean", tuple(float(e) for e in eps_mean))
        object.__setattr__(self, "mu", float(mu))
        object.__setattr__(self, "t_std", None if t_std is None else tuple(float(s) for s in t_std))
        object.__setattr__(self, "eps_std", None if eps_std is None else tuple(float(s) for s in eps_std))
        assert len(self.t_bonds) == len(self.t_mean)
        assert len(self.eps_mean) == model_geometry.n_orbitals
        # register the hopping bonds with the geometry so they get bond ids
        bond_ids = tuple(model_geometry.add_bond(b) for b in self.t_bonds)
        object.__setattr__(self, "bond_ids", bond_ids)

    bond_ids: Tuple[int, ...] = dataclasses.field(init=False, default=())


@register_pytree_dataclass
class TightBindingParameters:
    """Lattice-expanded tight-binding parameters (device arrays).

    Hoppings are stored bond-type-major: hop index h = bond_type * n_cells + cell,
    with `neighbor_table` of shape (2, n_hops) (static metadata) and complex
    amplitudes `t0` (n_hops,). `bond_slices[b] = (start, stop)` selects the hops of
    bond type b, mirroring the reference's bond_slices.
    """

    t0: jnp.ndarray  # (n_hops,) static hopping amplitudes (before e-ph dressing)
    t0_im: "jnp.ndarray | None"  # imaginary parts for complex hoppings (None = real)
    eps: jnp.ndarray  # (n_sites,) on-site energies
    mu: jnp.ndarray  # scalar chemical potential (dynamic: mu tuning updates it)
    neighbor_table: np.ndarray = static_field()  # (2, n_hops) int32
    bond_ids: Tuple[int, ...] = static_field()
    bond_slices: Tuple[Tuple[int, int], ...] = static_field()
    n_sites: int = static_field()
    n_orbitals: int = static_field()

    @property
    def n_hops(self) -> int:
        return self.neighbor_table.shape[1]

    @property
    def n_bond_types(self) -> int:
        return len(self.bond_ids)


def initialize_tight_binding_parameters(
    tight_binding_model: TightBindingModel,
    rng: np.random.Generator | None = None,
) -> TightBindingParameters:
    """Expand a TightBindingModel onto the finite lattice, sampling disorder."""
    geo = tight_binding_model.model_geometry
    if rng is None:
        rng = np.random.default_rng(0)

    n_cells = geo.n_cells
    tables: List[np.ndarray] = []
    t_vals: List[np.ndarray] = []
    bond_slices: List[Tuple[int, int]] = []
    start = 0
    any_complex = any(
        np.iscomplexobj(np.asarray(t)) and np.imag(t) != 0 for t in tight_binding_model.t_mean
    )
    t_dtype = np.complex128 if any_complex else np.float64
    for b, bond in enumerate(tight_binding_model.t_bonds):
        tables.append(geo.build_neighbor_table(bond))
        tm = np.full(n_cells, tight_binding_model.t_mean[b], dtype=t_dtype)
        if tight_binding_model.t_std is not None and tight_binding_model.t_std[b] > 0:
            tm = tm + tight_binding_model.t_std[b] * rng.standard_normal(n_cells)
        # open boundaries: hops leaving through a non-periodic edge carry zero
        # amplitude (static shapes preserved; the hop becomes an identity factor)
        tm[geo.bond_wrap_mask(bond)] = 0.0
        t_vals.append(tm)
        bond_slices.append((start, start + n_cells))
        start += n_cells

    neighbor_table = (
        np.concatenate(tables, axis=1) if tables else np.zeros((2, 0), dtype=np.int32)
    )
    t0 = np.concatenate(t_vals) if t_vals else np.zeros(0, dtype=t_dtype)
    t0_im = None
    if any_complex:
        t0_im = np.imag(t0)
        t0 = np.real(t0)

    eps = np.empty(geo.n_sites, dtype=np.float64)
    eps_mean = np.asarray(tight_binding_model.eps_mean)
    for orb in range(geo.n_orbitals):
        vals = np.full(n_cells, eps_mean[orb])
        if tight_binding_model.eps_std is not None and tight_binding_model.eps_std[orb] > 0:
            vals = vals + tight_binding_model.eps_std[orb] * rng.standard_normal(n_cells)
        eps[orb :: geo.n_orbitals] = vals

    return TightBindingParameters(
        t0=jnp.asarray(t0),
        t0_im=None if t0_im is None else jnp.asarray(t0_im),
        eps=jnp.asarray(eps),
        mu=jnp.asarray(tight_binding_model.mu, dtype=jnp.float64),
        neighbor_table=neighbor_table,
        bond_ids=tuple(tight_binding_model.bond_ids),
        bond_slices=tuple(bond_slices),
        n_sites=geo.n_sites,
        n_orbitals=geo.n_orbitals,
    )


# Constructor-style alias mirroring the reference's TightBindingParameters(...)
TightBindingParameters.from_model = staticmethod(initialize_tight_binding_parameters)
