"""Shared helpers for the example/tutorial scripts (mirrors the model-building
sections of the reference tutorials and examples)."""

from __future__ import annotations

import os
import sys

import numpy as np

# allow running the examples directly from a source checkout
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from smoqyelphqmc_tpu import (
    Bond,
    ElectronPhononModel,
    HolsteinCoupling,
    Lattice,
    ModelGeometry,
    PhononMode,
    SSHCoupling,
    TightBindingModel,
    UnitCell,
)
from smoqyelphqmc_tpu.measure.container import MeasurementSpec


def holstein_honeycomb_model(L, Omega, alpha, mu, t=1.0):
    """Honeycomb Holstein model (tutorials/holstein_honeycomb.jl:139-272)."""
    uc = UnitCell(
        lattice_vecs=[[1.5, np.sqrt(3) / 2], [1.5, -np.sqrt(3) / 2]],
        basis_vecs=[[0.0, 0.0], [1.0, 0.0]],
    )
    lat = Lattice(L=[L, L], periodic=[True, True])
    geo = ModelGeometry(uc, lat)
    bonds = [
        Bond(orbitals=(0, 1), displacement=[0, 0]),
        Bond(orbitals=(0, 1), displacement=[-1, 0]),
        Bond(orbitals=(0, 1), displacement=[0, -1]),
    ]
    for b in bonds:
        geo.add_bond(b)
    tbm = TightBindingModel(geo, bonds, [t, t, t], [0.0, 0.0], mu=mu)
    em = ElectronPhononModel(geo, tbm)
    p1 = em.add_phonon_mode(PhononMode([0.0, 0.0], Omega))
    p2 = em.add_phonon_mode(PhononMode([1.0, 0.0], Omega))
    em.add_holstein_coupling(HolsteinCoupling(p1, 0, [0, 0], alpha, ph_sym_form=True))
    em.add_holstein_coupling(HolsteinCoupling(p2, 1, [0, 0], alpha, ph_sym_form=True))
    return geo, tbm, em


def holstein_honeycomb_spec(geo) -> MeasurementSpec:
    """Measurement set of the holstein honeycomb tutorial
    (tutorials/holstein_honeycomb.jl:318-430)."""
    spec = MeasurementSpec(geometry=geo)
    spec.add_correlation("greens", [(0, 0), (1, 1), (0, 1)], time_displaced=True)
    spec.add_correlation("phonon_greens", [(0, 0), (1, 1), (0, 1)], time_displaced=True)
    spec.add_correlation("density", [(0, 0), (1, 1)], integrated=True)
    spec.add_correlation("pair", [(0, 0), (1, 1)], integrated=True)
    spec.add_correlation("spin_z", [(0, 0), (1, 1)], integrated=True)
    spec.add_composite_correlation(
        "tr_greens", "greens", id_pairs=[(0, 0), (1, 1)], coefficients=[1.0, 1.0],
        time_displaced=True,
    )
    spec.add_composite_correlation(
        "cdw", "density", ids=[0, 1], coefficients=[1.0, -1.0],
        displacement_vecs=[[0.0, 0.0], [0.0, 0.0]], integrated=True,
    )
    return spec


def chain_geometry(L):
    uc = UnitCell(lattice_vecs=[[1.0]], basis_vecs=[[0.0]])
    lat = Lattice(L=[L], periodic=[True])
    geo = ModelGeometry(uc, lat)
    bond = Bond(orbitals=(0, 0), displacement=[1])
    geo.add_bond(bond)
    return geo, bond


def square_geometry(L):
    uc = UnitCell(lattice_vecs=[[1.0, 0.0], [0.0, 1.0]], basis_vecs=[[0.0, 0.0]])
    lat = Lattice(L=[L, L], periodic=[True, True])
    geo = ModelGeometry(uc, lat)
    bx = Bond(orbitals=(0, 0), displacement=[1, 0])
    by = Bond(orbitals=(0, 0), displacement=[0, 1])
    geo.add_bond(bx)
    geo.add_bond(by)
    return geo, (bx, by)


def bssh_chain_model(L, Omega, alpha, mu, t=1.0):
    """Bond-SSH chain: live phonon on each bond + frozen reference mode, so the
    effective hopping is t - alpha X (examples/bssh_chain.jl:120-199)."""
    geo, bond = chain_geometry(L)
    tbm = TightBindingModel(geo, [bond], [t], [0.0], mu=mu)
    em = ElectronPhononModel(geo, tbm)
    live = em.add_phonon_mode(PhononMode([0.5], Omega))
    frozen = em.add_phonon_mode(PhononMode([0.0], Omega, M=np.inf))
    em.add_ssh_coupling(SSHCoupling(phonon_ids=(frozen, live), bond=bond, alpha_mean=alpha))
    return geo, tbm, em


def bssh_square_model(L, Omega, alpha, mu, t=1.0):
    """Bond-SSH square lattice: x / y bond phonons + one frozen mode
    (examples/bssh_square.jl:160-240)."""
    geo, (bx, by) = square_geometry(L)
    tbm = TightBindingModel(geo, [bx, by], [t, t], [0.0], mu=mu)
    em = ElectronPhononModel(geo, tbm)
    px = em.add_phonon_mode(PhononMode([0.5, 0.0], Omega))
    py = em.add_phonon_mode(PhononMode([0.0, 0.5], Omega))
    frozen = em.add_phonon_mode(PhononMode([0.0, 0.0], Omega, M=np.inf))
    em.add_ssh_coupling(SSHCoupling(phonon_ids=(frozen, px), bond=bx, alpha_mean=alpha))
    em.add_ssh_coupling(SSHCoupling(phonon_ids=(frozen, py), bond=by, alpha_mean=alpha))
    return geo, tbm, em


def ossh_chain_model(L, Omega, alpha, mu, t=1.0):
    """Optical-SSH chain: phonon on each site modulates the bond it starts
    (examples/ossh_chain.jl:140-180): coupling ~ alpha (X_{i+1} - X_i)."""
    geo, bond = chain_geometry(L)
    tbm = TightBindingModel(geo, [bond], [t], [0.0], mu=mu)
    em = ElectronPhononModel(geo, tbm)
    p = em.add_phonon_mode(PhononMode([0.0], Omega))
    em.add_ssh_coupling(SSHCoupling(phonon_ids=(p, p), bond=bond, alpha_mean=alpha))
    return geo, tbm, em


def ossh_square_model(L, Omega, alpha, mu, t=1.0):
    """Optical-SSH square lattice: x- and y-vibration modes per site
    (examples/ossh_square.jl:165-240)."""
    geo, (bx, by) = square_geometry(L)
    tbm = TightBindingModel(geo, [bx, by], [t, t], [0.0], mu=mu)
    em = ElectronPhononModel(geo, tbm)
    px = em.add_phonon_mode(PhononMode([0.0, 0.0], Omega))
    py = em.add_phonon_mode(PhononMode([0.0, 0.0], Omega))
    em.add_ssh_coupling(SSHCoupling(phonon_ids=(px, px), bond=bx, alpha_mean=alpha))
    em.add_ssh_coupling(SSHCoupling(phonon_ids=(py, py), bond=by, alpha_mean=alpha))
    return geo, tbm, em


def ossh_honeycomb_model(L, Omega, alpha, mu, t=1.0):
    """Optical-SSH honeycomb: x/y vibration modes on both sublattices, couplings
    along the three nearest-neighbor bonds (examples/ossh_honeycomb.jl:150-260)."""
    uc = UnitCell(
        lattice_vecs=[[1.5, np.sqrt(3) / 2], [1.5, -np.sqrt(3) / 2]],
        basis_vecs=[[0.0, 0.0], [1.0, 0.0]],
    )
    lat = Lattice(L=[L, L], periodic=[True, True])
    geo = ModelGeometry(uc, lat)
    bonds = [
        Bond(orbitals=(0, 1), displacement=[0, 0]),
        Bond(orbitals=(0, 1), displacement=[-1, 0]),
        Bond(orbitals=(0, 1), displacement=[0, -1]),
    ]
    for b in bonds:
        geo.add_bond(b)
    tbm = TightBindingModel(geo, bonds, [t, t, t], [0.0, 0.0], mu=mu)
    em = ElectronPhononModel(geo, tbm)
    pAx = em.add_phonon_mode(PhononMode([0.0, 0.0], Omega))
    pBx = em.add_phonon_mode(PhononMode([1.0, 0.0], Omega))
    for b in bonds:
        em.add_ssh_coupling(SSHCoupling(phonon_ids=(pAx, pBx), bond=b, alpha_mean=alpha))
    return geo, tbm, em


def basic_spec(geo, bond_ids=()) -> MeasurementSpec:
    """Measurement set of the SSH examples: greens, phonon greens, density, pair,
    spin, bond + current correlations on the hopping bonds."""
    spec = MeasurementSpec(geometry=geo)
    orb_pairs = [(a, b) for a in range(geo.n_orbitals) for b in range(geo.n_orbitals)]
    diag_pairs = [(a, a) for a in range(geo.n_orbitals)]
    spec.add_correlation("greens", orb_pairs, time_displaced=True)
    spec.add_correlation("phonon_greens", [(0, 0)], time_displaced=True)
    spec.add_correlation("density", diag_pairs, integrated=True)
    spec.add_correlation("pair", diag_pairs, integrated=True)
    spec.add_correlation("spin_z", diag_pairs, integrated=True)
    for bid in bond_ids:
        spec.add_correlation("bond", [(bid, bid)], integrated=True)
        spec.add_correlation("current", [(bid, bid)], integrated=True)
    return spec
