"""Shared tiny model builders for tests."""

import numpy as np

from smoqyelphqmc_tpu import (
    Bond,
    ElectronPhononModel,
    ElectronPhononParameters,
    HolsteinCoupling,
    Lattice,
    ModelGeometry,
    PhononMode,
    SSHCoupling,
    TightBindingModel,
    TightBindingParameters,
    UnitCell,
)


def chain_model(L=4, t=1.0, mu=0.1, Omega=1.0, alpha=0.5, beta=1.0, dtau=0.1, ssh=False, seed=0):
    """1D chain with a Holstein (or SSH) coupling."""
    uc = UnitCell(lattice_vecs=[[1.0]], basis_vecs=[[0.0]])
    lat = Lattice(L=[L], periodic=[True])
    geo = ModelGeometry(uc, lat)
    bond = Bond(orbitals=(0, 0), displacement=[1])
    geo.add_bond(bond)
    tbm = TightBindingModel(model_geometry=geo, t_bonds=[bond], t_mean=[t], eps_mean=[0.0], mu=mu)
    elph_model = ElectronPhononModel(model_geometry=geo, tight_binding_model=tbm)
    ph = PhononMode(basis_vec=[0.0], Omega_mean=Omega)
    pid = elph_model.add_phonon_mode(ph)
    if ssh:
        elph_model.add_ssh_coupling(SSHCoupling(phonon_ids=(pid, pid), bond=bond, alpha_mean=alpha))
    else:
        elph_model.add_holstein_coupling(
            HolsteinCoupling(phonon_id=pid, orbital_id=0, displacement=[0], alpha_mean=alpha, ph_sym_form=True)
        )
    rng = np.random.default_rng(seed)
    tbp = TightBindingParameters.from_model(tbm, rng)
    elph = ElectronPhononParameters.from_model(beta, dtau, elph_model, tbp, rng)
    return geo, tbm, tbp, elph_model, elph


def honeycomb_model(L=2, t=1.0, mu=0.0, Omega=1.0, alpha=0.5, beta=1.0, dtau=0.1, seed=0, ph_sym=True):
    """Honeycomb Holstein model mirroring /root/reference/tutorials/holstein_honeycomb.jl."""
    a1 = [1.5, np.sqrt(3) / 2]
    a2 = [1.5, -np.sqrt(3) / 2]
    uc = UnitCell(lattice_vecs=[a1, a2], basis_vecs=[[0.0, 0.0], [1.0, 0.0]])
    lat = Lattice(L=[L, L], periodic=[True, True])
    geo = ModelGeometry(uc, lat)
    bonds = [
        Bond(orbitals=(0, 1), displacement=[0, 0]),
        Bond(orbitals=(0, 1), displacement=[-1, 0]),
        Bond(orbitals=(0, 1), displacement=[0, -1]),
    ]
    for b in bonds:
        geo.add_bond(b)
    tbm = TightBindingModel(model_geometry=geo, t_bonds=bonds, t_mean=[t, t, t], eps_mean=[0.0, 0.0], mu=mu)
    elph_model = ElectronPhononModel(model_geometry=geo, tight_binding_model=tbm)
    p1 = elph_model.add_phonon_mode(PhononMode(basis_vec=[0.0, 0.0], Omega_mean=Omega))
    p2 = elph_model.add_phonon_mode(PhononMode(basis_vec=[1.0, 0.0], Omega_mean=Omega))
    elph_model.add_holstein_coupling(
        HolsteinCoupling(phonon_id=p1, orbital_id=0, displacement=[0, 0], alpha_mean=alpha, ph_sym_form=ph_sym)
    )
    elph_model.add_holstein_coupling(
        HolsteinCoupling(phonon_id=p2, orbital_id=1, displacement=[0, 0], alpha_mean=alpha, ph_sym_form=ph_sym)
    )
    rng = np.random.default_rng(seed)
    tbp = TightBindingParameters.from_model(tbm, rng)
    elph = ElectronPhononParameters.from_model(beta, dtau, elph_model, tbp, rng)
    return geo, tbm, tbp, elph_model, elph
