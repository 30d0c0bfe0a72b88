"""Holstein chain threaded by a magnetic flux (complex hopping t e^{i phi/L}).

Goes beyond the reference's example set: complex hopping amplitudes exercise the
Hermitian channel-mixing checkerboard blocks and the doubled-basis spectral
preconditioner (tests/test_complex_hoppings.py validates the machinery against
dense oracles)."""

from __future__ import annotations

import sys

import numpy as np

from smoqyelphqmc_tpu import (
    Bond,
    ElectronPhononModel,
    HolsteinCoupling,
    Lattice,
    ModelGeometry,
    PhononMode,
    TightBindingModel,
)
from smoqyelphqmc_tpu import UnitCell
from smoqyelphqmc_tpu.driver import SimulationConfig, run_simulation
from smoqyelphqmc_tpu.io import SimulationInfo
from smoqyelphqmc_tpu.measure.container import MeasurementSpec


def run(
    sID=1, Omega=1.0, alpha=0.8, flux=0.5, mu=0.0, L=8, beta=4.0,
    N_therm=100, N_measurements=200, N_bins=10,
    dtau=0.05, Nt=24, Nrv=10, tol=1e-10, seed=1, filepath=".",
):
    uc = UnitCell(lattice_vecs=[[1.0]], basis_vecs=[[0.0]])
    geo = ModelGeometry(uc, Lattice(L=[L]))
    bond = Bond(orbitals=(0, 0), displacement=[1])
    geo.add_bond(bond)
    phase = 2.0 * np.pi * flux / L  # Peierls phase per bond
    tbm = TightBindingModel(geo, [bond], [np.exp(1j * phase)], [0.0], mu=mu)
    em = ElectronPhononModel(geo, tbm)
    p = em.add_phonon_mode(PhononMode([0.0], Omega))
    em.add_holstein_coupling(HolsteinCoupling(p, 0, [0], alpha, ph_sym_form=True))

    spec = MeasurementSpec(geometry=geo)
    spec.add_correlation("greens", [(0, 0)], time_displaced=True)
    spec.add_correlation("phonon_greens", [(0, 0)], time_displaced=True)
    spec.add_correlation("density", [(0, 0)], integrated=True)
    spec.add_correlation("current", [(tbm.bond_ids[0], tbm.bond_ids[0])], integrated=True)

    sim_info = SimulationInfo(
        filepath=filepath,
        datafolder_prefix=f"holstein_flux_chain_f{flux:.2f}_a{alpha:.2f}_L{L}_b{beta:.2f}",
        sID=sID,
    )
    cfg = SimulationConfig(
        beta=beta, dtau=dtau, N_therm=N_therm, N_measurements=N_measurements,
        N_bins=N_bins, Nt=Nt, Nrv=Nrv, tol=tol, seed=seed,
    )
    return run_simulation(sim_info, tbm, em, spec, cfg)


if __name__ == "__main__":
    a = sys.argv[1:]
    run(sID=int(a[0]), Omega=float(a[1]), alpha=float(a[2]), flux=float(a[3]),
        mu=float(a[4]), L=int(a[5]), beta=float(a[6]),
        N_therm=int(a[7]), N_measurements=int(a[8]), N_bins=int(a[9]))
