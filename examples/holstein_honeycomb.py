"""Honeycomb Holstein tutorial (TPU-native equivalent of
/root/reference/tutorials/holstein_honeycomb.jl).

Usage: python holstein_honeycomb.py <sID> <Omega> <alpha> <mu> <L> <beta>
                                    <N_therm> <N_measurements> <N_bins>
"""

from __future__ import annotations

import sys

from _common import holstein_honeycomb_model, holstein_honeycomb_spec

from smoqyelphqmc_tpu.driver import SimulationConfig, run_simulation
from smoqyelphqmc_tpu.io import SimulationInfo, compute_composite_correlation_ratio, save_simulation_info


def run(
    sID=1, Omega=1.0, alpha=1.5, mu=0.0, L=3, beta=4.0,
    N_therm=100, N_measurements=200, N_bins=10,
    dtau=0.05, Nt=24, Nrv=10, tol=1e-10, maxiter=10_000, seed=1, filepath=".",
):
    geo, tbm, em = holstein_honeycomb_model(L, Omega, alpha, mu)
    spec = holstein_honeycomb_spec(geo)
    sim_info = SimulationInfo(
        filepath=filepath,
        datafolder_prefix=f"holstein_honeycomb_w{Omega:.2f}_a{alpha:.2f}_mu{mu:.2f}_L{L}_b{beta:.2f}",
        sID=sID,
    )
    cfg = SimulationConfig(
        beta=beta, dtau=dtau, N_therm=N_therm, N_measurements=N_measurements,
        N_bins=N_bins, Nt=Nt, Nrv=Nrv, tol=tol, maxiter=maxiter, seed=seed,
    )
    metadata = run_simulation(sim_info, tbm, em, spec, cfg)

    # CDW correlation ratio at Q = 0 with its six honeycomb neighbors
    R, dR = compute_composite_correlation_ratio(
        sim_info.datafolder, "cdw", q_point=(0, 0),
        q_neighbors=[(1, 0), (0, 1), (1, 1), (L - 1, 0), (0, L - 1), (L - 1, L - 1)],
        spec=spec,
    )
    metadata["Rcdw_mean_real"] = float(R.real)
    metadata["Rcdw_mean_imag"] = float(R.imag)
    metadata["Rcdw_std"] = float(dR)
    save_simulation_info(sim_info, metadata)
    return metadata


if __name__ == "__main__":
    args = sys.argv[1:]
    run(
        sID=int(args[0]), Omega=float(args[1]), alpha=float(args[2]), mu=float(args[3]),
        L=int(args[4]), beta=float(args[5]), N_therm=int(args[6]),
        N_measurements=int(args[7]), N_bins=int(args[8]),
    )
