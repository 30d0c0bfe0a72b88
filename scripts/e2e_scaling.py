"""Whole-simulation large-N scaling: the ACTUAL driver, measured end-to-end.

The round-3 large-N table was built from estimated sweep costs on isolated
solves and excluded the measurement pass; the reference's headline is
near-linear scaling of the full QMC simulation (/root/reference/README.md:9-11).
This script runs `run_simulation` itself — thermalization + measured sweeps +
bins written to disk — for Holstein honeycomb at beta = 12 (Ltau = 240) and
L in {12, 24, 36, 48} (N = 288 .. 4608), ONCE per size, and reads the driver's
own phase wall-clock instrumentation from the returned metadata: the first
sweep of each phase carries the trace+compile cost, so

    update sweep cost   = (t_therm - t_first_therm) / (n_therm - 1)
    measured sweep cost = (t_measure - t_first_measured) / (n_measure - 1)

are post-compile whole-driver costs INCLUDING the measurement pass (estimator
refresh + contraction engine + bin accumulation).

Run: python scripts/e2e_scaling.py [--sizes 12,24,36,48] [--therm 3]
     [--meas 5] [--nrv 6] [--out /tmp/e2e_scaling]
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "examples")


def main():
    sizes = [12, 24, 36, 48]
    n_therm, n_meas, nrv, k_disp = 3, 5, 6, 1
    out_dir = "/tmp/e2e_scaling"
    for i, a in enumerate(sys.argv):
        if a == "--sizes":
            sizes = [int(s) for s in sys.argv[i + 1].split(",")]
        if a == "--therm":
            n_therm = int(sys.argv[i + 1])
        if a == "--meas":
            n_meas = int(sys.argv[i + 1])
        if a == "--nrv":
            nrv = int(sys.argv[i + 1])
        if a == "--k":
            k_disp = int(sys.argv[i + 1])
        if a == "--out":
            out_dir = sys.argv[i + 1]
    assert n_therm > k_disp and n_meas > k_disp, (
        "need more sweeps than the first (compile-carrying) batch per phase"
    )

    from _common import holstein_honeycomb_model, holstein_honeycomb_spec

    from smoqyelphqmc_tpu.driver import SimulationConfig, run_simulation
    from smoqyelphqmc_tpu.io import SimulationInfo

    os.makedirs(out_dir, exist_ok=True)
    results = []
    for L in sizes:
        N = 2 * L * L
        geo, tbm, em = holstein_honeycomb_model(L, 1.0, 1.5, 0.0)
        spec = holstein_honeycomb_spec(geo)
        folder = os.path.join(out_dir, f"L{L}")
        shutil.rmtree(folder, ignore_errors=True)
        os.makedirs(folder, exist_ok=True)
        sim_info = SimulationInfo(filepath=folder, datafolder_prefix=f"hh_L{L}", sID=1)
        cfg = SimulationConfig(
            beta=12.0, dtau=0.05, N_therm=n_therm, N_measurements=n_meas,
            N_bins=2, Nt=24, Nrv=nrv, tol=1e-10, maxiter=10_000, seed=1,
            sweeps_per_dispatch=k_disp,
        )
        t0 = time.perf_counter()
        md = run_simulation(sim_info, tbm, em, spec, cfg, resume=False)
        wall = time.perf_counter() - t0
        # first BATCH of each phase carries trace+compile (k sweeps when
        # sweeps_per_dispatch > 1)
        upd = (md["t_therm_s"] - md["t_first_therm_sweep_s"]) / (
            md["n_therm_timed"] - md.get("n_first_therm_batch", 1)
        )
        mea = (md["t_measure_s"] - md["t_first_measured_sweep_s"]) / (
            md["n_measure_timed"] - md.get("n_first_measured_batch", 1)
        )
        row = {
            "L": L, "N": N, "Ltau": 240,
            "update_sweep_s": round(upd, 3),
            "measured_sweep_s": round(mea, 3),
            "measured_sweep_per_site_ms": round(1e3 * mea / N, 4),
            "compile_first_therm_s": md["t_first_therm_sweep_s"],
            "compile_first_measured_s": md["t_first_measured_sweep_s"],
            "total_wall_s": round(wall, 1),
            "n_therm": n_therm, "n_meas": n_meas, "nrv": nrv,
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    print("\n| L | N | update sweep (s) | measured sweep (s) | per-site (ms) | cost vs prev |")
    print("|---|---|---|---|---|---|")
    prev = None
    for r in results:
        ratio = "" if prev is None else (
            f"{r['measured_sweep_s'] / prev['measured_sweep_s']:.2f}x / "
            f"{r['N'] / prev['N']:.1f}x sites"
        )
        print(
            f"| {r['L']} | {r['N']} | {r['update_sweep_s']} | {r['measured_sweep_s']} | "
            f"{r['measured_sweep_per_site_ms']} | {ratio} |"
        )
        prev = r
    with open(os.path.join(out_dir, "results.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
