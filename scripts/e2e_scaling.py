"""Whole-simulation large-N scaling: the ACTUAL driver, measured end-to-end.

The round-3 large-N table was built from estimated sweep costs on isolated
solves and excluded the measurement pass; the reference's headline is
near-linear scaling of the full QMC simulation (/root/reference/README.md:9-11).
This script runs `run_simulation` itself — thermalization + measured sweeps +
bins written to disk — for Holstein honeycomb at beta = 12 (Ltau = 240) and
L in {12, 24, 36, 48} (N = 288 .. 4608), twice per size (cold = compile +
run, warm = run only), and reports warm wall-clock per sweep including the
measurement pass (estimator refresh + contraction engine + bin IO).

Run: python scripts/e2e_scaling.py [--sizes 12,24,36] [--therm 2] [--meas 4]
     [--nrv 6] [--out /tmp/e2e_scaling]
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
    n_therm, n_meas, nrv = 2, 4, 6
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
        if a == "--out":
            out_dir = sys.argv[i + 1]

    from _common import holstein_honeycomb_model, holstein_honeycomb_spec

    from smoqyelphqmc_tpu.driver import SimulationConfig, run_simulation
    from smoqyelphqmc_tpu.io import SimulationInfo

    os.makedirs(out_dir, exist_ok=True)
    results = []
    for L in sizes:
        N = 2 * L * L
        geo, tbm, em = holstein_honeycomb_model(L, 1.0, 1.5, 0.0)
        spec = holstein_honeycomb_spec(geo)

        def one_run(tag, seed):
            folder = os.path.join(out_dir, f"L{L}_{tag}")
            shutil.rmtree(folder, ignore_errors=True)
            os.makedirs(folder, exist_ok=True)
            sim_info = SimulationInfo(
                filepath=folder, datafolder_prefix=f"hh_L{L}", sID=1
            )
            cfg = SimulationConfig(
                beta=12.0, dtau=0.05, N_therm=n_therm, N_measurements=n_meas,
                N_bins=2, Nt=24, Nrv=nrv, tol=1e-10, maxiter=10_000, seed=seed,
            )
            t0 = time.perf_counter()
            run_simulation(sim_info, tbm, em, spec, cfg, resume=False)
            return time.perf_counter() - t0

        t_cold = one_run("cold", seed=1)
        t_warm = one_run("warm", seed=2)
        n_sweeps = n_therm + n_meas
        row = {
            "L": L, "N": N, "Ltau": 240,
            "t_cold_s": round(t_cold, 2), "t_warm_s": round(t_warm, 2),
            "wall_per_sweep_s": round(t_warm / n_sweeps, 3),
            "wall_per_sweep_per_site_ms": round(1e3 * t_warm / n_sweeps / N, 4),
            "n_therm": n_therm, "n_meas": n_meas, "nrv": nrv,
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    print("\n| L | N | warm wall/sweep (s) | per-site (ms) | vs prev size |")
    print("|---|---|---|---|---|")
    prev = None
    for r in results:
        ratio = "" if prev is None else f"{r['wall_per_sweep_s'] / prev['wall_per_sweep_s']:.2f}x cost / {r['N'] / prev['N']:.1f}x sites"
        print(
            f"| {r['L']} | {r['N']} | {r['wall_per_sweep_s']} | "
            f"{r['wall_per_sweep_per_site_ms']} | {ratio} |"
        )
        prev = r
    with open(os.path.join(out_dir, "results.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
