"""Driver-level checkpoint/resume: a run interrupted by its runtime limit must
resume from the checkpoint and produce the complete output set
(/root/reference/tutorials/holstein_honeycomb_checkpoint.jl semantics)."""

import glob
import os

import numpy as np

from smoqyelphqmc_tpu.driver import SimulationConfig, run_simulation
from smoqyelphqmc_tpu.io import SimulationInfo
from smoqyelphqmc_tpu.measure.container import MeasurementSpec

from _models import honeycomb_model


def test_runtime_limit_interrupt_and_resume(tmp_path):
    geo, tbm, tbp, elph_model, elph = honeycomb_model(L=2, beta=0.4, dtau=0.1, alpha=0.4)
    spec = MeasurementSpec(geometry=geo)
    spec.add_correlation("density", [(0, 0)])

    def cfg(runtime):
        return SimulationConfig(
            beta=0.4, dtau=0.1, N_therm=2, N_measurements=4, N_bins=2,
            Nt=2, Nrv=3, tol=1e-7, seed=21,
            checkpoint_freq_hours=0.0,  # checkpoint every sweep
            runtime_limit_hours=runtime,
        )

    sim_info = SimulationInfo(filepath=str(tmp_path), datafolder_prefix="resume_test", sID=1)
    # first run: runtime limit 0 => must stop immediately after checkpointing
    meta1 = run_simulation(sim_info, tbm, elph_model, spec, cfg(0.0))
    cps = glob.glob(os.path.join(sim_info.datafolder, "checkpoint_pID-0_slot-*.pkl"))
    assert cps, "no checkpoint written on interrupt"
    assert not os.path.exists(os.path.join(sim_info.datafolder, "stats.h5"))

    # second run with the same sim_info: resumes and completes
    sim_info2 = SimulationInfo(filepath=str(tmp_path), datafolder_prefix="resume_test", sID=1)
    meta2 = run_simulation(sim_info2, tbm, elph_model, spec, cfg(np.inf))
    assert os.path.exists(os.path.join(sim_info2.datafolder, "stats.h5"))
    # completed runs delete their checkpoints
    cps = glob.glob(os.path.join(sim_info2.datafolder, "checkpoint_pID-0_slot-*.pkl"))
    assert not cps
