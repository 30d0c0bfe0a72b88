from .simulation_info import (SimulationInfo, initialize_datafolder, save_simulation_info, model_summary, rename_complete_simulation, save_density_tuning_profile)
from .measurements_io import write_measurement_bin, merge_bins, process_measurements
from .correlation_ratio import compute_correlation_ratio, compute_composite_correlation_ratio
from .checkpoint import write_checkpoint, read_checkpoint, checkpoint_due, runtime_exceeded, delete_checkpoints

__all__ = [
    "SimulationInfo",
    "initialize_datafolder",
    "save_simulation_info",
    "model_summary",
    "rename_complete_simulation",
    "save_density_tuning_profile",
    "write_measurement_bin",
    "merge_bins",
    "process_measurements",
    "compute_correlation_ratio",
    "compute_composite_correlation_ratio",
    "write_checkpoint",
    "read_checkpoint",
    "checkpoint_due",
    "runtime_exceeded",
    "delete_checkpoints",
]
