"""High-level simulation driver.

The reference has no framework CLI: its tutorials hand-write a run_simulation
function (/root/reference/tutorials/holstein_honeycomb.jl:53-543, SURVEY.md
section 1 L7). This module packages that flow as a reusable driver: model
expansion, QMC context/state setup, a jitted (reflection + swap [+ radial] + HMC)
sweep, measurement passes with bin-averaged HDF5 output, chemical-potential
tuning, wall-clock-gated checkpoint/resume with runtime-limit self-termination,
and final statistics processing. The examples/ scripts mirror the reference's
tutorials and examples on top of this driver."""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .io.checkpoint import delete_checkpoints, read_checkpoint, runtime_exceeded, write_checkpoint
from .io.measurements_io import merge_bins, process_measurements, write_measurement_bin
from .io.simulation_info import SimulationInfo, initialize_datafolder, model_summary, save_simulation_info
from .measure.container import MeasurementAccumulator, MeasurementSpec, make_measurements
from .measure.greens_estimator import build_greens_estimator, update_greens_estimator
from .measure.scalar import measure_n, measure_Nsqrd
from .models.electron_phonon import ElectronPhononParameters
from .models.tight_binding import TightBindingParameters
from .updates.context import QMCState, initialize_qmc, make_fdm
from .updates.global_updates import radial_update, reflection_update, swap_update
from .updates.hmc import HMCParams, hmc_update
from .updates.mu_tuner import MuTunerState, init_mu_tuner, mu_tuner_update


@dataclasses.dataclass
class SimulationConfig:
    beta: float
    dtau: float = 0.05
    N_therm: int = 100
    N_measurements: int = 100
    N_bins: int = 10
    Nt: int = 24
    Nrv: int = 10
    tol: float = 1e-10
    maxiter: int = 10_000
    seed: int = 1
    symmetric: bool = True
    use_radial_updates: bool = False
    target_density: Optional[float] = None  # enables mu tuning
    checkpoint_freq_hours: float = np.inf
    runtime_limit_hours: float = np.inf
    use_preconditioner: bool = True
    preconditioner: Optional[str] = None  # 'spectral' | 'kpm' | None -> default
    mixed_precision: bool = False  # f32 Krylov inner solves + f64 defect correction
    # contraction-engine dtype: f32 rounding (~1e-7) is far below statistical
    # noise; measured 16x faster than f64 on TPU (BENCH.md)
    measurement_dtype: str = "float32"
    # leapfrog force-solve dtype: forces only shape the proposal (tolerance
    # sqrt(tol) ~ 1e-5); Metropolis exactness rests on the f64 endpoint actions.
    # f32 measured ~30% faster sweeps with identical acceptance (BENCH.md)
    force_dtype: str = "float32"
    n_walkers: int = 1  # > 1: vmapped walker axis, one bin stream per walker (pID)


def run_simulation(
    sim_info: SimulationInfo,
    tight_binding_model,
    electron_phonon_model,
    spec: MeasurementSpec,
    cfg: SimulationConfig,
    recenter: Optional[Callable] = None,
    resume: bool = True,
) -> Dict:
    """Full simulation: thermalize, measure into bins, post-process. Returns the
    metadata dict (acceptance rates, CG iteration averages — the reference's
    simulation_info.toml content, tutorials/holstein_honeycomb.jl:110-130).

    With cfg.n_walkers > 1 the chain state carries a leading walker axis
    (sharded over the device mesh when several devices are visible); each walker
    writes its own pID-tagged bin stream, replacing the reference's MPI ranks."""
    if cfg.n_walkers > 1:
        return _run_multiwalker(sim_info, tight_binding_model, electron_phonon_model, spec, cfg, recenter)
    start_time = time.time()
    initialize_datafolder(sim_info)
    geo = spec.geometry
    model_summary(
        sim_info, cfg.beta, cfg.dtau, geo, tight_binding_model, (electron_phonon_model,)
    )

    rng = np.random.default_rng(cfg.seed)
    tbp = TightBindingParameters.from_model(tight_binding_model, rng)
    elph = ElectronPhononParameters.from_model(cfg.beta, cfg.dtau, electron_phonon_model, tbp, rng)
    ctx, state = initialize_qmc(
        tbp,
        elph,
        seed=cfg.seed,
        symmetric=cfg.symmetric,
        tol=cfg.tol,
        maxiter=cfg.maxiter,
        use_preconditioner=cfg.use_preconditioner,
        preconditioner=cfg.preconditioner,
        mixed_precision=cfg.mixed_precision,
        force_dtype=cfg.force_dtype,
    )
    est = build_greens_estimator(
        elph.Ltau, geo.n_orbitals, geo.L, Nrv=cfg.Nrv, dtype=cfg.measurement_dtype
    )
    hmc_params = HMCParams(Nt=cfg.Nt)

    tuner: Optional[MuTunerState] = None
    tuning_history = []
    if cfg.target_density is not None:
        tuner = init_mu_tuner(
            cfg.target_density, cfg.beta, tbp.n_sites, float(np.asarray(tbp.mu))
        )

    metadata: Dict = {
        "N_therm": cfg.N_therm,
        "N_measurements": cfg.N_measurements,
        "N_bins": cfg.N_bins,
        "Nt": cfg.Nt,
        "Nrv": cfg.Nrv,
        "tol": cfg.tol,
        "maxiter": cfg.maxiter,
        "seed": cfg.seed,
        "hmc_acceptance_rate": 0.0,
        "reflection_acceptance_rate": 0.0,
        "swap_acceptance_rate": 0.0,
        "radial_acceptance_rate": 0.0,
        "hmc_iters": 0.0,
        "reflection_iters": 0.0,
        "swap_iters": 0.0,
        "measurement_iters": 0.0,
    }

    # ------------------------------------------------------------------
    # jitted kernels
    # ------------------------------------------------------------------
    @jax.jit
    def sweep(ctx_, state_: QMCState):
        state_, r_stats = reflection_update(ctx_, state_)
        state_, s_stats = swap_update(ctx_, state_)
        if cfg.use_radial_updates:
            state_, rad_stats = radial_update(ctx_, state_)
        else:
            rad_stats = r_stats
        state_, h_stats = hmc_update(ctx_, state_, hmc_params, recenter=recenter)
        return state_, (r_stats, s_stats, rad_stats, h_stats)

    @jax.jit
    def measure_pass(ctx_, state_: QMCState, est_, key):
        fdm = make_fdm(ctx_, state_.x)
        upd = update_greens_estimator(
            est_, fdm, key, precond=state_.precond, tol=cfg.tol, maxiter=cfg.maxiter,
            mixed=cfg.mixed_precision,
        )
        out = make_measurements(ctx_, spec, upd.estimator, state_.x)
        n_re, _ = measure_n(upd.estimator)
        Nsq_re, _ = measure_Nsqrd(upd.estimator)
        return upd.estimator, out, upd.iters, 2.0 * n_re, Nsq_re

    @jax.jit
    def tune_pass(ctx_, state_: QMCState, est_, key):
        fdm = make_fdm(ctx_, state_.x)
        upd = update_greens_estimator(
            est_, fdm, key, precond=state_.precond, tol=cfg.tol, maxiter=cfg.maxiter,
            mixed=cfg.mixed_precision,
        )
        n_re, _ = measure_n(upd.estimator)
        Nsq_re, _ = measure_Nsqrd(upd.estimator)
        return upd.estimator, upd.iters, 2.0 * n_re, Nsq_re

    def set_mu(ctx_, mu):
        return ctx_.replace(tbp=ctx_.tbp.replace(mu=jnp.asarray(mu)))

    # ------------------------------------------------------------------
    # resume
    # ------------------------------------------------------------------
    therm_done = 0
    meas_done = 0
    cp_stamp: Optional[float] = None
    bin_size = max(cfg.N_measurements // cfg.N_bins, 1)
    acc = MeasurementAccumulator(spec)
    if resume:
        cp = read_checkpoint(sim_info.datafolder, sim_info.pID)
        if cp is not None:
            s = cp["state"]
            state = QMCState(
                x=jnp.asarray(s["x"]), key=jnp.asarray(s["key"]), precond=state.precond
            )
            therm_done = int(s["therm_done"])
            meas_done = int(s["meas_done"])
            metadata.update(s["metadata"])
            if tuner is not None and s.get("tuner") is not None:
                tuner = tuner.replace(**{k: jnp.asarray(v) for k, v in s["tuner"].items()})
                ctx = set_mu(ctx, tuner.mu)

    def maybe_checkpoint():
        nonlocal cp_stamp
        tree = {
            "x": state.x,
            "key": state.key,
            "therm_done": therm_done,
            "meas_done": meas_done,
            "metadata": dict(metadata),
            "tuner": None
            if tuner is None
            else {
                "mu": tuner.mu,
                "t": tuner.t,
                "mu_sum": tuner.mu_sum,
                "n_sum": tuner.n_sum,
                "N_sum": tuner.N_sum,
                "Nsq_sum": tuner.Nsq_sum,
                "weight": tuner.weight,
            },
        }
        cp_stamp = write_checkpoint(
            sim_info.datafolder,
            tree,
            pID=sim_info.pID,
            checkpoint_timestamp=cp_stamp,
            checkpoint_freq_hours=cfg.checkpoint_freq_hours,
        )

    def out_of_time() -> bool:
        return runtime_exceeded(start_time, cfg.runtime_limit_hours)

    # ------------------------------------------------------------------
    # thermalize
    # ------------------------------------------------------------------
    key_host = jax.random.PRNGKey(cfg.seed + 7919)
    while therm_done < cfg.N_therm:
        state, (r, s, rad, h) = sweep(ctx, state)
        metadata["reflection_acceptance_rate"] += float(r.accepted)
        metadata["swap_acceptance_rate"] += float(s.accepted)
        metadata["radial_acceptance_rate"] += float(rad.accepted)
        metadata["hmc_acceptance_rate"] += float(h.accepted)
        metadata["reflection_iters"] += float(r.iters)
        metadata["swap_iters"] += float(s.iters)
        metadata["hmc_iters"] += float(h.iters_avg)
        if tuner is not None:
            key_host, sub = jax.random.split(key_host)
            est, iters, n, Nsq = tune_pass(ctx, state, est, sub)
            tuner = mu_tuner_update(tuner, n, Nsq)
            ctx = set_mu(ctx, tuner.mu)
            tuning_history.append((float(tuner.mu), float(n), float(Nsq)))
        therm_done += 1
        if cfg.checkpoint_freq_hours < np.inf:
            maybe_checkpoint()
        if out_of_time():
            maybe_checkpoint()
            return metadata

    # ------------------------------------------------------------------
    # measure
    # ------------------------------------------------------------------
    while meas_done < cfg.N_measurements:
        state, (r, s, rad, h) = sweep(ctx, state)
        metadata["reflection_acceptance_rate"] += float(r.accepted)
        metadata["swap_acceptance_rate"] += float(s.accepted)
        metadata["radial_acceptance_rate"] += float(rad.accepted)
        metadata["hmc_acceptance_rate"] += float(h.accepted)
        metadata["reflection_iters"] += float(r.iters)
        metadata["swap_iters"] += float(s.iters)
        metadata["hmc_iters"] += float(h.iters_avg)

        key_host, sub = jax.random.split(key_host)
        est, out, iters, n, Nsq = measure_pass(ctx, state, est, sub)
        metadata["measurement_iters"] += float(iters)
        if tuner is not None:
            tuner = mu_tuner_update(tuner, n, Nsq)
            ctx = set_mu(ctx, tuner.mu)
            tuning_history.append((float(tuner.mu), float(n), float(Nsq)))
        acc.accumulate(out)
        meas_done += 1
        if meas_done % bin_size == 0:
            bin_index = meas_done // bin_size - 1
            write_measurement_bin(sim_info, bin_index, acc.finalize_bin(), spec, dtau=cfg.dtau)
        if cfg.checkpoint_freq_hours < np.inf:
            maybe_checkpoint()
        if out_of_time() and meas_done < cfg.N_measurements:
            maybe_checkpoint()
            return metadata

    # ------------------------------------------------------------------
    # finalize
    # ------------------------------------------------------------------
    n_updates = cfg.N_therm + cfg.N_measurements
    for k in ("hmc", "reflection", "swap", "radial"):
        metadata[f"{k}_acceptance_rate"] /= max(n_updates, 1)
    metadata["hmc_iters"] /= max(n_updates, 1)
    metadata["reflection_iters"] /= max(n_updates, 1)
    metadata["swap_iters"] /= max(n_updates, 1)
    metadata["measurement_iters"] /= max(cfg.N_measurements, 1)
    if tuner is not None:
        metadata["final_mu"] = float(np.asarray(tuner.mu))
        from .io.simulation_info import save_density_tuning_profile

        save_density_tuning_profile(sim_info, tuning_history)

    merge_bins(sim_info)
    save_simulation_info(sim_info, metadata)
    process_measurements(sim_info.datafolder, n_bins=cfg.N_bins, spec=spec)
    delete_checkpoints(sim_info.datafolder, sim_info.pID)
    return metadata


def _run_multiwalker(
    sim_info: SimulationInfo,
    tight_binding_model,
    electron_phonon_model,
    spec: MeasurementSpec,
    cfg: SimulationConfig,
    recenter=None,
) -> Dict:
    """Walker-axis variant of run_simulation: W independent chains advance as one
    vmapped program (sharded over the device mesh when possible); per-walker bin
    streams are tagged by pID exactly like the reference's MPI ranks
    (tutorials/holstein_honeycomb_mpi.jl:59-72)."""
    from .parallel.walkers import (
        init_walker_states,
        shard_walker_states,
        walker_measure,
        walker_mesh,
        walker_sweep,
    )

    initialize_datafolder(sim_info)
    geo = spec.geometry
    model_summary(sim_info, cfg.beta, cfg.dtau, geo, tight_binding_model, (electron_phonon_model,))

    rng = np.random.default_rng(cfg.seed)
    tbp = TightBindingParameters.from_model(tight_binding_model, rng)
    elph = ElectronPhononParameters.from_model(cfg.beta, cfg.dtau, electron_phonon_model, tbp, rng)
    ctx, state0 = initialize_qmc(
        tbp, elph, seed=cfg.seed, symmetric=cfg.symmetric, tol=cfg.tol,
        maxiter=cfg.maxiter, use_preconditioner=cfg.use_preconditioner,
        preconditioner=cfg.preconditioner, mixed_precision=cfg.mixed_precision,
        force_dtype=cfg.force_dtype,
    )
    W = cfg.n_walkers
    mesh = walker_mesh(min(W, len(jax.devices())))
    states = shard_walker_states(init_walker_states(ctx, state0, W, seed=cfg.seed + 1), mesh)
    est = build_greens_estimator(
        elph.Ltau, geo.n_orbitals, geo.L, Nrv=cfg.Nrv, dtype=cfg.measurement_dtype
    )
    hmc_params = HMCParams(Nt=cfg.Nt)

    # per-walker chemical-potential tuners: each chain tunes its own mu, exactly
    # like the reference's independent MPI ranks. mu rides a per-walker vmapped
    # context leaf.
    tuners = None
    mu_walkers = None
    if cfg.target_density is not None:
        t0 = init_mu_tuner(cfg.target_density, cfg.beta, tbp.n_sites, float(np.asarray(tbp.mu)))
        tuners = jax.tree_util.tree_map(lambda a: jnp.broadcast_to(a, (W,) + jnp.shape(a)), t0)
        mu_walkers = jnp.full((W,), float(np.asarray(tbp.mu)))

    def with_mu(ctx_, mu):
        return ctx_.replace(tbp=ctx_.tbp.replace(mu=mu))

    if cfg.target_density is None:
        sweep = jax.jit(lambda s: walker_sweep(ctx, s, hmc_params, recenter=recenter))
        measure = jax.jit(
            lambda s, keys: walker_measure(
                ctx, spec, s, est, keys, tol=cfg.tol, maxiter=cfg.maxiter, mixed=cfg.mixed_precision
            )
        )
    else:
        from .measure.greens_estimator import update_greens_estimator as _upd_est
        from .measure.scalar import measure_n as _m_n, measure_Nsqrd as _m_N2
        from .updates.global_updates import reflection_update as _refl, swap_update as _swap
        from .updates.hmc import hmc_update as _hmc

        @jax.jit
        def sweep(s, mus):
            def one(s1, mu):
                c = with_mu(ctx, mu)
                s1, r = _refl(c, s1)
                s1, sw = _swap(c, s1)
                s1, h = _hmc(c, s1, hmc_params, recenter=recenter)
                return s1, (r, sw, h)

            return jax.vmap(one)(s, mus)

        @jax.jit
        def measure(s, keys, mus):
            def one(s1, key, mu):
                c = with_mu(ctx, mu)
                fdm = make_fdm(c, s1.x)
                upd = _upd_est(
                    est, fdm, key, precond=s1.precond, tol=cfg.tol,
                    maxiter=cfg.maxiter, mixed=cfg.mixed_precision,
                )
                out = make_measurements(c, spec, upd.estimator, s1.x)
                n_re, _ = _m_n(upd.estimator)
                N2_re, _ = _m_N2(upd.estimator)
                return out, upd.iters, 2.0 * n_re, N2_re

            return jax.vmap(one)(s, keys, mus)

        tune_step = jax.jit(jax.vmap(mu_tuner_update))

    metadata: Dict = {
        "n_walkers": W,
        "hmc_acceptance_rate": 0.0,
        "reflection_acceptance_rate": 0.0,
        "swap_acceptance_rate": 0.0,
        "hmc_iters": 0.0,
        "measurement_iters": 0.0,
    }
    key = jax.random.PRNGKey(cfg.seed + 17)
    for _ in range(cfg.N_therm):
        if tuners is None:
            states, _ = sweep(states)
        else:
            states, _ = sweep(states, mu_walkers)
            key, sub = jax.random.split(key)
            keys = jax.random.split(sub, W)
            _, _, n_w, N2_w = measure(states, keys, mu_walkers)
            tuners = tune_step(tuners, n_w, N2_w)
            mu_walkers = tuners.mu

    accs = [MeasurementAccumulator(spec) for _ in range(W)]
    bin_size = max(cfg.N_measurements // cfg.N_bins, 1)
    for m in range(cfg.N_measurements):
        if tuners is None:
            states, (r, s, h) = sweep(states)
        else:
            states, (r, s, h) = sweep(states, mu_walkers)
        metadata["reflection_acceptance_rate"] += float(np.mean(np.asarray(r.accepted)))
        metadata["swap_acceptance_rate"] += float(np.mean(np.asarray(s.accepted)))
        metadata["hmc_acceptance_rate"] += float(np.mean(np.asarray(h.accepted)))
        metadata["hmc_iters"] += float(np.mean(np.asarray(h.iters_avg)))
        key, sub = jax.random.split(key)
        keys = jax.random.split(sub, W)
        if tuners is None:
            out, iters = measure(states, keys)
        else:
            out, iters, n_w, N2_w = measure(states, keys, mu_walkers)
            tuners = tune_step(tuners, n_w, N2_w)
            mu_walkers = tuners.mu
        metadata["measurement_iters"] += float(np.mean(np.asarray(iters)))
        host = jax.tree_util.tree_map(np.asarray, out)
        for w in range(W):
            accs[w].accumulate(jax.tree_util.tree_map(lambda a, w=w: a[w], host))
        if (m + 1) % bin_size == 0:
            b = (m + 1) // bin_size - 1
            for w in range(W):
                si = SimulationInfo(
                    filepath=sim_info.filepath,
                    datafolder_prefix=sim_info.datafolder_prefix,
                    sID=sim_info.sID,
                    pID=w,
                )
                write_measurement_bin(si, b, accs[w].finalize_bin(), spec, dtau=cfg.dtau)

    for k in ("hmc_acceptance_rate", "reflection_acceptance_rate", "swap_acceptance_rate",
              "hmc_iters", "measurement_iters"):
        metadata[k] /= max(cfg.N_measurements, 1)
    if tuners is not None:
        metadata["final_mu_per_walker"] = [float(v) for v in np.asarray(mu_walkers)]
    merge_bins(sim_info)
    save_simulation_info(sim_info, metadata)
    process_measurements(sim_info.datafolder, n_bins=cfg.N_bins, spec=spec)
    return metadata
