"""Chemical-potential tuning toward a target density.

Covers the capability of MuTuner.jl as used by the reference
(/root/reference/src/update_chemical_potential.jl and SURVEY.md section 2b): after
each measurement of the density n and total-particle-number fluctuation <N^2>,
the chemical potential is moved toward the target filling using a running
compressibility estimate,

    mu_{t+1} = mu_bar_t + (n_target - n_bar_t) * V / kappa_t,
    kappa_t  = max( beta (<N^2> - <N>^2)_bar,  kappa_min / sqrt(t+1) ),

with forgetful (exponentially-decaying-window) running means — the same
self-averaging scheme the MuTuner algorithm uses to keep the tuner stable at
early times yet convergent (mu-bar-averaging makes mu_t a consistent estimator).
All state lives in a small pytree so the tuner jits and vmaps with the chain."""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..utils.pytree import register_pytree_dataclass, static_field


@register_pytree_dataclass
class MuTunerState:
    mu: jnp.ndarray  # current chemical potential
    t: jnp.ndarray  # update counter
    mu_sum: jnp.ndarray
    n_sum: jnp.ndarray
    N_sum: jnp.ndarray
    Nsq_sum: jnp.ndarray
    weight: jnp.ndarray  # running total weight of the forgetful window
    target_density: float = static_field()
    beta: float = static_field()
    n_sites: int = static_field()
    memory: float = static_field()  # forgetting factor in (0, 1]; 1 = plain mean
    kappa_min: float = static_field()


def init_mu_tuner(
    target_density: float,
    beta: float,
    n_sites: int,
    initial_mu: float,
    memory: float = 0.99,
    kappa_min: float = 0.1,
) -> MuTunerState:
    # strong f64 leaves: weak-typed scalars would let f32 measurement inputs
    # demote the whole running-mean arithmetic to f32 — and, worse, make the
    # update's dtype depend on weak-type flags that a checkpoint round-trip
    # cannot preserve (np arrays are strong), breaking bit-identical resume
    # (tests/test_multihost.py::test_multihost_kill_and_resume)
    f64 = lambda v: jnp.asarray(v, dtype=jnp.float64)
    return MuTunerState(
        mu=f64(float(initial_mu)),
        t=f64(0.0),
        mu_sum=f64(0.0),
        n_sum=f64(0.0),
        N_sum=f64(0.0),
        Nsq_sum=f64(0.0),
        weight=f64(0.0),
        target_density=float(target_density),
        beta=float(beta),
        n_sites=int(n_sites),
        memory=float(memory),
        kappa_min=float(kappa_min),
    )


def mu_tuner_update(tuner: MuTunerState, n, Nsqrd, sgn=1.0) -> MuTunerState:
    """Record one (n, <N^2>) measurement and return the state with the new mu
    (MuTuner.update!, called at /root/reference/src/update_chemical_potential.jl:61)."""
    V = tuner.n_sites
    lam = tuner.memory
    # f64 accumulation regardless of the measurement dtype (f32 estimator
    # outputs must not demote the running means — and the result dtype must be
    # independent of weak-type flags for bit-identical checkpoint resume)
    n = jnp.asarray(n, dtype=jnp.float64)
    Nsqrd = jnp.asarray(Nsqrd, dtype=jnp.float64)
    w = lam * tuner.weight + 1.0
    mu_sum = lam * tuner.mu_sum + tuner.mu
    n_sum = lam * tuner.n_sum + n
    N_sum = lam * tuner.N_sum + n * V
    Nsq_sum = lam * tuner.Nsq_sum + Nsqrd
    mu_bar = mu_sum / w
    n_bar = n_sum / w
    N_bar = N_sum / w
    Nsq_bar = Nsq_sum / w
    t = tuner.t + 1.0
    var_N = jnp.maximum(Nsq_bar - N_bar**2, 0.0)
    kappa_fluc = tuner.beta * var_N
    kappa = jnp.maximum(kappa_fluc, tuner.kappa_min * jnp.sqrt(V / t))
    mu_new = mu_bar + (tuner.target_density - n_bar) * V / kappa
    return tuner.replace(
        mu=mu_new, t=t, mu_sum=mu_sum, n_sum=n_sum, N_sum=N_sum, Nsq_sum=Nsq_sum, weight=w
    )


class MuUpdateResult(NamedTuple):
    tuner: MuTunerState
    mu: jnp.ndarray


def update_chemical_potential(tuner: MuTunerState, n, Nsqrd, sgn=1.0) -> MuUpdateResult:
    """Functional form of update_chemical_potential! (update_chemical_potential.jl:21-74):
    the caller measures (n, <N^2>) with the Green's-function estimator, then swaps
    ctx.tbp.mu for the returned value (V is a pure function of mu, so no explicit
    matrix refresh is needed)."""
    tuner = mu_tuner_update(tuner, n, Nsqrd, sgn)
    return MuUpdateResult(tuner=tuner, mu=tuner.mu)
