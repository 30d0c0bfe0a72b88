"""Global phonon-field moves: reflection, swap, and radial updates.

Re-designs of /root/reference/src/reflection_update.jl, swap_update.jl and
radial_update.jl. All three share one shape (SURVEY.md section 3.4): sample fresh
pseudofermions (whose initial action is exactly |R|^2), propose a global
transformation of x, evaluate the new action with ONE preconditioned CG solve,
and Metropolis-accept. Because (V, t) are pure functions of x, rejection is a
`jnp.where` — no undo logic. Mode selection restricted by `phonon_types` /
`phonon_type_pairs` / `phonon_id` is precomputed into static candidate tables;
frozen (infinite-mass) modes are never selected."""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.bosonic import bosonic_action
from ..ops.preconditioner import refresh_preconditioner
from ..ops.pff import fermionic_action, sample_pseudofermion_fields
from .context import QMCContext, QMCState, make_fdm


class GlobalUpdateStats(NamedTuple):
    accepted: jnp.ndarray
    delta_S: jnp.ndarray
    iters: jnp.ndarray
    converged: jnp.ndarray


def _candidate_modes(ctx: QMCContext, phonon_types: Optional[Sequence[int]]) -> np.ndarray:
    elph = ctx.elph
    n_cells = elph.n_cells
    types = range(elph.nphonon) if phonon_types is None else phonon_types
    cands = []
    frozen = elph.frozen_mask
    for t in types:
        if not (0 <= t < elph.nphonon):
            raise ValueError(
                f"phonon type {t} out of range: model has {elph.nphonon} phonon "
                f"mode type(s) (valid ids 0..{elph.nphonon - 1})"
            )
        modes = t * n_cells + np.arange(n_cells)
        cands.append(modes[~frozen[modes]])
    if not cands:
        return np.zeros(0, np.int32)
    return np.concatenate(cands).astype(np.int32)


def _metropolis_core(
    ctx: QMCContext,
    state: QMCState,
    x_new: jnp.ndarray,
    extra_log_weight,
    keys,
) -> tuple[QMCState, GlobalUpdateStats]:
    """Shared accept/reject scaffolding: fresh Phi at x_old gives S_f = |R|^2
    exactly (reflection_update.jl:69-71); the proposal costs one CG solve."""
    k_phi, k_acc, k_pre = keys
    elph = ctx.elph
    x_old = state.x

    fdm_old = make_fdm(ctx, x_old)
    precond = state.precond
    Phi, Sf_old = sample_pseudofermion_fields(k_phi, elph, fdm_old, x_old)
    Sb_old = bosonic_action(elph, x_old)
    S_old = Sf_old + Sb_old

    fdm_new = make_fdm(ctx, x_new)
    if precond is not None and ctx.refresh_precond_global:
        precond = refresh_preconditioner(precond, fdm_new, k_pre)
    res = fermionic_action(
        Phi, elph, fdm_new, x_new, precond=precond, tol=ctx.tol, maxiter=ctx.maxiter,
        mixed=ctx.mixed_precision,
    )
    Sb_new = bosonic_action(elph, x_new)
    S_new = res.Sf + Sb_new

    dS = S_new - S_old
    ok = res.stats.converged & jnp.isfinite(dS)
    P = jnp.where(ok, jnp.minimum(1.0, jnp.exp(-dS + extra_log_weight)), 0.0)
    accepted = jax.random.uniform(k_acc) < P
    x_out = jnp.where(accepted, x_new, x_old)
    stats = GlobalUpdateStats(accepted=accepted, delta_S=dS, iters=res.stats.iters, converged=ok)
    return QMCState(x=x_out, key=state.key, precond=precond), stats


def reflection_update(
    ctx: QMCContext,
    state: QMCState,
    phonon_types: Optional[Sequence[int]] = None,
) -> tuple[QMCState, GlobalUpdateStats]:
    """Flip x -> -x on all time slices of one randomly chosen phonon mode
    (reflection_update!, reflection_update.jl:23-178)."""
    cands = _candidate_modes(ctx, phonon_types)
    if len(cands) == 0:
        raise ValueError(
            "reflection_update: no unfrozen phonon modes match phonon_types="
            f"{phonon_types} — nothing to update"
        )
    key = state.key
    key, k_mode, k_phi, k_acc, k_pre = jax.random.split(key, 5)
    state = QMCState(x=state.x, key=key, precond=state.precond)
    idx = jax.random.randint(k_mode, (), 0, len(cands))
    mode = jnp.asarray(cands)[idx]
    x_new = state.x.at[mode].multiply(-1.0)
    return _metropolis_core(ctx, state, x_new, 0.0, (k_phi, k_acc, k_pre))


def _type_pairs(ctx: QMCContext, phonon_type_pairs) -> np.ndarray:
    elph = ctx.elph
    if phonon_type_pairs is None:
        types = [
            t
            for t in range(elph.nphonon)
            if not np.all(elph.frozen_mask[t * elph.n_cells : (t + 1) * elph.n_cells])
        ]
        return np.asarray([(t, t) for t in types], dtype=np.int32)
    return np.asarray(list(phonon_type_pairs), dtype=np.int32)


def swap_update(
    ctx: QMCContext,
    state: QMCState,
    phonon_type_pairs: Optional[Sequence[Tuple[int, int]]] = None,
) -> tuple[QMCState, GlobalUpdateStats]:
    """Exchange the full tau-trajectories of two randomly chosen phonon modes
    (swap_update!, swap_update.jl:22-178). By default the pair is two distinct
    unit cells of the same phonon type."""
    elph = ctx.elph
    n_cells = elph.n_cells
    pairs = _type_pairs(ctx, phonon_type_pairs)
    if len(pairs) == 0:
        raise ValueError(
            "swap_update: no unfrozen phonon-type pairs match phonon_type_pairs="
            f"{phonon_type_pairs} — nothing to update"
        )
    key = state.key
    key, k_pair, k_c1, k_c2, k_phi, k_acc, k_pre = jax.random.split(key, 7)
    state = QMCState(x=state.x, key=key, precond=state.precond)
    pi = jax.random.randint(k_pair, (), 0, len(pairs))
    t1 = jnp.asarray(pairs[:, 0])[pi]
    t2 = jnp.asarray(pairs[:, 1])[pi]
    c1 = jax.random.randint(k_c1, (), 0, n_cells)
    # second cell distinct when the types coincide (uniform over the others)
    shift = jax.random.randint(k_c2, (), 1, max(n_cells, 2))
    c2 = jnp.where(t1 == t2, (c1 + shift) % n_cells, jax.random.randint(k_c2, (), 0, n_cells))
    p1 = t1 * n_cells + c1
    p2 = t2 * n_cells + c2
    row1 = state.x[p1]
    row2 = state.x[p2]
    x_new = state.x.at[p1].set(row2).at[p2].set(row1)
    return _metropolis_core(ctx, state, x_new, 0.0, (k_phi, k_acc, k_pre))


def radial_update(
    ctx: QMCContext,
    state: QMCState,
    phonon_id: Optional[int] = None,
    sigma: float = 1.0,
) -> tuple[QMCState, GlobalUpdateStats]:
    """Rescale x -> e^gamma x with gamma ~ N(0, sigma/sqrt(d)); the acceptance
    carries the Jacobian term +d*gamma (radial_update!, radial_update.jl:23-195,
    following arXiv:2411.18218 Algorithm 1)."""
    elph = ctx.elph
    n_cells = elph.n_cells
    if phonon_id is None:
        sel = ~elph.frozen_mask
    else:
        sel = np.zeros(elph.n_phonon, dtype=bool)
        sel[phonon_id * n_cells : (phonon_id + 1) * n_cells] = ~elph.frozen_mask[
            phonon_id * n_cells : (phonon_id + 1) * n_cells
        ]
    d = int(sel.sum()) * elph.Ltau
    if d == 0:
        raise ValueError(
            f"radial_update: no unfrozen phonon fields selected (phonon_id={phonon_id})"
        )
    key = state.key
    key, k_gamma, k_phi, k_acc, k_pre = jax.random.split(key, 5)
    state = QMCState(x=state.x, key=key, precond=state.precond)
    gamma = jax.random.normal(k_gamma) * (sigma / np.sqrt(max(d, 1)))
    scale = jnp.where(jnp.asarray(sel)[:, None], jnp.exp(gamma), 1.0)
    x_new = state.x * scale
    return _metropolis_core(ctx, state, x_new, d * gamma, (k_phi, k_acc, k_pre))
