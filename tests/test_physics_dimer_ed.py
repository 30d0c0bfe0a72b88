"""End-to-end physics validation of the interacting Holstein dimer against exact
diagonalization with a truncated phonon Hilbert space.

Model (2 sites, periodic L=2 chain => hopping appears twice => effective 2t):
  H = -2t sum_s (c^dag_0s c_1s + h.c.) + sum_i [ Omega (a^dag_i a_i + 1/2) ]
      + alpha sum_i X_i (n_i - 1),   X = (a + a^dag)/sqrt(2 Omega),  M = 1.

QMC observables (density, double occupancy, <X>, <X^2>) must agree with the ED
thermal averages within Trotter + stochastic errors. This is the strongest
correctness statement available without running the reference itself."""

import jax
import numpy as np
import pytest

from smoqyelphqmc_tpu.measure.greens_estimator import build_greens_estimator, update_greens_estimator
from smoqyelphqmc_tpu.measure.scalar import measure_double_occ, measure_n
from smoqyelphqmc_tpu.updates import (
    HMCParams,
    hmc_update,
    initialize_qmc,
    make_fdm,
    reflection_update,
    swap_update,
)

from _models import chain_model


def _ed_observables(t_eff, Omega, alpha, beta, n_boson=10):
    """Thermal <n>, <docc>, <X>, <X^2> by dense ED."""
    # fermion modes: (site0 up, site1 up, site0 dn, site1 dn) with JW strings
    I2 = np.eye(2)
    c = np.array([[0.0, 1.0], [0.0, 0.0]])  # annihilation
    z = np.diag([1.0, -1.0])

    def mode_op(k, n_modes=4):
        ops = [z] * k + [c] + [I2] * (n_modes - k - 1)
        out = ops[0]
        for o in ops[1:]:
            out = np.kron(out, o)
        return out

    c_ops = [mode_op(k) for k in range(4)]  # dim 16
    n_ops = [op.T @ op for op in c_ops]
    n0 = n_ops[0] + n_ops[2]  # site 0 total density
    n1 = n_ops[1] + n_ops[3]
    docc0 = n_ops[0] @ n_ops[2]
    docc1 = n_ops[1] @ n_ops[3]
    hop = sum(c_ops[i].T @ c_ops[j] + c_ops[j].T @ c_ops[i] for (i, j) in [(0, 1), (2, 3)])
    Hf = -t_eff * hop

    # phonons: two modes, cutoff n_boson
    nb = n_boson
    a = np.diag(np.sqrt(np.arange(1, nb)), 1)
    Ib = np.eye(nb)
    X1 = (a + a.T) / np.sqrt(2 * Omega)
    Hb1 = Omega * (a.T @ a + 0.5 * Ib)
    dim_f, dim_b = 16, nb * nb

    def kron3(A, B, C):
        return np.kron(A, np.kron(B, C))

    # ph-symmetric coupling alpha X_i (n_i - 1) for each site
    H = (
        np.kron(Hf, np.eye(dim_b))
        + kron3(np.eye(16), Hb1, Ib)
        + kron3(np.eye(16), Ib, Hb1)
        + alpha * kron3(n0 - np.eye(16), X1, Ib)
        + alpha * kron3(n1 - np.eye(16), Ib, X1)
    )
    w, V = np.linalg.eigh(H)
    w = w - w.min()
    boltz = np.exp(-beta * w)
    Z = boltz.sum()

    def avg(op):
        return float(np.einsum("i,ji,jk,ki->", boltz, V, op, V) / Z)

    n_avg = avg(np.kron((n0 + n1) / 2, np.eye(dim_b)))
    d_avg = avg(np.kron((docc0 + docc1) / 2, np.eye(dim_b)))
    X_avg = avg((kron3(np.eye(16), X1, Ib) + kron3(np.eye(16), Ib, X1)) / 2)
    X2_avg = avg((kron3(np.eye(16), X1 @ X1, Ib) + kron3(np.eye(16), Ib, X1 @ X1)) / 2)
    # equal-time density-density correlation C(r) = (1/N) sum_i <n_{i+r} n_i>
    nn0 = avg(np.kron((n0 @ n0 + n1 @ n1) / 2, np.eye(dim_b)))
    nn1 = avg(np.kron((n0 @ n1 + n1 @ n0) / 2, np.eye(dim_b)))
    return n_avg, d_avg, X_avg, X2_avg, (nn0, nn1)


@pytest.mark.slow
def test_holstein_dimer_vs_ed():
    t, Omega, alpha, beta, dtau = 0.5, 1.0, 0.8, 2.0, 0.05
    n_ed, d_ed, X_ed, X2_ed, _ = _ed_observables(2 * t, Omega, alpha, beta, n_boson=12)

    geo, tbm, tbp, elph_model, elph = chain_model(
        L=2, t=t, mu=0.0, Omega=Omega, alpha=alpha, beta=beta, dtau=dtau
    )
    ctx, state = initialize_qmc(tbp, elph, seed=5, tol=1e-9)
    params = HMCParams(Nt=10)
    step = jax.jit(lambda s: hmc_update(ctx, s, params))
    refl = jax.jit(lambda s: reflection_update(ctx, s))
    swap = jax.jit(lambda s: swap_update(ctx, s))

    est = build_greens_estimator(elph.Ltau, geo.n_orbitals, geo.L, Nrv=8)

    @jax.jit
    def measure(s, key):
        fdm = make_fdm(ctx, s.x)
        upd = update_greens_estimator(est, fdm, key, precond=s.precond, tol=1e-9, maxiter=2000)
        n_re, _ = measure_n(upd.estimator)
        d_re, _ = measure_double_occ(upd.estimator)
        return n_re, d_re

    for _ in range(80):
        state, _ = refl(state)
        state, _ = swap(state)
        state, _ = step(state)

    key = jax.random.PRNGKey(123)
    n_acc = d_acc = x_acc = x2_acc = 0.0
    cnt = 0
    for i in range(400):
        state, _ = refl(state)
        state, _ = step(state)
        if i % 2 == 0:
            key, sub = jax.random.split(key)
            n, d = measure(state, sub)
            x = np.asarray(state.x)
            n_acc += float(n)
            d_acc += float(d)
            x_acc += x.mean()
            x2_acc += (x**2).mean()
            cnt += 1

    n_avg = 2 * n_acc / cnt
    d_avg = d_acc / cnt
    x_avg = x_acc / cnt
    x2_avg = x2_acc / cnt

    np.testing.assert_allclose(n_avg, n_ed, atol=0.06)
    np.testing.assert_allclose(d_avg, d_ed, rtol=0.15)
    np.testing.assert_allclose(x2_avg, X2_ed, rtol=0.15)
    assert abs(x_avg - X_ed) < 0.25 * np.sqrt(X2_ed)


@pytest.mark.slow
def test_holstein_dimer_correlations_vs_ed():
    """Greens / density / spin_z / pair correlations — equal-time AND
    time-displaced (tau = beta/2) — of the interacting dimer against ED.

    Exercises the full stochastic contraction machinery (all three pair
    topologies, tau = 0/beta delta-corrections, reference coefficient
    conventions: spin.jl:9 S^z = (n_up - n_dn)/2, pair.jl:9
    PP = G(a,i+r+r'|c,i+r'') G(b,i+r|d,i)) on an exactly solvable interacting
    model — beyond the per-realization oracles of
    test_contraction_bruteforce.py."""
    from smoqyelphqmc_tpu.measure.container import MeasurementSpec, make_measurements

    t, Omega, alpha, beta, dtau = 0.5, 1.0, 0.8, 1.0, 0.1

    # ---- ED: generic <A(tau) B(0)> in the eigenbasis ----
    I2 = np.eye(2)
    c = np.array([[0.0, 1.0], [0.0, 0.0]])
    z = np.diag([1.0, -1.0])

    def mode_op(k, n=4):
        ops = [z] * k + [c] + [I2] * (n - k - 1)
        out = ops[0]
        for o in ops[1:]:
            out = np.kron(out, o)
        return out

    c_ops = [mode_op(k) for k in range(4)]  # (0up, 1up, 0dn, 1dn)
    n_ops = [op.T @ op for op in c_ops]
    nb = 10
    ab = np.diag(np.sqrt(np.arange(1, nb)), 1)
    Ib = np.eye(nb)
    X1 = (ab + ab.T) / np.sqrt(2 * Omega)
    Hb1 = Omega * (ab.T @ ab + 0.5 * Ib)

    def kron3(A, B, C):
        return np.kron(A, np.kron(B, C))

    n0 = n_ops[0] + n_ops[2]
    n1 = n_ops[1] + n_ops[3]
    hop = sum(c_ops[i].T @ c_ops[j] + c_ops[j].T @ c_ops[i] for (i, j) in [(0, 1), (2, 3)])
    H = (
        np.kron(-2 * t * hop, np.eye(nb * nb))
        + kron3(np.eye(16), Hb1, Ib) + kron3(np.eye(16), Ib, Hb1)
        + alpha * kron3(n0 - np.eye(16), X1, Ib)
        + alpha * kron3(n1 - np.eye(16), Ib, X1)
    )
    w, V = np.linalg.eigh(H)
    w -= w.min()
    boltz = np.exp(-beta * w)
    Z = boltz.sum()

    def corr_tau(A, B, tau):
        Am = V.T @ np.kron(A, np.eye(nb * nb)) @ V
        Bm = V.T @ np.kron(B, np.eye(nb * nb)) @ V
        return float(
            np.einsum("i,ij,j,ji->", np.exp(-(beta - tau) * w), Am, np.exp(-tau * w), Bm) / Z
        )

    Sz0 = (n_ops[0] - n_ops[2]) / 2.0
    Sz1 = (n_ops[1] - n_ops[3]) / 2.0
    D0 = c_ops[2] @ c_ops[0]  # onsite pair c_dn c_up
    D1 = c_ops[3] @ c_ops[1]
    taus = [0.0, beta / 2]
    ed = {
        "density": [[(corr_tau(n0, n0, tt) + corr_tau(n1, n1, tt)) / 2,
                     (corr_tau(n1, n0, tt) + corr_tau(n0, n1, tt)) / 2] for tt in taus],
        "spin_z": [[(corr_tau(Sz0, Sz0, tt) + corr_tau(Sz1, Sz1, tt)) / 2,
                    (corr_tau(Sz1, Sz0, tt) + corr_tau(Sz0, Sz1, tt)) / 2] for tt in taus],
        "pair": [[(corr_tau(D0, D0.T, tt) + corr_tau(D1, D1.T, tt)) / 2,
                  (corr_tau(D1, D0.T, tt) + corr_tau(D0, D1.T, tt)) / 2] for tt in taus],
        "greens": [[(corr_tau(c_ops[0], c_ops[0].T, tt) + corr_tau(c_ops[1], c_ops[1].T, tt)) / 2,
                    (corr_tau(c_ops[1], c_ops[0].T, tt) + corr_tau(c_ops[0], c_ops[1].T, tt)) / 2]
                   for tt in taus],
    }

    # ---- QMC ----
    geo, tbm, tbp, elph_model, elph = chain_model(
        L=2, t=t, mu=0.0, Omega=Omega, alpha=alpha, beta=beta, dtau=dtau
    )
    ctx, state = initialize_qmc(tbp, elph, seed=7, tol=1e-9)
    params = HMCParams(Nt=10)
    step = jax.jit(lambda s: hmc_update(ctx, s, params))
    refl = jax.jit(lambda s: reflection_update(ctx, s))
    spec = MeasurementSpec(geometry=geo)
    for kind in ("greens", "density", "spin_z", "pair"):
        spec.add_correlation(kind, [(0, 0)], time_displaced=True)
    est = build_greens_estimator(elph.Ltau, geo.n_orbitals, geo.L, Nrv=8)

    @jax.jit
    def measure(s, key):
        fdm = make_fdm(ctx, s.x)
        upd = update_greens_estimator(est, fdm, key, precond=s.precond, tol=1e-9, maxiter=2000)
        out = make_measurements(ctx, spec, upd.estimator, s.x)
        return {k: out["correlations"][k][0][0] for k in ("greens", "density", "spin_z", "pair")}

    for _ in range(50):
        state, _ = refl(state)
        state, _ = step(state)
    key = jax.random.PRNGKey(11)
    accs, cnt = None, 0
    for i in range(240):
        state, _ = refl(state)
        state, _ = step(state)
        if i % 2 == 0:
            key, sub = jax.random.split(key)
            m = {k: np.asarray(v) for k, v in measure(state, sub).items()}
            accs = m if accs is None else {k: accs[k] + m[k] for k in m}
            cnt += 1

    Lt = elph.Ltau
    tidx = [0, Lt // 2]
    # tolerances: Trotter at dtau = 0.1 contributes up to ~0.1 on density;
    # stochastic error ~0.02-0.05 at Nrv = 8 x 120 samples
    atol = {"density": 0.2, "spin_z": 0.06, "pair": 0.12, "greens": 0.1}
    for k in ("greens", "density", "spin_z", "pair"):
        C = accs[k] / cnt  # (Ltau+1, 2)
        for j, ti in enumerate(tidx):
            for r in (0, 1):
                np.testing.assert_allclose(
                    C[ti, r], ed[k][j][r], atol=atol[k],
                    err_msg=f"{k} tau_idx={ti} r={r}",
                )
