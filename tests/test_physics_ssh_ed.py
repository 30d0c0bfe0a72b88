"""End-to-end physics validation of the interacting SSH dimer against exact
diagonalization — the SSH analogue of test_physics_dimer_ed (no reference
counterpart; the reference has only smoke tests, SURVEY.md section 4).

Model (2 sites, OPEN chain => one bond):
  H = -[t - alpha (X_1 - X_0)] sum_s (c^dag_0s c_1s + h.c.)
      + sum_i Omega (a^dag_i a_i + 1/2),   X_i = (a_i + a_i^dag)/sqrt(2 Omega).

QMC <n>, <docc>, <dx>, <dx^2> must match ED thermal averages within
Trotter + stochastic errors. Exercises the full SSH path: hopping dressing,
color-walk forces, and the open-boundary masking."""

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
)

from test_open_boundaries import open_chain


def _ed_ssh(t, Omega, alpha, beta, n_boson=10):
    I2 = np.eye(2)
    c = np.array([[0.0, 1.0], [0.0, 0.0]])
    z = np.diag([1.0, -1.0])

    def mode_op(k, n_modes=4):
        ops = [z] * k + [c] + [I2] * (n_modes - k - 1)
        out = ops[0]
        for o in ops[1:]:
            out = np.kron(out, o)
        return out

    c_ops = [mode_op(k) for k in range(4)]
    n_ops = [op.T @ op for op in c_ops]
    n0, n1 = n_ops[0] + n_ops[2], n_ops[1] + n_ops[3]
    docc = (n_ops[0] @ n_ops[2] + n_ops[1] @ n_ops[3]) / 2
    hop = sum(c_ops[i].T @ c_ops[j] + c_ops[j].T @ c_ops[i] for (i, j) in [(0, 1), (2, 3)])

    nb = n_boson
    a = np.diag(np.sqrt(np.arange(1, nb)), 1)
    Ib = np.eye(nb)
    X = (a + a.T) / np.sqrt(2 * Omega)
    Hb = Omega * (a.T @ a + 0.5 * Ib)

    def kron3(A, B, C):
        return np.kron(A, np.kron(B, C))

    If = np.eye(16)
    dX = kron3(If, Ib, X) - kron3(If, X, Ib)  # X_1 - X_0
    H = (
        -t * np.kron(hop, np.eye(nb * nb))
        + kron3(If, Hb, Ib)
        + kron3(If, Ib, Hb)
        + alpha * np.kron(hop, np.eye(nb * nb)) @ dX  # +alpha dx * hop (dressing -(t - a dx))
    )
    w, V = np.linalg.eigh(H)
    w = w - w.min()
    boltz = np.exp(-beta * w)
    Z = boltz.sum()

    def avg(op):
        return float(np.einsum("i,ji,jk,ki->", boltz, V, op, V) / Z)

    n_avg = avg(np.kron((n0 + n1) / 2, np.eye(nb * nb)))
    d_avg = avg(np.kron(docc, np.eye(nb * nb)))
    dx_avg = avg(dX)
    dx2_avg = avg(dX @ dX)
    return n_avg, d_avg, dx_avg, dx2_avg


@pytest.mark.slow
def test_ssh_dimer_vs_ed():
    t, Omega, alpha, beta, dtau = 0.5, 1.0, 0.6, 2.0, 0.05
    n_ed, d_ed, dx_ed, dx2_ed = _ed_ssh(t, Omega, alpha, beta, n_boson=12)

    geo, tbm, tbp, em, elph = open_chain(
        L=2, t=t, mu=0.0, alpha=alpha, ssh=True, beta=beta, dtau=dtau
    )
    ctx, state = initialize_qmc(tbp, elph, seed=11, tol=1e-9)
    params = HMCParams(Nt=10)
    step = jax.jit(lambda s: hmc_update(ctx, s, params))
    refl = jax.jit(lambda s: reflection_update(ctx, s))

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
        state, _ = step(state)

    key = jax.random.PRNGKey(321)
    n_acc = d_acc = dx_acc = dx2_acc = 0.0
    cnt = 0
    for i in range(400):
        state, _ = refl(state)
        state, _ = step(state)
        if i % 2 == 0:
            key, sub = jax.random.split(key)
            n, d = measure(state, sub)
            x = np.asarray(state.x)  # (2 modes, Ltau)
            dx = x[1] - x[0]
            n_acc += float(n)
            d_acc += float(d)
            dx_acc += dx.mean()
            dx2_acc += (dx**2).mean()
            cnt += 1

    n_avg = 2 * n_acc / cnt
    d_avg = d_acc / cnt
    dx_avg = dx_acc / cnt
    dx2_avg = dx2_acc / cnt

    np.testing.assert_allclose(n_avg, n_ed, atol=0.06)
    np.testing.assert_allclose(d_avg, d_ed, rtol=0.15)
    np.testing.assert_allclose(dx2_avg, dx2_ed, rtol=0.15)
    assert abs(dx_avg - dx_ed) < 0.25 * np.sqrt(dx2_ed)
