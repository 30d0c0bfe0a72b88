"""End-to-end physics validation on the exactly solvable atomic-limit Holstein
model (t = 0, mu = 0, ph-symmetric coupling alpha X (n - 1)).

Per site the model decouples into displaced oscillators:
  lambda = alpha^2 / (2 M Omega^2),
  Z_site prop 2 e^{beta lambda} + 2,
  <n> = 1 (particle-hole symmetry),
  <n_up n_dn> = e^{beta lambda} / (2 + 2 e^{beta lambda}),
  <X> = 0,
  <X^2> = sigma^2_disc + (alpha / M Omega^2)^2 * e^{beta lambda} / (1 + e^{beta lambda}),
with sigma^2_disc the discretized free-oscillator width (1/Ltau) sum_k 1/Q_k.

This exercises the full interacting pipeline — Lambda machinery, pseudofermion
action/forces, EFA-HMC, global updates, stochastic estimator, measurements —
against closed-form answers. (The reference has no such test.)"""

import jax
import numpy as np

from smoqyelphqmc_tpu.measure.greens_estimator import build_greens_estimator, update_greens_estimator
from smoqyelphqmc_tpu.measure.scalar import measure_double_occ, measure_n
from smoqyelphqmc_tpu.ops.bosonic import harmonic_curvature
from smoqyelphqmc_tpu.updates import (
    HMCParams,
    hmc_update,
    initialize_qmc,
    make_fdm,
    reflection_update,
)

from _models import chain_model


def test_atomic_limit_holstein():
    beta, dtau, alpha, Omega = 2.0, 0.05, 1.0, 1.0
    geo, tbm, tbp, elph_model, elph = chain_model(
        L=2, t=0.0, mu=0.0, Omega=Omega, alpha=alpha, beta=beta, dtau=dtau
    )
    ctx, state = initialize_qmc(tbp, elph, seed=3, tol=1e-9, use_preconditioner=False)
    params = HMCParams(Nt=10)
    step = jax.jit(lambda s: hmc_update(ctx, s, params))
    refl = jax.jit(lambda s: reflection_update(ctx, s))

    est = build_greens_estimator(elph.Ltau, geo.n_orbitals, geo.L, Nrv=8)
    measure = jax.jit(
        lambda s, key: _measure(ctx, est, s, key)
    )

    def _measure(ctx_, est_, s, key):
        fdm = make_fdm(ctx_, s.x)
        upd = update_greens_estimator(est_, fdm, key, tol=1e-9, maxiter=2000)
        n_re, _ = measure_n(upd.estimator)
        d_re, _ = measure_double_occ(upd.estimator)
        return n_re, d_re

    for _ in range(60):
        state, _ = refl(state)
        state, _ = step(state)

    key = jax.random.PRNGKey(99)
    n_acc, d_acc, x2_acc, x_acc, cnt = 0.0, 0.0, 0.0, 0.0, 0
    for i in range(300):
        state, _ = refl(state)
        state, stats = step(state)
        if i % 2 == 0:
            key, sub = jax.random.split(key)
            n, d = measure(state, sub)
            n_acc += float(n)
            d_acc += float(d)
            x = np.asarray(state.x)
            x_acc += x.mean()
            x2_acc += (x**2).mean()
            cnt += 1

    n_avg = 2 * n_acc / cnt  # spin-summed density
    d_avg = d_acc / cnt
    x_avg = x_acc / cnt
    x2_avg = x2_acc / cnt

    lam = alpha**2 / (2.0 * Omega**2)
    w = np.exp(beta * lam)
    d_exact = w / (2.0 + 2.0 * w)
    Q = np.asarray(harmonic_curvature(elph))
    sigma2 = float(np.mean(1.0 / Q))
    x2_exact = sigma2 + (alpha / Omega**2) ** 2 * w / (1.0 + w)

    np.testing.assert_allclose(n_avg, 1.0, atol=0.05)
    np.testing.assert_allclose(d_avg, d_exact, rtol=0.15)
    np.testing.assert_allclose(x2_avg, x2_exact, rtol=0.15)
    assert abs(x_avg) < 0.3 * np.sqrt(x2_exact)
