"""Auxiliary-subsystem tests: dispersion couplings, Nsqrd oracle, checkpoint
round-trip, mu tuner convergence, asymmetric-KPM HMC."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from smoqyelphqmc_tpu import (
    Bond,
    DispersionCoupling,
    ElectronPhononModel,
    ElectronPhononParameters,
    HolsteinCoupling,
    Lattice,
    ModelGeometry,
    PhononMode,
    TightBindingModel,
    TightBindingParameters,
    UnitCell,
)
from smoqyelphqmc_tpu.io.checkpoint import read_checkpoint, write_checkpoint
from smoqyelphqmc_tpu.measure.greens_estimator import build_greens_estimator, update_greens_estimator
from smoqyelphqmc_tpu.measure.scalar import measure_Nsqrd, measure_double_occ, measure_n
from smoqyelphqmc_tpu.ops.bosonic import add_dispersive_force, bosonic_action
from smoqyelphqmc_tpu.ops.fermion_det import dense_M
from smoqyelphqmc_tpu.updates import HMCParams, hmc_update, initialize_qmc, make_fdm
from smoqyelphqmc_tpu.updates.mu_tuner import init_mu_tuner, mu_tuner_update

from _models import chain_model, honeycomb_model


def _dispersive_chain(L=4, beta=1.0, dtau=0.1, Omega=1.0, alpha=0.4, Omega_d=0.5):
    uc = UnitCell(lattice_vecs=[[1.0]], basis_vecs=[[0.0]])
    lat = Lattice(L=[L])
    geo = ModelGeometry(uc, lat)
    bond = Bond(orbitals=(0, 0), displacement=[1])
    geo.add_bond(bond)
    tbm = TightBindingModel(geo, [bond], [1.0], [0.0], mu=0.0)
    em = ElectronPhononModel(geo, tbm)
    p = em.add_phonon_mode(PhononMode([0.0], Omega))
    em.add_holstein_coupling(HolsteinCoupling(p, 0, [0], alpha, ph_sym_form=True))
    em.add_dispersion_coupling(DispersionCoupling(phonon_ids=(p, p), displacement=[1], Omega_mean=Omega_d))
    rng = np.random.default_rng(0)
    tbp = TightBindingParameters.from_model(tbm, rng)
    elph = ElectronPhononParameters.from_model(beta, dtau, em, tbp, rng)
    return geo, tbp, elph


def test_dispersive_action_and_force(rng):
    geo, tbp, elph = _dispersive_chain()
    x = jnp.asarray(rng.standard_normal(elph.x.shape))
    S = float(bosonic_action(elph, x))
    assert np.isfinite(S) and S > 0
    # finite-difference check of the dispersive force
    f = np.asarray(add_dispersive_force(jnp.zeros_like(x), elph, x))
    h = 1e-6
    xn = np.asarray(x)
    for (p, l) in [(0, 0), (2, 3)]:
        dx = np.zeros_like(xn)
        dx[p, l] = h

        def Sdisp(xv):
            from smoqyelphqmc_tpu.ops.bosonic import _reduced_mass

            mr = _reduced_mass(elph)
            d = xv[elph.disp_to_phonon[1], :] - xv[elph.disp_to_phonon[0], :]
            return float(
                jnp.sum(
                    elph.dtau
                    * (0.5 * mr[:, None] * elph.disp_Omega[:, None] ** 2 * d**2
                       + elph.disp_Omega4[:, None] * d**4)
                )
            )

        fd = (Sdisp(jnp.asarray(xn + dx)) - Sdisp(jnp.asarray(xn - dx))) / (2 * h)
        np.testing.assert_allclose(f[p, l], fd, rtol=1e-5, atol=1e-9)


def test_dispersive_hmc_runs():
    geo, tbp, elph = _dispersive_chain()
    ctx, state = initialize_qmc(tbp, elph, seed=0, tol=1e-8)
    step = jax.jit(lambda s: hmc_update(ctx, s, HMCParams(Nt=4)))
    for _ in range(3):
        state, stats = step(state)
        assert bool(stats.converged)


def test_Nsqrd_against_dense(rng):
    """<N^2> estimator vs exact Wick value from dense M^{-1} (alpha = 0 so the
    configuration is fixed): N = 2 sum_i n_i,
    <N^2> = <N>^2 + 2 sum_ij [delta_ij G_ji - G_ji G_ij] (spin-summed)."""
    geo, tbm, tbp, _, elph = chain_model(L=3, beta=0.6, dtau=0.2, alpha=0.0, mu=0.2)
    ctx, state = initialize_qmc(tbp, elph, seed=0, tol=1e-12, use_preconditioner=False)
    fdm = make_fdm(ctx, state.x)
    est = build_greens_estimator(elph.Ltau, geo.n_orbitals, geo.L, Nrv=80)
    upd = update_greens_estimator(est, fdm, jax.random.PRNGKey(5), tol=1e-12, maxiter=4000)
    est = upd.estimator
    Ltau, N = fdm.Ltau, fdm.n_sites
    Ginv = np.linalg.inv(dense_M(fdm))
    # equal-time Green's functions G(l)_{ij} = Ginv[(l,i),(l,j)]
    G = Ginv.reshape(Ltau, N, Ltau, N)
    Gt = np.stack([G[l, :, l, :] for l in range(Ltau)])  # (Ltau, N, N)
    n_exact = 1 - np.trace(Gt, axis1=1, axis2=2).mean() / N
    Nmean = 2 * n_exact * N
    # fluctuation term per slice, averaged over slices (estimator measures the
    # tau-averaged equal-time quantity)
    fluct = 0.0
    for l in range(Ltau):
        g = Gt[l]
        fluct += 2 * (np.trace(g) - np.sum(g * g.T))
    fluct /= Ltau
    Nsq_exact = Nmean**2 + fluct
    Nsq_re, Nsq_im = measure_Nsqrd(est)
    np.testing.assert_allclose(float(Nsq_re), Nsq_exact, rtol=0.1)


def test_checkpoint_roundtrip(tmp_path):
    tree = {"x": jnp.arange(6.0).reshape(2, 3), "key": jax.random.PRNGKey(3), "n": 17}
    stamp = write_checkpoint(str(tmp_path), tree, pID=0)
    assert stamp is not None
    cp = read_checkpoint(str(tmp_path), pID=0)
    assert cp is not None
    np.testing.assert_allclose(cp["state"]["x"], np.arange(6.0).reshape(2, 3))
    assert cp["state"]["n"] == 17


def test_mu_tuner_converges_toward_target():
    """Feed the tuner a linear model n(mu) = 1 + 0.3 (mu - 0.5); it should walk
    mu toward the mu* with n = n_target."""
    tuner = init_mu_tuner(target_density=1.2, beta=4.0, n_sites=32, initial_mu=0.0)
    rng = np.random.default_rng(0)
    for _ in range(300):
        mu = float(tuner.mu)
        n = 1.0 + 0.3 * (mu - 0.5) + 0.01 * rng.standard_normal()
        N = n * 32
        var = 0.3 * 32 / 4.0  # consistent compressibility: dN/dmu = beta var
        Nsq = N**2 + var
        tuner = mu_tuner_update(tuner, n, Nsq)
    mu_star = 0.5 + 0.2 / 0.3
    assert abs(float(tuner.mu) - mu_star) < 0.25, float(tuner.mu)


def test_asym_kpm_hmc():
    geo, tbm, tbp, _, elph = honeycomb_model(L=2, beta=1.0, dtau=0.1, alpha=0.4)
    ctx, state = initialize_qmc(tbp, elph, seed=2, tol=1e-8, symmetric=False, preconditioner="kpm")
    step = jax.jit(lambda s: hmc_update(ctx, s, HMCParams(Nt=3)))
    for _ in range(3):
        state, stats = step(state)
        assert bool(stats.converged)
