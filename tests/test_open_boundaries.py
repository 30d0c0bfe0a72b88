"""Open (non-periodic) boundary conditions: wrapped hops carry zero amplitude
and no couplings (LatticeUtilities' open-BC capability, realized with static
array shapes by masking amplitudes)."""

import jax
import numpy as np

from smoqyelphqmc_tpu import (
    Bond,
    ElectronPhononModel,
    ElectronPhononParameters,
    HolsteinCoupling,
    Lattice,
    ModelGeometry,
    PhononMode,
    SSHCoupling,
    TightBindingModel,
    TightBindingParameters,
    UnitCell,
)
from smoqyelphqmc_tpu.models.fermion_path_integral import build_path_integral
from smoqyelphqmc_tpu.ops.checkerboard import build_checkerboard_structure
from smoqyelphqmc_tpu.ops.fermion_det import FermionDetMatrix, dense_B


def open_chain(L=4, t=1.0, mu=0.0, alpha=0.0, ssh=False, beta=0.4, dtau=0.1, seed=0):
    uc = UnitCell(lattice_vecs=[[1.0]], basis_vecs=[[0.0]])
    geo = ModelGeometry(uc, Lattice(L=[L], periodic=[False]))
    bond = Bond(orbitals=(0, 0), displacement=[1])
    geo.add_bond(bond)
    tbm = TightBindingModel(geo, [bond], [t], [0.0], mu=mu)
    em = ElectronPhononModel(geo, tbm)
    p = em.add_phonon_mode(PhononMode([0.0], 1.0))
    if ssh:
        em.add_ssh_coupling(SSHCoupling(phonon_ids=(p, p), bond=bond, alpha_mean=alpha))
    elif alpha:
        em.add_holstein_coupling(HolsteinCoupling(p, 0, [0], alpha, ph_sym_form=True))
    rng = np.random.default_rng(seed)
    tbp = TightBindingParameters.from_model(tbm, rng)
    elph = ElectronPhononParameters.from_model(beta, dtau, em, tbp, rng)
    return geo, tbm, tbp, em, elph


def test_open_chain_has_no_wrap_hop():
    geo, tbm, tbp, em, elph = open_chain(L=4, t=1.3)
    t0 = np.asarray(tbp.t0)
    assert t0.shape == (4,)
    # cells 0..2 hop to the right; cell 3's bond would wrap -> zero amplitude
    np.testing.assert_allclose(t0[:3], 1.3)
    assert t0[3] == 0.0


def test_open_chain_propagator_matches_dense_exponential():
    """B_l for the open chain equals exp(-dtau K) of the OPEN hopping matrix
    (no corner elements)."""
    geo, tbm, tbp, em, elph = open_chain(L=4, t=0.9, beta=0.2, dtau=0.1)
    st = build_checkerboard_structure(np.asarray(tbp.neighbor_table), tbp.n_sites)
    fdm = FermionDetMatrix.from_path_integral(build_path_integral(tbp, elph), st, symmetric=True)
    B = dense_B(fdm, 0)
    # exact exp(-dtau K) for the open chain (checkerboard is exact when colors
    # commute on disjoint site sets, up to Trotter error between colors)
    K = np.zeros((4, 4))
    for i in range(3):
        K[i, i + 1] = K[i + 1, i] = -0.9
    from scipy.linalg import expm

    B_exact = expm(-0.1 * K)
    # corner (0,3) must vanish identically in both
    assert B[0, 3] == 0.0 and B[3, 0] == 0.0
    np.testing.assert_allclose(B, B_exact, atol=2e-4)  # checkerboard Trotter error


def test_open_ssh_coupling_masked():
    geo, tbm, tbp, em, elph = open_chain(L=4, alpha=0.5, ssh=True)
    a = np.asarray(elph.ssh_alpha)
    np.testing.assert_allclose(a[:3], 0.5)
    assert a[3] == 0.0


def test_open_chain_hmc_runs():
    from smoqyelphqmc_tpu.updates import HMCParams, hmc_update, initialize_qmc

    geo, tbm, tbp, em, elph = open_chain(L=4, alpha=0.5, ssh=True, beta=0.5)
    ctx, state = initialize_qmc(tbp, elph, seed=0, tol=1e-8)
    state, stats = jax.jit(lambda s: hmc_update(ctx, s, HMCParams(Nt=4)))(state)
    assert bool(stats.converged)
