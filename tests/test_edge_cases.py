"""Edge-case guards: empty global-update candidate sets, invalid current-bond
ids, and config-knob plumbing.

The reference would crash deep inside `_sample_phonon_mode` /
`fermion_path_integral.t` lookups on these inputs; this framework raises a
named error at the API boundary instead (reflection_update.jl:55,
swap_update.jl:54, Correlations/current.jl:2-73)."""

import numpy as np
import pytest

from smoqyelphqmc_tpu import (
    Bond,
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
from smoqyelphqmc_tpu.updates import initialize_qmc
from smoqyelphqmc_tpu.updates.global_updates import (
    radial_update,
    reflection_update,
    swap_update,
)

from _models import chain_model


def _frozen_chain(L=4, beta=0.5, dtau=0.1):
    """Holstein chain whose ONLY phonon mode is frozen (M = inf)."""
    uc = UnitCell(lattice_vecs=[[1.0]], basis_vecs=[[0.0]])
    lat = Lattice(L=[L], periodic=[True])
    geo = ModelGeometry(uc, lat)
    bond = Bond(orbitals=(0, 0), displacement=[1])
    geo.add_bond(bond)
    tbm = TightBindingModel(model_geometry=geo, t_bonds=[bond], t_mean=[1.0], eps_mean=[0.0], mu=0.0)
    em = ElectronPhononModel(model_geometry=geo, tight_binding_model=tbm)
    pid = em.add_phonon_mode(PhononMode(basis_vec=[0.0], Omega_mean=1.0, M=np.inf))
    em.add_holstein_coupling(
        HolsteinCoupling(phonon_id=pid, orbital_id=0, displacement=[0], alpha_mean=0.4, ph_sym_form=True)
    )
    rng = np.random.default_rng(0)
    tbp = TightBindingParameters.from_model(tbm, rng)
    elph = ElectronPhononParameters.from_model(beta, dtau, em, tbp, rng)
    return tbp, elph


def test_reflection_raises_on_all_frozen():
    tbp, elph = _frozen_chain()
    ctx, state = initialize_qmc(tbp, elph, seed=0, tol=1e-8, use_preconditioner=False)
    with pytest.raises(ValueError, match="no unfrozen phonon modes"):
        reflection_update(ctx, state)


def test_reflection_raises_on_bad_type_restriction():
    geo, tbm, tbp, em, elph = chain_model(L=4, beta=0.5)
    ctx, state = initialize_qmc(tbp, elph, seed=0, tol=1e-8, use_preconditioner=False)
    # phonon type 5 does not exist -> named error, not a raw IndexError
    with pytest.raises(ValueError, match="out of range"):
        reflection_update(ctx, state, phonon_types=[5])


def test_swap_raises_on_all_frozen():
    tbp, elph = _frozen_chain()
    ctx, state = initialize_qmc(tbp, elph, seed=0, tol=1e-8, use_preconditioner=False)
    with pytest.raises(ValueError, match="no unfrozen phonon-type pairs"):
        swap_update(ctx, state)


def test_radial_on_all_frozen_is_identity_or_raises():
    """Radial update with d = 0 live fields has no degrees of freedom; the
    framework must not emit NaN (gamma ~ N(0, sigma/sqrt(d)) divides by d)."""
    tbp, elph = _frozen_chain()
    ctx, state = initialize_qmc(tbp, elph, seed=0, tol=1e-8, use_preconditioner=False)
    try:
        new_state, stats = radial_update(ctx, state)
    except ValueError:
        return  # a named refusal is acceptable
    x_new = np.asarray(new_state.x)
    assert np.all(np.isfinite(x_new))
    np.testing.assert_allclose(x_new, np.asarray(state.x))


def test_current_correlation_rejects_non_t_bond():
    """Requesting a current correlation on a bond id that is not a hopping bond
    must raise a named error, not silently fall back to pos = bond_id."""
    from smoqyelphqmc_tpu.measure.container import MeasurementSpec
    from smoqyelphqmc_tpu.measure.greens_estimator import (
        build_greens_estimator,
        update_greens_estimator,
    )
    import jax

    geo, tbm, tbp, em, elph = chain_model(L=4, beta=0.5)
    # add a second bond that is NOT a hopping bond of the tight-binding model
    extra = Bond(orbitals=(0, 0), displacement=[2])
    extra_id = geo.add_bond(extra)
    ctx, state = initialize_qmc(tbp, elph, seed=0, tol=1e-8, use_preconditioner=False)

    spec = MeasurementSpec(geo)
    spec.add_correlation("current", pairs=[(extra_id, extra_id)])

    est = build_greens_estimator(elph.Ltau, geo.n_orbitals, geo.L, Nrv=2)
    from smoqyelphqmc_tpu.updates.context import make_fdm
    from smoqyelphqmc_tpu.measure.container import make_measurements

    fdm = make_fdm(ctx, state.x)
    est = update_greens_estimator(est, fdm, jax.random.PRNGKey(0)).estimator

    with pytest.raises(ValueError, match="not a\\s+hopping"):
        make_measurements(ctx, spec, est, state.x)
