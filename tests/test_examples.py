"""Smoke tests of every example/tutorial driver script with tiny parameters —
the reference's test strategy (one @testitem per driver script,
/root/reference/test/runtests.jl, SURVEY.md section 4)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))

# every test here runs a full (tiny) simulation end-to-end; excluded from the
# fast CI gate (pytest -m "not slow")
pytestmark = pytest.mark.slow

TINY = dict(
    sID=1, Omega=1.0, alpha=0.4, mu=0.0, beta=0.4,
    N_therm=1, N_measurements=2, N_bins=2, dtau=0.1, Nt=2, Nrv=3, tol=1e-7,
)


def _tiny(filepath, **over):
    kw = dict(TINY)
    kw.update(over)
    kw["filepath"] = str(filepath)
    return kw


def test_tutorial_holstein_honeycomb(tmp_path):
    import holstein_honeycomb

    meta = holstein_honeycomb.run(**_tiny(tmp_path, L=3))
    assert "Rcdw_mean_real" in meta and np.isfinite(meta["Rcdw_mean_real"])


def test_tutorial_holstein_honeycomb_checkpoint(tmp_path):
    import holstein_honeycomb_checkpoint

    meta = holstein_honeycomb_checkpoint.run(
        **_tiny(tmp_path, L=3, checkpoint_freq_hours=0.0, runtime_limit_hours=np.inf)
    )
    assert meta["hmc_acceptance_rate"] >= 0.0


def test_tutorial_holstein_honeycomb_density_tuning(tmp_path):
    import holstein_honeycomb_density_tuning

    kw = _tiny(tmp_path, L=3)
    kw.pop("mu")
    meta = holstein_honeycomb_density_tuning.run(n_target=1.0, **kw)
    assert np.isfinite(meta["final_mu"])


def test_tutorial_holstein_honeycomb_multiwalker(tmp_path):
    import holstein_honeycomb_multiwalker

    meta = holstein_honeycomb_multiwalker.run(**_tiny(tmp_path, L=2, n_walkers=2))
    assert meta["n_walkers"] == 2


def test_example_bssh_chain(tmp_path):
    import bssh_chain

    assert bssh_chain.run(**_tiny(tmp_path, L=4)) is not None


def test_example_bssh_square(tmp_path):
    import bssh_square

    assert bssh_square.run(**_tiny(tmp_path, L=2)) is not None


def test_example_ossh_chain(tmp_path):
    import ossh_chain

    assert ossh_chain.run(**_tiny(tmp_path, L=4)) is not None


def test_example_ossh_square(tmp_path):
    import ossh_square

    assert ossh_square.run(**_tiny(tmp_path, L=2)) is not None


def test_example_ossh_honeycomb(tmp_path):
    import ossh_honeycomb

    assert ossh_honeycomb.run(**_tiny(tmp_path, L=2)) is not None


def test_example_holstein_flux_chain(tmp_path):
    import holstein_flux_chain

    kw = _tiny(tmp_path, L=4)
    kw.pop("mu")
    meta = holstein_flux_chain.run(flux=0.5, mu=0.0, **kw)
    assert meta is not None
