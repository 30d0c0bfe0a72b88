"""The pure-NumPy baseline matvec (bench.py:numpy_mtm) must agree with the XLA
kernel exactly — otherwise the implementation-independent `vs_numpy_baseline`
anchor in the benchmark JSON times a different computation."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def test_numpy_mtm_matches_xla():
    from bench import build_case, numpy_mtm

    fdm = build_case(L=3, beta=2.0)  # small: Ltau=40, N=18
    mtm_np = numpy_mtm(fdm)
    v = np.random.default_rng(3).standard_normal((2, fdm.Ltau, fdm.n_sites))
    got = mtm_np(v)
    import jax.numpy as jnp

    want = np.asarray(fdm.mul_MtM(jnp.asarray(v)))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_numpy_baseline_runs():
    from bench import bench_matvecs_numpy

    rate = bench_matvecs_numpy(n_iters=2)
    assert rate > 0
