"""Physical correlation functions as signed sums of Wick contractions.

Re-design of /root/reference/src/Measurements/Correlations/{density,pair,spin,
bond,current}.jl: each correlation is a composition of the three contraction
topologies of measure/greens_estimator.py with spin-degeneracy factors. Spin-up
and spin-down propagators are identical (spin-symmetric models), so total
correlations carry factors of 4 (parallel-spin combinations) and 2 (the
exchange delta(sigma, sigma') terms); spin-resolved variants drop them.

All kernels ACCUMULATE into an (re, im) pair of (Ltau+1, *L) arrays and return
the new pair."""

from __future__ import annotations

from typing import Optional, Tuple

from ..lattice import Bond
from .greens_estimator import (
    GreensEstimator,
    measure_G,
    measure_G0D_GD0,
    measure_GD0_GD0,
    measure_GDD_G00,
)
from .scalar import measure_n

Pair = Tuple


def _zero(est: GreensEstimator):
    return tuple(int(0) for _ in range(est.D))


def _acc(C, add):
    return C[0] + add[0], C[1] + add[1]


def measure_greens_correlation(
    C: Pair, est: GreensEstimator, a: int, b: int, coef: float = 1.0, cache=None
) -> Pair:
    """Time-displaced single-particle Green's function G_ab(r, tau)."""
    Gr, Gi = measure_G(est, (a, b), cache=cache)
    return C[0] + coef * Gr, C[1] + coef * Gi


def measure_density_correlation(
    C: Pair, est: GreensEstimator, a: int, b: int, coef: float = 1.0,
    spin_resolved: Optional[Tuple[int, int]] = None, cache=None,
) -> Pair:
    """Density-density correlation (density.jl:2-66)."""
    z = _zero(est)
    na_re, na_im = measure_n(est, a)
    nb_re, nb_im = measure_n(est, b)
    if spin_resolved is None:
        pref, exch = 4.0, -2.0
        same_spin = True
    else:
        pref, exch = 1.0, -1.0
        same_spin = spin_resolved[0] == spin_resolved[1]
    C = (C[0] + pref * coef * (na_re + nb_re - 1.0), C[1] + pref * coef * (na_im + nb_im))
    C = _acc(C, measure_GDD_G00(est, (a, a, b, b), z, z, z, z, pref * coef, cache=cache))
    if same_spin:
        C = _acc(C, measure_G0D_GD0(est, (b, a, a, b), z, z, z, z, exch * coef, cache=cache))
    return C


def measure_pair_correlation(
    C: Pair, est: GreensEstimator, b1: Bond, b2: Bond, coef: float = 1.0, cache=None
) -> Pair:
    """Local s-wave (bond) pair correlation (pair.jl:2-22): the bond's orbitals
    are (b, a) with displacement r', matching the reference's convention."""
    b, a = b1.orbitals
    rp = b1.displacement
    d, c = b2.orbitals
    rpp = b2.displacement
    z = _zero(est)
    return _acc(C, measure_GD0_GD0(est, (a, c, b, d), rp, rpp, z, z, coef, cache=cache))


def measure_spin_z_correlation(
    C: Pair, est: GreensEstimator, a: int, b: int, coef: float = 1.0, cache=None
) -> Pair:
    """S_z - S_z correlation (spin.jl:2-16); identical to S_x/S_y for
    spin-symmetric models."""
    z = _zero(est)
    return _acc(C, measure_G0D_GD0(est, (b, a, a, b), z, z, z, z, -0.5 * coef, cache=cache))


measure_spin_x_correlation = measure_spin_z_correlation


def measure_bond_correlation(
    C: Pair, est: GreensEstimator, b1: Bond, b2: Bond, coef: float = 1.0,
    spin_resolved: Optional[Tuple[int, int]] = None, cache=None,
) -> Pair:
    """Bond-bond (kinetic-energy) correlation: 4 GDD.G00 + 4 G0D.GD0 terms
    (bond.jl:2-132)."""
    b, a = b1.orbitals
    rp = b1.displacement
    d, c = b2.orbitals
    rpp = b2.displacement
    z = _zero(est)
    if spin_resolved is None:
        pref, exch = 4.0, -2.0
        same_spin = True
    else:
        pref, exch = 1.0, -1.0
        same_spin = spin_resolved[0] == spin_resolved[1]
    C = _acc(C, measure_GDD_G00(est, (a, b, c, d), rp, z, rpp, z, pref * coef, cache=cache))
    C = _acc(C, measure_GDD_G00(est, (a, b, d, c), rp, z, z, rpp, pref * coef, cache=cache))
    C = _acc(C, measure_GDD_G00(est, (b, a, c, d), z, rp, rpp, z, pref * coef, cache=cache))
    C = _acc(C, measure_GDD_G00(est, (b, a, d, c), z, rp, z, rpp, pref * coef, cache=cache))
    if same_spin:
        C = _acc(C, measure_G0D_GD0(est, (c, b, a, d), rpp, z, rp, z, exch * coef, cache=cache))
        C = _acc(C, measure_G0D_GD0(est, (d, b, a, c), z, z, rp, rpp, exch * coef, cache=cache))
        C = _acc(C, measure_G0D_GD0(est, (c, a, b, d), rpp, rp, z, z, exch * coef, cache=cache))
        C = _acc(C, measure_G0D_GD0(est, (d, a, b, c), z, rp, z, rpp, exch * coef, cache=cache))
    return C


def measure_current_correlation(
    C: Pair, est: GreensEstimator, b1: Bond, b2: Bond,
    t1: Pair, t2: Pair, coef: float = 1.0,
    spin_resolved: Optional[Tuple[int, int]] = None, cache=None,
) -> Pair:
    """Current-current correlation weighted by the time-dependent hopping fields
    t1, t2 of the two bonds, each an (re, im-or-None) pair of (Ltau, *L) arrays
    (current.jl:2-152)."""
    b, a = b1.orbitals
    rp = b1.displacement
    d, c = b2.orbitals
    rpp = b2.displacement
    z = _zero(est)
    if spin_resolved is None:
        pref, exch = 4.0, 2.0
        same_spin = True
    else:
        pref, exch = 1.0, 1.0
        same_spin = spin_resolved[0] == spin_resolved[1]
    C = _acc(C, measure_GDD_G00(est, (a, b, d, c), rp, z, z, rpp, +pref * coef, t1, t2, True, False))
    C = _acc(C, measure_GDD_G00(est, (a, b, c, d), rp, z, rpp, z, -pref * coef, t1, t2, True, True))
    C = _acc(C, measure_GDD_G00(est, (b, a, d, c), z, rp, z, rpp, -pref * coef, t1, t2, False, False))
    C = _acc(C, measure_GDD_G00(est, (b, a, c, d), z, rp, rpp, z, +pref * coef, t1, t2, False, True))
    if same_spin:
        C = _acc(C, measure_G0D_GD0(est, (b, a, c, d), z, z, rp, rpp, -exch * coef, t1, t2, True, False))
        C = _acc(C, measure_G0D_GD0(est, (b, a, d, c), rpp, z, rp, z, +exch * coef, t1, t2, True, True))
        C = _acc(C, measure_G0D_GD0(est, (d, a, b, c), z, rp, z, rpp, +exch * coef, t1, t2, False, False))
        C = _acc(C, measure_G0D_GD0(est, (c, a, b, d), rpp, rp, z, z, -exch * coef, t1, t2, False, True))
    return C
