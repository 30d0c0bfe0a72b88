"""Uniform preconditioner interface: build / refresh / apply for either the
bucketed-Chebyshev KPM preconditioner (ops/kpm.py) or the exact spectral
preconditioner (ops/spectral_precond.py)."""

from __future__ import annotations

from typing import Optional

from .fermion_det import FermionDetMatrix
from .kpm import KPMPreconditioner, kpm_update
from .spectral_precond import SpectralPreconditioner, build_spectral, spectral_update


def build_preconditioner(kind: Optional[str], fdm: FermionDetMatrix, key):
    """kind: 'spectral' (default for symmetric), 'kpm', or None."""
    if kind is None or kind == "none":
        return None
    if kind == "spectral":
        return build_spectral(fdm)
    if kind == "kpm":
        return KPMPreconditioner.build(fdm, key)
    raise ValueError(f"unknown preconditioner kind {kind!r}")


def refresh_preconditioner(precond, fdm: FermionDetMatrix, key):
    """Pure update of whichever preconditioner is carried in the chain state."""
    if precond is None:
        return None
    if isinstance(precond, SpectralPreconditioner):
        return spectral_update(precond, fdm, key)
    return kpm_update(precond, fdm, key)
