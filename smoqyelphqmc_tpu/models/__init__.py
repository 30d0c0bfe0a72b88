from .tight_binding import TightBindingModel, TightBindingParameters
from .electron_phonon import (
    PhononMode,
    HolsteinCoupling,
    SSHCoupling,
    DispersionCoupling,
    ElectronPhononModel,
    ElectronPhononParameters,
)
from .fermion_path_integral import FermionPathIntegral, build_path_integral

__all__ = [
    "TightBindingModel",
    "TightBindingParameters",
    "PhononMode",
    "HolsteinCoupling",
    "SSHCoupling",
    "DispersionCoupling",
    "ElectronPhononModel",
    "ElectronPhononParameters",
    "FermionPathIntegral",
    "build_path_integral",
]
