from .greens_estimator import GreensEstimator, update_greens_estimator
from .scalar import measure_n, measure_Nsqrd, measure_double_occ

__all__ = [
    "GreensEstimator",
    "update_greens_estimator",
    "measure_n",
    "measure_Nsqrd",
    "measure_double_occ",
]
