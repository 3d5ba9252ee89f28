from .mps import read_mps, MpsData
from .standard_form import (
    TwoSidedQpProblem,
    transform_to_standard_form,
    two_sided_rows_to_slacks,
    qps_reader_to_standard_form,
)

__all__ = [
    "read_mps",
    "MpsData",
    "TwoSidedQpProblem",
    "transform_to_standard_form",
    "two_sided_rows_to_slacks",
    "qps_reader_to_standard_form",
]
