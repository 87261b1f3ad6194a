"""Host-side utilities: validation, matrix generators, residuals, timing."""

from gpu_matrix_inversion_tpu.utils.validation import validate_flat_matrix
from gpu_matrix_inversion_tpu.utils.generators import (
    hollow_random_matrix,
    random_matrix,
    well_conditioned_matrix,
    ill_conditioned_matrix,
)
from gpu_matrix_inversion_tpu.utils.residual import (
    relative_residual,
    reference_error_metric,
)
from gpu_matrix_inversion_tpu.utils.res import Res, PhaseTimer
from gpu_matrix_inversion_tpu.utils.config import InversionConfig
from gpu_matrix_inversion_tpu.utils.determinism import check_deterministic
from gpu_matrix_inversion_tpu.utils.profiling import (
    trace,
    device_info,
    print_phase_report,
)

__all__ = [
    "InversionConfig",
    "check_deterministic",
    "trace",
    "device_info",
    "print_phase_report",
    "validate_flat_matrix",
    "hollow_random_matrix",
    "random_matrix",
    "well_conditioned_matrix",
    "ill_conditioned_matrix",
    "relative_residual",
    "reference_error_metric",
    "Res",
    "PhaseTimer",
]
