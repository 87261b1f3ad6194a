"""Compute kernels: pure-jnp executable specs and Pallas TPU kernels."""

from gpu_matrix_inversion_tpu.ops.gauss_jordan import (
    gauss_jordan_inverse,
    gauss_jordan_inverse_no_pivot,
)
from gpu_matrix_inversion_tpu.ops.lu import (
    lu_factor,
    lu_factor_blocked,
    lu_solve,
    lu_solve_fast,
    lu_inverse,
    lu_inverse_fast,
    invert_triangular,
    det,
    slogdet,
    cond_estimate,
)
from gpu_matrix_inversion_tpu.ops.cholesky import (
    cholesky_factor,
    cholesky_solve,
    cholesky_inverse,
)
from gpu_matrix_inversion_tpu.ops.refine import (
    newton_schulz_refine,
    lu_inverse_refined,
)

__all__ = [
    "gauss_jordan_inverse",
    "gauss_jordan_inverse_no_pivot",
    "lu_factor",
    "lu_factor_blocked",
    "lu_solve",
    "lu_solve_fast",
    "lu_inverse",
    "lu_inverse_fast",
    "invert_triangular",
    "det",
    "slogdet",
    "cholesky_factor",
    "cholesky_solve",
    "cholesky_inverse",
    "cond_estimate",
    "newton_schulz_refine",
    "lu_inverse_refined",
]
