"""Compute kernels: pure-jnp executable specs and Pallas TPU kernels."""

from gpu_matrix_inversion_tpu.ops.gauss_jordan import (
    gauss_jordan_inverse,
    gauss_jordan_inverse_no_pivot,
)

__all__ = [
    "gauss_jordan_inverse",
    "gauss_jordan_inverse_no_pivot",
]
