"""Golden tests of the pure-jnp Gauss-Jordan spec vs numpy.linalg.inv
(the reference's parity oracle, matrix_inv_numpy.py / SURVEY.md section 4)."""

import numpy as np
import pytest

from gpu_matrix_inversion_tpu.ops.gauss_jordan import (
    gauss_jordan_inverse,
    gauss_jordan_inverse_no_pivot,
)
from gpu_matrix_inversion_tpu.utils.generators import (
    hollow_random_matrix,
    well_conditioned_matrix,
)
from gpu_matrix_inversion_tpu.utils.residual import relative_residual


def test_fp32_matches_numpy():
    a = hollow_random_matrix(64, seed=1)
    inv, ok = gauss_jordan_inverse(a)
    assert bool(ok)
    assert relative_residual(a, np.asarray(inv)) < 1e-5
    np.testing.assert_allclose(np.asarray(inv), np.linalg.inv(a), rtol=2e-2,
                               atol=1e-4 * np.abs(np.linalg.inv(a)).max())


def test_fp64_matches_numpy():
    a = hollow_random_matrix(96, seed=2, dtype=np.float64)
    inv, ok = gauss_jordan_inverse(a)
    assert bool(ok)
    assert np.asarray(inv).dtype == np.float64
    assert relative_residual(a, np.asarray(inv)) < 1e-14


def test_batched():
    a = np.stack([hollow_random_matrix(32, seed=s) for s in range(4)])
    inv, ok = gauss_jordan_inverse(a)
    assert inv.shape == a.shape
    assert ok.shape == (4,)
    assert bool(np.all(np.asarray(ok)))
    for i in range(4):
        assert relative_residual(a[i], np.asarray(inv)[i]) < 1e-5


def test_singular_flagged():
    a = np.zeros((16, 16), dtype=np.float32)
    a[0, 0] = 1.0  # rank-1
    inv, ok = gauss_jordan_inverse(a)
    assert not bool(ok)


def test_no_pivot_on_dominant_diagonal():
    a = well_conditioned_matrix(48, seed=3)
    inv, ok = gauss_jordan_inverse_no_pivot(a)
    assert bool(ok)
    assert relative_residual(a, np.asarray(inv)) < 1e-5


def test_no_pivot_zero_diagonal_flagged():
    # Hollow matrix: zero diagonal breaks the no-pivot path immediately
    # (reference no_pivots assumes nonzero C[r,r], no_pivots.cpp:39-44).
    a = hollow_random_matrix(16, seed=4)
    inv, ok = gauss_jordan_inverse_no_pivot(a)
    assert not bool(ok)


def test_rejects_non_square():
    with pytest.raises(ValueError):
        gauss_jordan_inverse(np.zeros((3, 4), dtype=np.float32))
