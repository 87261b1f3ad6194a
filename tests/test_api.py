"""Contract tests of the flat-vector API (reference mat_inv_32.cpp:206-215,
matrix_inversion_FP32.cpp:229-237, README.md:53-54)."""

import numpy as np

from gpu_matrix_inversion_tpu import (
    matrix_inv_32,
    matrix_inversion_fp32,
    matrix_inversion_fp64,
    matrix_inversion_no_pivots,
    fp32_bench,
    fp64_bench,
    matrix_multiply,
)
from gpu_matrix_inversion_tpu.utils.generators import (
    hollow_random_matrix,
    well_conditioned_matrix,
)
from gpu_matrix_inversion_tpu.utils.residual import relative_residual


def test_invalid_order_returns_empty():
    assert matrix_inv_32([1.0, 2.0, 3.0, 4.0], 0).size == 0
    assert matrix_inv_32([1.0, 2.0, 3.0, 4.0], -5).size == 0


def test_non_square_returns_empty():
    assert matrix_inv_32([1.0, 2.0, 3.0], 2).size == 0


def test_singular_returns_empty():
    a = np.ones((8, 8), dtype=np.float32)  # rank 1
    assert matrix_inv_32(a.reshape(-1), 8).size == 0


def test_inverse_round_trip_fp32():
    n = 48
    a = hollow_random_matrix(n, seed=7)
    out = matrix_inv_32(a.reshape(-1), n)
    assert out.shape == (n * n,)
    assert out.dtype == np.float32
    assert relative_residual(a, out.reshape(n, n)) < 1e-5
    # matrix_inversion_fp32 is the same path (headers.h:8)
    out2 = matrix_inversion_fp32(a.reshape(-1), n)
    np.testing.assert_array_equal(out, out2)


def test_inverse_fp64():
    n = 32
    a = hollow_random_matrix(n, seed=8, dtype=np.float64)
    out = matrix_inversion_fp64(a.reshape(-1), n)
    assert out.dtype == np.float64
    assert relative_residual(a, out.reshape(n, n)) < 1e-14


def test_no_pivots_contract():
    n = 32
    good = well_conditioned_matrix(n, seed=9, dtype=np.float64)
    out = matrix_inversion_no_pivots(good.reshape(-1), n)
    assert relative_residual(good, out.reshape(n, n)) < 1e-10
    hollow = hollow_random_matrix(n, seed=9, dtype=np.float64)
    assert matrix_inversion_no_pivots(hollow.reshape(-1), n).size == 0


def test_bench_returns_res():
    n = 32
    a = hollow_random_matrix(n, seed=10)
    res = fp32_bench(a.reshape(-1), n)
    assert res.ok
    assert res.inversa32 is not None and res.inversa32.size == n * n
    for key in ("buffers", "compile", "total_compute", "get_inverted", "total"):
        assert key in res.times
    assert len(res.times_vector()) == 10  # reference slot count
    res64 = fp64_bench(a.astype(np.float64).reshape(-1), n)
    assert res64.inversa64 is not None


def test_bench_invalid_input():
    res = fp32_bench([1.0], 2)
    assert not res.ok


def test_matrix_multiply_residual():
    n = 24
    a = hollow_random_matrix(n, seed=11)
    inv = matrix_inv_32(a.reshape(-1), n)
    err = matrix_multiply(inv, a.reshape(-1), n)
    # The reference's metric sqrt(N) - ||inv @ A||_F ~ 0 for a good inverse.
    assert abs(err) < 1e-2


def test_order_one_and_two():
    # Smallest orders (the reference sweep starts at N=10 but the contract
    # allows any positive order).
    out = matrix_inv_32([4.0], 1)
    np.testing.assert_allclose(out, [0.25])
    out2 = matrix_inv_32([1.0, 2.0, 3.0, 4.0], 2)
    np.testing.assert_allclose(out2.reshape(2, 2),
                               np.linalg.inv([[1.0, 2.0], [3.0, 4.0]]),
                               rtol=1e-5)


def test_accepts_2d_and_list_inputs():
    a = hollow_random_matrix(16, seed=12)
    from_2d = matrix_inv_32(a, 16)          # 2D array
    from_list = matrix_inv_32(a.reshape(-1).tolist(), 16)  # python list
    np.testing.assert_array_equal(from_2d, from_list)
