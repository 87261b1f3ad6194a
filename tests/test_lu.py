"""Tests of the LU (getrf/getrs/getri) path and mixed-precision refinement
(the LAPACK-shaped path the reference concedes to, README.md:62)."""

import numpy as np

from gpu_matrix_inversion_tpu.ops.lu import (
    lu_factor,
    lu_solve,
    lu_inverse,
    lu_solve_matrix,
)
from gpu_matrix_inversion_tpu.ops.refine import (
    lu_inverse_refined,
    newton_schulz_refine,
)
from gpu_matrix_inversion_tpu.utils.generators import (
    hollow_random_matrix,
    ill_conditioned_matrix,
)
from gpu_matrix_inversion_tpu.utils.residual import relative_residual


def test_lu_factor_reconstructs():
    n = 48
    a = hollow_random_matrix(n, seed=50, dtype=np.float64)
    lu, perm, ok = lu_factor(a)
    assert bool(ok)
    lu = np.asarray(lu)
    perm = np.asarray(perm)
    l = np.tril(lu, -1) + np.eye(n)
    u = np.triu(lu)
    pa = a[perm]
    np.testing.assert_allclose(l @ u, pa, rtol=1e-10, atol=1e-8)


def test_lu_solve_vs_numpy():
    n = 64
    a = hollow_random_matrix(n, seed=51, dtype=np.float64)
    b = np.random.default_rng(0).standard_normal((n, 3))
    x, ok = lu_solve_matrix(a, b)
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(a, b),
                               rtol=1e-8, atol=1e-8)


def test_lu_inverse():
    n = 96
    a = hollow_random_matrix(n, seed=52)
    inv, ok = lu_inverse(a)
    assert bool(ok)
    assert relative_residual(a, np.asarray(inv)) < 1e-4


def test_lu_singular_flagged():
    a = np.ones((16, 16), dtype=np.float32)
    _, ok = lu_inverse(a)
    assert not bool(ok)


def test_lu_batched():
    a = np.stack([hollow_random_matrix(32, seed=s, dtype=np.float64)
                  for s in (53, 54)])
    lu, perm, ok = lu_factor(a)
    assert lu.shape == a.shape and perm.shape == (2, 32) and ok.shape == (2,)
    inv, ok2 = lu_inverse(a)
    assert bool(np.all(np.asarray(ok2)))


def test_refined_inverse_reaches_fp64_residual():
    # BASELINE.md configs[3]: FP32 factor + refinement -> FP64-level residual
    # on an ill-conditioned matrix.
    n = 128
    a = ill_conditioned_matrix(n, cond=1e4, seed=55, dtype=np.float64)
    x32, ok = lu_inverse(a.astype(np.float32))
    assert bool(ok)
    raw = relative_residual(a, np.asarray(x32, dtype=np.float64))
    x = lu_inverse_refined(a, iters=4, residual_dtype=np.float64)[0]
    refined = relative_residual(a, np.asarray(x))
    assert refined < 1e-10
    assert refined < raw / 10


def test_newton_schulz_improves():
    n = 64
    a = hollow_random_matrix(n, seed=56)
    x0, _ = lu_inverse(a)
    x1 = newton_schulz_refine(a.astype(np.float64),
                              np.asarray(x0, dtype=np.float64), iters=2,
                              residual_dtype=np.float64)
    assert relative_residual(a, np.asarray(x1)) < 1e-10


def test_lu_no_pivot_on_dominant_diagonal():
    from gpu_matrix_inversion_tpu.utils.generators import (
        well_conditioned_matrix)
    a = well_conditioned_matrix(48, seed=57, dtype=np.float64)
    lu, perm, ok = lu_factor(a, pivot=False)
    assert bool(ok)
    np.testing.assert_array_equal(np.asarray(perm), np.arange(48))
    x, ok2 = lu_solve(lu, perm, np.eye(48))
    assert bool(ok2)
    assert relative_residual(a, np.asarray(x)) < 1e-10


def test_cond_estimate():
    from gpu_matrix_inversion_tpu.ops.lu import cond_estimate
    from gpu_matrix_inversion_tpu.utils.generators import (
        ill_conditioned_matrix)
    a = ill_conditioned_matrix(128, cond=1e4, seed=58, dtype=np.float64)
    inv = np.linalg.inv(a)
    est = float(cond_estimate(a, inv, iters=16))
    true = np.linalg.cond(a)
    assert 0.3 * true < est < 3 * true
