"""Precision refinement: FP32 factorizations to FP64-level residuals.

FP64 on TPU is software-emulated and slow (SURVEY.md section 7, hard part c),
so the TPU-native answer to the reference's FP64 path is *mixed precision*:
factor/invert in FP32 on the MXU, then tighten the residual with

- **Newton-Schulz iteration** ``X <- X + X @ (I - A @ X)``: each step squares
  the residual (quadratic convergence), costs 2 GEMMs -- pure MXU work.
- **Iterative refinement** for solves: residual in higher precision, cheap
  LU re-solve for the correction (the classic LAPACK sgesv/dsgesv scheme).

With ``residual_dtype=float64`` (requires x64; emulated on TPU, native on
CPU) the refined FP32 inverse reaches FP64-level residuals on the
ill-conditioned test set (BASELINE.md configs[3]).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("iters", "residual_dtype"))
def newton_schulz_refine(a: jax.Array, x: jax.Array, *, iters: int = 2,
                         residual_dtype=None):
    """Refine an approximate inverse ``x`` of ``a`` by Newton-Schulz steps.

    Returns the refined inverse in ``residual_dtype`` (or ``x.dtype``).
    """
    rd = jnp.dtype(residual_dtype) if residual_dtype is not None else x.dtype
    n = a.shape[-1]
    eye = jnp.eye(n, dtype=rd)
    a_h = a.astype(rd)
    # MISCOMPILE GUARD (measured on v5e, jax 0.9.0): when the approximate
    # inverse is consumed ONLY by this refine (its array never escaping the
    # jit program), XLA:TPU restructures the producer's gather/slice/select
    # chain into the refine GEMMs and the refined residual degrades ~4
    # orders of magnitude (n=1950 hollow: 3e-8 -> 1.7e-4), data-dependently
    # and TPU-only -- returning the intermediate from the same program, or
    # this barrier, restores the exact result bit-for-bit. The barrier only
    # pins a fusion boundary; it costs nothing against the O(n^3) GEMMs.
    x = jax.lax.optimization_barrier(x)
    x_h = x.astype(rd)
    # The residual GEMM must be exact-f32 (HIGHEST: TPU f32 matmul defaults
    # to bf16 passes); the correction GEMM X @ R can run one tier down --
    # its bf16x3 error is relative to ||X||*||R|| ~ residual-sized, i.e.
    # ~1e-4 * residual in the refined result, far below the step's own
    # quadratic convergence floor. Saves ~1/4 of the polish cost on v5e.
    corr_prec = (jax.lax.Precision.HIGH if rd == jnp.float32
                 else jax.lax.Precision.HIGHEST)
    for _ in range(iters):
        r = eye - jnp.matmul(a_h, x_h, preferred_element_type=rd,
                        precision=jax.lax.Precision.HIGHEST)
        x_h = x_h + jnp.matmul(x_h, r, preferred_element_type=rd,
                        precision=corr_prec)
    return x_h


@functools.partial(jax.jit, static_argnames=("iters", "residual_dtype"))
def refine_solve(a: jax.Array, b: jax.Array, x: jax.Array, lu: jax.Array,
                 perm: jax.Array, *, iters: int = 3, residual_dtype=None):
    """Iterative refinement of a solve ``A x = b`` given the FP32 LU factors.

    The residual is computed in ``residual_dtype`` (default: x.dtype); the
    correction re-uses the cheap FP32 factorization (LAPACK dsgesv pattern).
    """
    from gpu_matrix_inversion_tpu.ops.lu import lu_solve

    rd = jnp.dtype(residual_dtype) if residual_dtype is not None else x.dtype
    b_h = b.astype(rd)
    a_h = a.astype(rd)
    # Same XLA:TPU dead-intermediate miscompile guard as
    # newton_schulz_refine: the initial solve and each correction reach
    # this loop through gather chains (permutation rows in lu_solve).
    x_h = jax.lax.optimization_barrier(x).astype(rd)
    for _ in range(iters):
        r = b_h - jnp.matmul(a_h, x_h, preferred_element_type=rd,
                        precision=jax.lax.Precision.HIGHEST)
        d, _ = lu_solve(lu, perm, r.astype(x.dtype))
        x_h = x_h + jax.lax.optimization_barrier(d).astype(rd)
    return x_h


def lu_inverse_refined(a: jax.Array, *, iters: int = 2, residual_dtype=None):
    """FP32 LU inverse + Newton-Schulz refinement; returns ``(inv, ok)``.

    The BASELINE.md configs[3] path: FP32 factor, FP64-level residual.
    """
    from gpu_matrix_inversion_tpu.ops.lu import lu_inverse

    x0, ok = lu_inverse(a.astype(jnp.float32))
    x = newton_schulz_refine(a, x0, iters=iters, residual_dtype=residual_dtype)
    ok = jnp.logical_and(ok, jnp.all(jnp.isfinite(x), axis=(-2, -1)))
    return x, ok
