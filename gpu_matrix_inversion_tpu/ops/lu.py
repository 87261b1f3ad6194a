"""LU factorization + getri-style inversion and solves.

The reference *loses* to NumPy/MATLAB because "they utilize LAPACK's LU
Decompositions which is more efficient than Gauss Jordan"
(``/root/reference/README.md:62``). This module is the LAPACK-shaped path the
reference never built: partial-pivoted LU (getrf), triangular solves (getrs),
explicit inversion (getri), and FP32-factor + iterative-refinement to reach
FP64-level residuals (BASELINE.md configs[3]).

Spec-level implementation in pure jnp with static shapes (fori_loop +
dynamic_slice); the blocked/Pallas acceleration reuses the machinery in
``ops/blocked.py``. Storage convention matches LAPACK: L (unit lower) and U
packed in one matrix, plus a row-permutation vector (PA = LU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from gpu_matrix_inversion_tpu.ops.gauss_jordan import _i0


def _lu_factor_2d(a: jax.Array, *, pivot: bool = True):
    n = a.shape[-1]
    rows1 = lax.broadcasted_iota(jnp.int32, (n,), 0)
    sub = lax.broadcasted_iota(jnp.int32, (n, n), 0)
    lane = lax.broadcasted_iota(jnp.int32, (n, n), 1)
    perm0 = rows1

    def step(r, carry):
        lu, perm, ok = carry
        r = r.astype(jnp.int32)
        col = lax.dynamic_slice(lu, (_i0, r), (n, 1))[:, 0]
        if pivot:
            cand = jnp.where(rows1 >= r, jnp.abs(col), jnp.full_like(col, -1))
            p = jnp.argmax(cand).astype(jnp.int32)
        else:
            p = r
        piv = lax.dynamic_slice(col, (p,), (1,))[0]
        ok = jnp.logical_and(ok, piv != 0)
        piv_safe = jnp.where(piv == 0, jnp.ones_like(piv), piv)

        if pivot:
            row_r = lax.dynamic_slice(lu, (r, _i0), (1, n))
            row_p = lax.dynamic_slice(lu, (p, _i0), (1, n))
            lu = lax.dynamic_update_slice(lu, row_r, (p, _i0))
            lu = lax.dynamic_update_slice(lu, row_p, (r, _i0))
            pg = lax.dynamic_slice(perm, (r,), (1,))
            pp = lax.dynamic_slice(perm, (p,), (1,))
            perm = lax.dynamic_update_slice(perm, pp, (r,))
            perm = lax.dynamic_update_slice(perm, pg, (p,))
            col_at_r = lax.dynamic_slice(col, (r,), (1,))[0]
            col = jnp.where(rows1 == r, piv,
                            jnp.where(rows1 == p, col_at_r, col))

        # Multipliers for rows below r.
        factors = jnp.where(rows1 > r, col / piv_safe,
                            jnp.zeros_like(col))[:, None]  # (n, 1)
        row_r = lax.dynamic_slice(lu, (r, _i0), (1, n))
        # Eliminate only the trailing columns (> r); store multipliers in
        # column r below the diagonal (LAPACK packed layout).
        update = factors * row_r
        update = jnp.where(lane > r, update, jnp.zeros_like(update))
        lu = lu - update
        lu = jnp.where(jnp.logical_and(lane == r, sub > r),
                       jnp.broadcast_to(factors, (n, n)), lu)
        return lu, perm, ok

    lu, perm, ok = lax.fori_loop(0, n, step, (a, perm0, jnp.bool_(True)))
    ok = jnp.logical_and(ok, jnp.all(jnp.isfinite(lu)))
    return lu, perm, ok


@functools.partial(jax.jit, static_argnames=("pivot",))
def lu_factor(a: jax.Array, *, pivot: bool = True):
    """getrf: returns ``(lu, perm, ok)`` with PA = LU, batched over leading
    axes. ``perm`` maps output row i to input row perm[i]."""
    if a.ndim < 2 or a.shape[-1] != a.shape[-2]:
        raise ValueError(f"expected (..., n, n) square matrix, got {a.shape}")
    batch, n = a.shape[:-2], a.shape[-1]
    a3 = a.reshape((-1, n, n))
    lu, perm, ok = jax.vmap(functools.partial(_lu_factor_2d, pivot=pivot))(a3)
    return lu.reshape(a.shape), perm.reshape(batch + (n,)), ok.reshape(batch)


def _lu_solve_2d(lu: jax.Array, perm: jax.Array, b: jax.Array):
    """getrs: solve A x = b given (lu, perm); b is (n, k)."""
    n = lu.shape[-1]
    rows = lax.broadcasted_iota(jnp.int32, (n,), 0)
    y = jnp.take(b, perm, axis=0)

    # Forward substitution, column-oriented: L is unit lower.
    def fwd(j, y):
        j = j.astype(jnp.int32)
        yj = lax.dynamic_slice(y, (j, _i0), (1, y.shape[1]))
        coll = lax.dynamic_slice(lu, (_i0, j), (n, 1))[:, 0]
        f = jnp.where(rows > j, coll, jnp.zeros_like(coll))[:, None]
        return y - f * yj

    y = lax.fori_loop(0, n, fwd, y)

    # Back substitution: U x = y.
    def bwd(t, carry):
        y, ok = carry
        j = jnp.int32(n - 1) - t.astype(jnp.int32)
        ujj = lax.dynamic_slice(lu, (j, j), (1, 1))[0, 0]
        ok = jnp.logical_and(ok, ujj != 0)
        ujj_safe = jnp.where(ujj == 0, jnp.ones_like(ujj), ujj)
        xj = lax.dynamic_slice(y, (j, _i0), (1, y.shape[1])) / ujj_safe
        colu = lax.dynamic_slice(lu, (_i0, j), (n, 1))[:, 0]
        f = jnp.where(rows < j, colu, jnp.zeros_like(colu))[:, None]
        y = y - f * xj
        y = lax.dynamic_update_slice(y, xj, (j, _i0))
        return y, ok

    y, ok = lax.fori_loop(0, n, bwd, (y, jnp.bool_(True)))
    ok = jnp.logical_and(ok, jnp.all(jnp.isfinite(y)))
    return y, ok


@jax.jit
def lu_solve(lu: jax.Array, perm: jax.Array, b: jax.Array):
    """Solve using a prior :func:`lu_factor`; returns ``(x, ok)``."""
    batch, n = lu.shape[:-2], lu.shape[-1]
    k = b.shape[-1]
    x, ok = jax.vmap(_lu_solve_2d)(lu.reshape((-1, n, n)),
                                   perm.reshape((-1, n)),
                                   b.reshape((-1, n, k)))
    return x.reshape(b.shape), ok.reshape(batch)


@jax.jit
def lu_inverse(a: jax.Array):
    """getri: explicit inverse via LU + n simultaneous solves.

    Returns ``(inverse, ok)`` -- the LAPACK-equivalent path the reference's
    README concedes to (README.md:62).
    """
    n = a.shape[-1]
    lu, perm, ok_f = lu_factor(a)
    eye = jnp.broadcast_to(jnp.eye(n, dtype=a.dtype), a.shape)
    inv, ok_s = lu_solve(lu, perm, eye)
    return inv, jnp.logical_and(ok_f, ok_s)


@jax.jit
def lu_solve_matrix(a: jax.Array, b: jax.Array):
    """One-shot solve A x = b; returns ``(x, ok)``."""
    lu, perm, ok_f = lu_factor(a)
    x, ok_s = lu_solve(lu, perm, b)
    return x, jnp.logical_and(ok_f, ok_s)
