"""Blocked right-looking Gauss-Jordan: MXU rank-b trailing updates.

The performance path for large N (BASELINE.md configs[1], 4096^2). The
reference's ``fixColumnKernel`` performs the O(N^2) rank-1 trailing update
once per iteration, N times (``matrix_inversion_FP32.cpp:17-63``) -- pure
bandwidth-bound vector work. On TPU the same total 4*N^3 flops are regrouped
into N/b panel steps whose trailing update is one (m x b) @ (b x 2m) rank-b
GEMM on the MXU, turning the algorithm compute-bound.

Per panel k (pivot columns kb .. kb+b-1):

1. *Panel pivot search*: a pivoted Gauss-Jordan pass over the (m x b) strip
   alone determines the b pivot rows -- the blocked generalization of the
   reference's two-stage workgroup-partial argmax (FP32.cpp:68-142). Only the
   permutation escapes this pass.
2. *Row permutation*: one gather applies the b row swaps lazily (the
   reference's pivotElementsKernel, amortized b-fold).
3. *Block elimination*: with D = aug[kb:kb+b, kb:kb+b] after permutation,
   S = D^-1 @ aug[kb:kb+b, :] (small fused inverse + GEMM), then
   aug -= L @ S for all rows outside the block (rank-b MXU GEMM) and the
   block rows become S. In exact arithmetic this equals the b sequential
   pivoted eliminations (standard blocked-pivoting identity).

All shapes are static across panels (GJ updates full height / full width),
so the panel loop is a single ``lax.fori_loop`` -- no dynamic shapes, no
recompilation, one XLA program.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from gpu_matrix_inversion_tpu.ops.gauss_jordan import _gauss_jordan_aug, _i0

DEFAULT_BLOCK_SIZE = 256


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _panel_pivots(strip: jax.Array, kb: jax.Array, *, m: int, b: int,
                  pivot: bool):
    """Run pivoted GJ on the (m, b) strip; return (perm, ok).

    ``perm`` is the length-m row permutation accumulated from the b partial
    pivots (pivot for panel column r chosen among rows >= kb+r after the
    previous panel columns' eliminations, exactly as unblocked GJ would).
    """
    rows = lax.broadcasted_iota(jnp.int32, (m,), 0)
    perm0 = rows

    def step(r, carry):
        w, perm, ok = carry
        r = r.astype(jnp.int32)
        g = kb + r
        col = lax.dynamic_slice(w, (_i0, r), (m, 1))[:, 0]
        if pivot:
            cand = jnp.where(rows >= g, jnp.abs(col), jnp.full_like(col, -1))
            p = jnp.argmax(cand).astype(jnp.int32)
        else:
            p = g
        piv = lax.dynamic_slice(col, (p,), (1,))[0]
        ok = jnp.logical_and(ok, piv != 0)
        piv_safe = jnp.where(piv == 0, jnp.ones_like(piv), piv)

        row_g = lax.dynamic_slice(w, (g, _i0), (1, b))
        row_p = lax.dynamic_slice(w, (p, _i0), (1, b))
        if pivot:
            w = lax.dynamic_update_slice(w, row_g, (p, _i0))
            w = lax.dynamic_update_slice(w, row_p, (g, _i0))
            pg = lax.dynamic_slice(perm, (g,), (1,))
            pp = lax.dynamic_slice(perm, (p,), (1,))
            perm = lax.dynamic_update_slice(perm, pg, (p,))
            perm = lax.dynamic_update_slice(perm, pp, (g,))
            col_at_g = lax.dynamic_slice(col, (g,), (1,))[0]
            col = jnp.where(rows == g, piv, jnp.where(rows == p, col_at_g, col))
            pivot_row = row_p
        else:
            pivot_row = row_g

        norm_row = pivot_row / piv_safe
        factors = jnp.where(rows == g, jnp.zeros_like(col), col)[:, None]
        w = w - factors * norm_row
        w = lax.dynamic_update_slice(w, norm_row, (g, _i0))
        return w, perm, ok

    _, perm, ok = lax.fori_loop(0, b, step, (strip, perm0, jnp.bool_(True)))
    return perm, ok


def _blocked_gj(a: jax.Array, *, pivot: bool, b: int):
    n = a.shape[-1]
    m = max(_round_up(n, b), b)
    dtype = a.dtype

    # Pad to blockdiag(A, I): inverse is blockdiag(inv(A), I); padded rows
    # are all-zero in real columns so they never win a pivot.
    if m != n:
        apad = jnp.eye(m, dtype=dtype)
        apad = lax.dynamic_update_slice(apad, a, (0, 0))
        # Zero the identity diagonal inside the real region was overwritten
        # by the update slice; the tail diag stays 1.
        a = apad
    aug = jnp.concatenate([a, jnp.eye(m, dtype=dtype)], axis=-1)  # (m, 2m)

    rows = lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    num_panels = m // b

    def panel_step(k, carry):
        aug, ok = carry
        kb = k.astype(jnp.int32) * b
        strip = lax.dynamic_slice(aug, (_i0, kb), (m, b))
        perm, ok_p = _panel_pivots(strip, kb, m=m, b=b, pivot=pivot)
        aug = jnp.take(aug, perm, axis=0)

        block_rows = lax.dynamic_slice(aug, (kb, _i0), (b, 2 * m))
        dblk = lax.dynamic_slice(block_rows, (_i0, kb), (b, b))
        # Pivot-block inverse via the (no-pivot-needed? keep pivoted) GJ spec:
        # the panel permutation already made dblk's sequential pivots the
        # largest available, but a pivoted small inverse costs the same.
        dinv, ok_d = _gauss_jordan_aug(dblk, pivot=pivot)
        s = jnp.matmul(dinv, block_rows, preferred_element_type=dtype,
                        precision=jax.lax.Precision.HIGHEST)

        panel_cols = lax.dynamic_slice(aug, (_i0, kb), (m, b))
        in_block = jnp.logical_and(rows >= kb, rows < kb + b)
        l_masked = jnp.where(in_block, jnp.zeros_like(panel_cols), panel_cols)
        # The rank-b MXU trailing update (replaces b fixColumnKernel passes).
        aug = aug - jnp.matmul(l_masked, s, preferred_element_type=dtype,
                        precision=jax.lax.Precision.HIGHEST)
        aug = lax.dynamic_update_slice(aug, s, (kb, _i0))
        return aug, jnp.logical_and(ok, jnp.logical_and(ok_p, ok_d))

    aug, ok = lax.fori_loop(0, num_panels, panel_step, (aug, jnp.bool_(True)))
    inv = lax.dynamic_slice(aug, (_i0, np.int32(m)), (m, m))[:n, :n]
    ok = jnp.logical_and(ok, jnp.all(jnp.isfinite(inv)))
    return inv, ok


@functools.partial(jax.jit, static_argnames=("pivot", "block_size"))
def blocked_inverse(a: jax.Array, *, pivot: bool = True,
                    block_size: int = DEFAULT_BLOCK_SIZE):
    """Blocked Gauss-Jordan inverse; ``(..., n, n) -> (inverse, ok)``."""
    if a.ndim < 2 or a.shape[-1] != a.shape[-2]:
        raise ValueError(f"expected (..., n, n) square matrix, got {a.shape}")
    b = min(block_size, max(_round_up(a.shape[-1], 8), 8))
    fn = functools.partial(_blocked_gj, pivot=pivot, b=b)
    for _ in range(a.ndim - 2):
        fn = jax.vmap(fn)
    return fn(a)
