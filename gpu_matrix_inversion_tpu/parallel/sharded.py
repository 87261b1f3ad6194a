"""Panel-sharded multi-chip Gauss-Jordan inversion over an ICI mesh.

BASELINE.md configs[4]: invert N x N for N beyond single-chip HBM by
column-sharding the augmented (m, 2m) system over a mesh axis. SPMD design
(via ``shard_map``), one collective per panel:

1. *Panel gather*: the (m, b) pivot-panel strip lives on one shard; a single
   ``psum`` of a masked slice broadcasts it to every device (the TPU analog
   of the reference's pivot-row broadcast; on hardware this rides ICI).
2. *Replicated swap-free pivot search*: every device runs the strip
   factorization redundantly (identical data -> identical pivots; dedupes
   control flow, no divergence, no index exchange) -- the mesh-scale
   generalization of the reference's two-stage workgroup argmax
   (FP32.cpp:68-142).
3. *Local update*: rows never move (logical permutation; the final reorder
   is a purely local gather under column sharding). Each device computes
   S_loc = D^-1 @ block_rows_loc and one rank-2b trailing GEMM on its own
   column shard that both eliminates and deposits the scaled pivot rows.

Comm volume: one (m, b) psum per panel = m^2 floats total for the whole
inversion -- a 16384^2 FP32 inversion moves ~1 GB over ICI, far below the
compute time of its 4*N^3 = 17.6 PFLOP.

The batched variant shards batch over a ``dp`` mesh axis and columns over
``tp`` (2D mesh), i.e. data-parallel x tensor-parallel.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gpu_matrix_inversion_tpu.ops.gauss_jordan import _gauss_jordan_aug, _i0
from gpu_matrix_inversion_tpu.ops.blocked import (_panel_pivots_logical,
                                                  _round_up)
from gpu_matrix_inversion_tpu.parallel.mesh import make_device_mesh

try:  # jax >= 0.6 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def _local_gj(aug_loc: jax.Array, *, m: int, b: int, w: int, pivot: bool,
              axis: str):
    """Per-device body: aug_loc is the (m, w) local column shard.

    Logical permutation (see ops/blocked.py): rows never move, a replicated
    used-row mask keeps the pivot search honest, the panel's row placement
    is folded into the rank-2b trailing GEMM, and the caller reorders the
    inverse rows once at the end (a purely local gather under column
    sharding). Per panel the ONLY communication is the one strip psum.
    """
    dtype = aug_loc.dtype
    my = lax.axis_index(axis).astype(jnp.int32)
    rows = lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    num_panels = m // b

    def panel_step(k, carry):
        aug_loc, used, pos, ok = carry
        kb = k.astype(jnp.int32) * b
        owner = kb // w

        # 1. Panel gather: one psum broadcasts the (m, b) strip from its
        # owner shard to everyone (pivot-panel broadcast over ICI).
        off = jnp.clip(kb - my * w, 0, w - b)
        cand = lax.dynamic_slice(aug_loc, (_i0, off), (m, b))
        strip = lax.psum(jnp.where(my == owner, cand, jnp.zeros_like(cand)),
                         axis)

        # 2. Replicated swap-free pivot search (identical inputs on every
        # device -> identical pivots, no index exchange).
        pivrows, used, ok_p = _panel_pivots_logical(strip, used, kb, m=m,
                                                    b=b, pivot=pivot)
        pos = lax.dynamic_update_slice(pos, pivrows, (kb,))
        dblk = jnp.take(strip, pivrows, axis=0)
        dinv, ok_d = _gauss_jordan_aug(dblk, pivot=pivot)

        # 3. Local block elimination: one rank-2b GEMM eliminates and
        # deposits the scaled pivot rows (ops/blocked.py's [L-P | P] trick).
        block_rows = jnp.take(aug_loc, pivrows, axis=0)  # (b, w) local
        s_loc = jnp.matmul(dinv, block_rows, preferred_element_type=dtype,
                           precision=jax.lax.Precision.HIGHEST)
        psel = (rows == pivrows[None, :]).astype(dtype)   # (m, b)
        rowmask = jnp.sum(psel, axis=1, keepdims=True)
        l_masked = strip * (1 - rowmask.astype(strip.dtype))
        l3 = jnp.concatenate([l_masked.astype(dtype) - psel, psel], axis=1)
        s3 = jnp.concatenate([s_loc, block_rows], axis=0)
        aug_loc = aug_loc - jnp.matmul(l3, s3, preferred_element_type=dtype,
                                       precision=jax.lax.Precision.HIGHEST)
        return aug_loc, used, pos, jnp.logical_and(
            ok, jnp.logical_and(ok_p, ok_d))

    used0 = jnp.zeros((m, 1), jnp.float32)
    pos0 = lax.broadcasted_iota(jnp.int32, (m,), 0)
    aug_loc, _, pos, ok = lax.fori_loop(
        0, num_panels, panel_step, (aug_loc, used0, pos0, jnp.bool_(True)))
    # Restore row order (local gather: rows are unsharded).
    aug_loc = jnp.take(aug_loc, pos, axis=0)
    return aug_loc, ok.reshape(1)


def _build_aug(a: jax.Array, m: int) -> jax.Array:
    """Pad to blockdiag(A, I) and augment with I (see ops/blocked.py)."""
    n = a.shape[-1]
    dtype = a.dtype
    if m != n:
        apad = jnp.eye(m, dtype=dtype)
        apad = lax.dynamic_update_slice(apad, a, (0, 0))
        a = apad
    return jnp.concatenate([a, jnp.eye(m, dtype=dtype)], axis=-1)


def sharded_blocked_inverse(a: jax.Array, *, mesh: Optional[Mesh] = None,
                            block_size: int = 256, pivot: bool = True,
                            axis: str = "x"):
    """Invert a single (n, n) matrix column-sharded over ``mesh[axis]``.

    Returns ``(inverse, ok)`` like the single-chip paths.
    """
    if mesh is None:
        mesh = make_device_mesh(len(jax.devices()), (axis,))
    d = mesh.shape[axis]
    n = a.shape[-1]
    b = min(block_size, max(_round_up(n, 8), 8))
    # W = 2m/D must be a multiple of b so panels never straddle shards.
    m = _round_up(n, b * d)
    w = 2 * m // d

    local = functools.partial(_local_gj, m=m, b=b, w=w, pivot=pivot,
                              axis=axis)
    fn = shard_map(local, mesh=mesh, in_specs=P(None, axis),
                   out_specs=(P(None, axis), P(axis)), check_vma=False)

    @jax.jit
    def run(a):
        aug = _build_aug(a, m)
        aug_out, ok = fn(aug)
        inv = lax.dynamic_slice(aug_out, (_i0, np.int32(m)), (m, m))[:n, :n]
        ok = jnp.logical_and(jnp.all(ok), jnp.all(jnp.isfinite(inv)))
        return inv, ok

    # Commit the input to the mesh's own devices (replicated) so nothing
    # ever lands on the process default device — which under the axon TPU
    # tunnel may be a different platform than the mesh (CLAUDE.md hazard #1).
    return run(jax.device_put(a, NamedSharding(mesh, P())))


def sharded_batched_inverse(a: jax.Array, *, mesh: Optional[Mesh] = None,
                            block_size: int = 128, pivot: bool = True,
                            dp_axis: str = "dp", tp_axis: str = "tp"):
    """Batched inversion on a 2D (dp, tp) mesh: batch sharded over ``dp``,
    augmented columns over ``tp``. ``a`` is (B, n, n); B % dp == 0.

    Returns ``(inverse (B, n, n), ok (B,))``.
    """
    if mesh is None:
        nd = len(jax.devices())
        dp = 2 if nd % 2 == 0 and nd > 1 else 1
        mesh = make_device_mesh((dp, nd // dp), (dp_axis, tp_axis))
    dp = mesh.shape[dp_axis]
    tp = mesh.shape[tp_axis]
    bsz, n, _ = a.shape
    if bsz % dp != 0:
        raise ValueError(f"batch {bsz} not divisible by dp={dp}")
    b = min(block_size, max(_round_up(n, 8), 8))
    m = _round_up(n, b * tp)
    w = 2 * m // tp

    local = functools.partial(_local_gj, m=m, b=b, w=w, pivot=pivot,
                              axis=tp_axis)
    local_batched = jax.vmap(local)
    fn = shard_map(local_batched, mesh=mesh,
                   in_specs=P(dp_axis, None, tp_axis),
                   out_specs=(P(dp_axis, None, tp_axis), P(dp_axis, tp_axis)),
                   check_vma=False)

    @jax.jit
    def run(a):
        aug = jax.vmap(lambda x: _build_aug(x, m))(a)
        aug_out, ok = fn(aug)
        inv = aug_out[:, :n, m:m + n]
        ok = jnp.logical_and(jnp.all(ok, axis=-1),
                             jnp.all(jnp.isfinite(inv), axis=(-2, -1)))
        return inv, ok

    # See sharded_blocked_inverse: commit to the mesh devices, batch-sharded
    # over dp so each dp group only materializes its own slice.
    return run(jax.device_put(a, NamedSharding(mesh, P(dp_axis))))
