"""Lockstep-batched blocked Gauss-Jordan: K matrices per factor kernel.

Built for VERDICT r3 weak #5 (batched inputs past the fused kernel's VMEM
reach loop the single-matrix program through ``lax.map``, so throughput is
B x the single-matrix latency) -- and REFUTED by measurement, so the route
is opt-in (``MATINV_LOCKSTEP=1``); the default stays on ``lax.map``.

The premise was that the panel factor kernel's serial per-step cost is
latency-bound -- nearly independent of how much data each vector op
touches -- so K matrices advancing through the SAME b-step chain in one
kernel (a (K, 2*sub, m) merged working set, the round-4 v2 step structure)
would pay the chain once per panel instead of once per matrix. The v5e
microbench says otherwise (DESIGN.md 6e): per-step latency is WIDTH-bound
beyond a ~0.25 us floor (0.374 / 0.637 / 1.282 / 2.638 us/step at
m = 512 / 2048 / 4096 / 8192), so a K-merged step costs ~K x a single
step and sharing the chain saves only the small fixed floor -- which the
kernel's K-serialized deferred MXU dots (Mosaic has no batched
dot_general) then eat. Measured end-to-end (v5e, amortized): B=16 n=1024
lockstep 9.9 ms/batch vs lax.map 9.8; B=8 n=2048 lockstep 3.16 ms/matrix
vs 2.43 -- a tie and a 30% loss. The same scaling law refutes CALU
tournament pivoting for the single-matrix chain (DESIGN.md 6e).

Mirrors the reference's batched use case (invert many mid-size systems,
``main_file.cpp:73-78`` ramp); the single-matrix windowed slot layout,
logical permutation, and group composites are unchanged (``ops/blocked.py``).
Pivot sequences are bit-identical to the single-matrix path (same
packed-key max), pinned by a parity test.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpu_matrix_inversion_tpu.ops.blocked import (_PRECISIONS,
                                                  _default_group_size,
                                                  _factor_geometry,
                                                  _select_block_params)
from gpu_matrix_inversion_tpu.ops.fused import _round_up
from gpu_matrix_inversion_tpu.ops.gauss_jordan import _i0

# The factor kernel's VMEM budget: strip input + ct output (the two
# (K*b, m) f32 buffers) plus the merged (K*2sub, m) scratch, psel, and the
# used tile -- the same product cap as ops.blocked._emit_fused, shared
# across K.
_LOCKSTEP_BM_CAP = 128 * 8192
_LOCKSTEP_MAX_K = 8


def _lockstep_k(nbatch: int, n: int, block_size: int, dtype,
                search_bf16: bool = False) -> int:
    """Matrices per lockstep kernel (0 = path unsupported).

    fp32 only (the bf16-search regime and fp64 keep their existing
    routes), and only where the (K, b, m) working set fits the same VMEM
    product cap the single-matrix fused kernel proves out.
    """
    if os.environ.get("MATINV_LOCKSTEP") != "1":
        # OFF by default: measured on the v5e (round 4), lockstep TIES the
        # per-matrix lax.map route at B=16 n=1024 (9.9 vs 9.8 ms/batch) and
        # LOSES 30% at B=8 n=2048 (3.16 vs 2.43 ms/matrix) -- see the
        # module docstring for why. Kept as an opt-in measured experiment.
        return 0
    if dtype != jnp.float32 or nbatch < 2 or search_bf16:
        return 0
    b, use_pallas, search_bf16 = _select_block_params(
        n, block_size, dtype, False)
    if not use_pallas or search_bf16:
        return 0
    m = max(_round_up(n, b), b)
    cap = _LOCKSTEP_BM_CAP // (b * m)
    k = min(nbatch, cap, _LOCKSTEP_MAX_K)
    return k if k >= 2 else 0


def _lockstep_factor_kernel(kb_ref, stripT_ref, used_ref, pivrows_ref,
                            ct_ref, ok_ref, wp, psel, *, k: int, m: int,
                            b: int, sub: int, kmask: int, pivot: bool):
    """K-lockstep fused panel factorization (3D refs, leading batch dim).

    The per-step structure is ``ops.blocked._panel_factor_kernel2`` with a
    leading K axis: per-matrix pivot masks fall out of a (k, 1, m)
    keepdims max, the pivot VALUE comes from the carried column itself
    (``sum(col * lane_p)``), and 3D broadcasting supplies every
    cross-matrix expansion for free. The deferred composite dots stay 2D
    (one pair per matrix, static K loop): Mosaic's dot_general has no
    batch dims.
    """
    dt = ct_ref.dtype
    kb = kb_ref[0, 0]
    lane_m = lax.broadcasted_iota(jnp.int32, (1, 1, m), 2)
    rows2 = lax.broadcasted_iota(jnp.int32, (1, 2 * sub, 1), 1)
    rows1 = lax.broadcasted_iota(jnp.int32, (1, sub, 1), 1)

    used = jnp.max(used_ref[:, :, :].astype(jnp.float32), axis=1,
                   keepdims=True)                          # (k, 1, m)
    col = stripT_ref[:, 0:1, :]
    okv = jnp.ones((k, 1, 1), jnp.float32)

    for s in range(b // sub):  # static; all ref slices static
        r0 = s * sub
        wp[:, 0:sub, :] = (stripT_ref[:, r0:r0 + sub, :] if s == 0
                           else ct_ref[:, r0:r0 + sub, :])
        wp[:, sub:, :] = jnp.zeros((k, sub, m), dt)
        psel[:, :, :] = jnp.zeros((k, sub, m), dt)

        def step(r2, carry, r0=r0):
            used, col, okv = carry
            if pivot:
                bits = lax.bitcast_convert_type(
                    jnp.abs(col).astype(jnp.float32), jnp.int32)
                key = jnp.where(used > 0, jnp.full_like(bits, -1),
                                (bits & ~jnp.int32(kmask))
                                | (jnp.int32(kmask) - lane_m))
                # Packed keys are unique per lane; the per-matrix max is
                # one keepdims reduce, no scalar decode (kernel v2 trick).
                lane_p = (key == jnp.max(key, axis=2, keepdims=True))
            else:
                lane_p = jnp.broadcast_to(
                    lane_m == kb + jnp.int32(r0) + r2, (k, 1, m))
            used = jnp.where(lane_p, jnp.ones_like(used), used)
            lp = lane_p.astype(dt)                         # (k, 1, m)

            cur = wp[:, :, :] + (rows2 == sub + r2).astype(dt) * lp
            psel[:, :, :] = psel[:, :, :] + (rows1 == r2).astype(dt) * lp

            # Pivot value straight from the carried column (no segmented
            # extraction): piv_k = col_k[pivot lane of matrix k].
            pv = jnp.sum(col * lp, axis=2, keepdims=True)  # (k, 1, 1)
            okv = okv * (pv != 0).astype(jnp.float32)
            pvs = jnp.where(pv == 0, jnp.ones_like(pv), pv).astype(dt)
            pivcol = jnp.sum(jnp.where(lane_p, cur, jnp.zeros_like(cur)),
                             axis=2, keepdims=True)        # (k, 2sub, 1)
            # Exact division (not a reciprocal multiply): keeps the
            # arithmetic bit-identical to the single-matrix kernels.
            norm = pivcol / pvs
            factors = jnp.where(lane_p, jnp.zeros_like(col), col)
            new = jnp.where(jnp.broadcast_to(lane_p, (k, 2 * sub, m)),
                            jnp.broadcast_to(norm, (k, 2 * sub, m)),
                            cur - norm * factors)
            wp[:, :, :] = new
            col = jnp.sum(jnp.where(rows2 == r2 + 1, new,
                                    jnp.zeros_like(new)),
                          axis=1, keepdims=True)           # (k, 1, m)
            return used, col, okv

        used, col, okv = lax.fori_loop(jnp.int32(0), jnp.int32(sub), step,
                                       (used, col, okv))

        # Pivot indices per matrix, off the chain (int32: bf16/f32 psel
        # values are exact one-hots but cannot carry lane ids).
        ponehot = (psel[:, :, :] != 0).astype(jnp.int32)   # (k, sub, m)
        # dtype pins the accumulator: x64 mode would promote to i64,
        # which Mosaic cannot lower (same hazard as ops/blocked.py).
        pivrows_ref[:, r0:r0 + sub] = jnp.sum(ponehot * lane_m, axis=2,
                                              dtype=jnp.int32)

        prec = (lax.Precision.DEFAULT if dt == jnp.bfloat16
                else lax.Precision.HIGHEST)
        # The finished sub-panel's transform rows land in ct FIRST so the
        # deferred dots below can read them back as 2D ref slices --
        # value-level slicing of a (k, sub, m) temporary (``ct_l[i]``)
        # rank-changes through vector.reshape, which Mosaic's layout
        # inference aborts on (measured: SIGABRT in inferReshape).
        ct_ref[:, r0:r0 + sub, :] = wp[:, sub:, :] - psel[:, :, :]
        if r0 + sub < b:
            for i in range(k):  # 2D dots: Mosaic has no batched dot_general
                wl = (stripT_ref[i, r0 + sub:, :] if s == 0
                      else ct_ref[i, r0 + sub:, :])
                g = lax.dot_general(wl, psel[i, :, :],
                                    (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32,
                                    precision=prec)
                upd = lax.dot_general(g.astype(dt), ct_ref[i, r0:r0 + sub, :],
                                      (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32,
                                      precision=prec)
                ct_ref[i, r0 + sub:, :] = wl + upd.astype(dt)
            col = ct_ref[:, r0 + sub:r0 + sub + 1, :]
        if r0 > 0:
            for i in range(k):
                ct0 = ct_ref[i, 0:r0, :]
                g0 = lax.dot_general(ct0, psel[i, :, :],
                                     (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32,
                                     precision=prec)
                upd0 = lax.dot_general(g0.astype(dt), ct_ref[i, r0:r0 + sub, :],
                                       (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32,
                                       precision=prec)
                ct_ref[i, 0:r0, :] = ct0 + upd0.astype(dt)

    # Finite probe per matrix folded into the zero-pivot flag; bool & bool
    # on 2D+ tiles trips Mosaic (CLAUDE.md hazard #4) -- int products. All
    # shapes stay >= 2D and rank changes go through keepdims reductions,
    # never squeezes (vector.reshape aborts Mosaic layout inference).
    fin = jnp.sum(jnp.sum(ct_ref[:, :, :] * jnp.zeros((k, b, m), dt),
                          axis=2, keepdims=True),
                  axis=1, keepdims=True)                   # (k, 1, 1)
    okk = ((okv > 0).astype(jnp.int32)
           * (fin == 0).astype(jnp.int32))                 # (k, 1, 1)
    ok_ref[:, :] = jnp.sum(okk, axis=2, dtype=jnp.int32)   # (k, 1)


def _panel_factor_lockstep(strips, kb, used, *, k: int, m: int, b: int,
                           pivot: bool, interpret: bool):
    """K-lockstep panel factor. ``strips`` (k, m, b), ``used`` (k, m, 1);
    returns ``(pivrows (k, b), ct (k, b, m), ok (k,) bool)``."""
    sub, kmask = _factor_geometry(m, b)
    kernel = functools.partial(_lockstep_factor_kernel, k=k, m=m, b=b,
                               sub=sub, kmask=kmask, pivot=pivot)
    kb_arr = jnp.reshape(kb.astype(jnp.int32), (1, 1))
    used_tile = jnp.broadcast_to(
        jnp.swapaxes(used.astype(strips.dtype), -1, -2), (k, 8, m))
    pivrows, ct, ok = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((k, b), jnp.int32),
                   jax.ShapeDtypeStruct((k, b, m), strips.dtype),
                   jax.ShapeDtypeStruct((k, 1), jnp.int32)),
        scratch_shapes=[pltpu.VMEM((k, 2 * sub, m), strips.dtype),
                        pltpu.VMEM((k, sub, m), strips.dtype)],
        interpret=interpret,
    )(kb_arr, jnp.swapaxes(strips, -1, -2), used_tile)
    return pivrows, ct, ok[:, 0] > 0


def _group_factor_lockstep(og, kb0, used, *, k: int, gsize: int, gw: int,
                           m: int, b: int, dtype, pivot: bool,
                           interpret: bool, precision):
    """K-batched twin of ``ops.blocked._group_factor`` on (k, m, 2*gw)."""
    rows = lax.broadcasted_iota(jnp.int32, (1, m, 1), 1)
    pivtot = jnp.zeros((k, gw), jnp.int32)
    ok = jnp.ones((k,), jnp.bool_)
    for i in range(gsize):  # static unroll
        ib = i * b
        strip = og[:, :, ib:ib + b]
        pivrows, ct, ok_f = _panel_factor_lockstep(
            strip, kb0 + ib, used, k=k, m=m, b=b, pivot=pivot,
            interpret=interpret)
        ok = jnp.logical_and(ok, ok_f)
        pivtot = lax.dynamic_update_slice(pivtot, pivrows,
                                          (_i0, np.int32(ib)))

        psel = (rows == pivrows[:, None, :]).astype(dtype)  # (k, m, b)
        used = used + jnp.sum(psel, axis=2,
                              keepdims=True).astype(jnp.float32)
        og = og.at[:, :, gw + ib:gw + ib + b].set(psel)

        og_win = og[:, :, ib:gw + ib + b]                   # (k, m, gw+b)
        # Barrier: see ops/blocked.py _group_factor (in-place update
        # hazard on the gathered pivot rows).
        block_rows = lax.optimization_barrier(jnp.take_along_axis(
            og_win, pivrows[:, :, None].astype(jnp.int32), axis=1))
        og = og.at[:, :, ib:gw + ib + b].set(
            og_win + lax.dot_general(
                ct, block_rows, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=dtype, precision=precision))
    return og, pivtot, used, ok


def _blocked_gj_lockstep(a, *, pivot: bool, b: int, k: int,
                         interpret: bool, precision, group_size: int):
    """K matrices through the windowed slot-layout blocked GJ in lockstep.

    The batched twin of ``ops.blocked._blocked_gj``: identical layout,
    grouping, and unpermute, with a leading K axis and the lockstep factor
    kernel. Returns ``(inv (k, n, n), ok (k,))``.
    """
    n = a.shape[-1]
    m = max(_round_up(n, b), b)
    dtype = a.dtype
    if m != n:
        apad = jnp.broadcast_to(jnp.eye(m, dtype=dtype), (k, m, m))
        a = jax.vmap(
            lambda e, x: lax.dynamic_update_slice(e, x, (0, 0)))(apad, a)
    aug = jnp.concatenate([a, jnp.zeros((k, m, m), dtype)], axis=-1)

    rows = lax.broadcasted_iota(jnp.int32, (1, m, 1), 1)
    num_panels = m // b
    group = max(1, min(group_size, num_panels))
    gw = group * b
    num_groups = num_panels // group
    tail = num_panels - num_groups * group

    group_factor = functools.partial(
        _group_factor_lockstep, k=k, m=m, b=b, dtype=dtype, pivot=pivot,
        interpret=interpret, precision=precision)

    def run_group(kb0, carry, gsize, gw):
        aug, used, pos, ok = carry
        og = jnp.concatenate(
            [lax.dynamic_slice(aug, (_i0, _i0, kb0), (k, m, gw)),
             jnp.zeros((k, m, gw), dtype)], axis=2)
        og, pivtot, used, ok_g = group_factor(og, kb0, used, gsize=gsize,
                                              gw=gw)
        ok = jnp.logical_and(ok, ok_g)
        pos = lax.dynamic_update_slice(pos, pivtot, (_i0, kb0))

        etot = (rows == pivtot[:, None, :]).astype(dtype)    # (k, m, gw)
        c = og[:, :, gw:] - etot
        win = lax.dynamic_slice(aug, (_i0, _i0, kb0 + gw), (k, m, m - gw))
        # Barrier: see ops/blocked.py run_group (in-place update hazard).
        blockw = lax.optimization_barrier(
            jnp.take_along_axis(win, pivtot[:, :, None], axis=1))
        win = win + lax.dot_general(c, blockw, (((2,), (1,)), ((0,), (0,))),
                                    preferred_element_type=dtype,
                                    precision=precision)
        aug = lax.dynamic_update_slice(aug, win, (_i0, _i0, kb0 + gw))
        aug = lax.dynamic_update_slice(aug, og[:, :, :gw], (_i0, _i0, kb0))
        aug = lax.dynamic_update_slice(aug, og[:, :, gw:],
                                       (_i0, _i0, np.int32(m) + kb0))
        return aug, used, pos, ok

    def group_step(kk, carry):
        kb0 = kk.astype(jnp.int32) * gw
        return run_group(kb0, carry, group, gw)

    used0 = jnp.zeros((k, m, 1), jnp.float32)
    pos0 = jnp.broadcast_to(lax.broadcasted_iota(jnp.int32, (m,), 0), (k, m))
    carry = lax.fori_loop(0, num_groups, group_step,
                          (aug, used0, pos0, jnp.ones((k,), jnp.bool_)))
    if tail:
        carry = run_group(jnp.int32(num_groups * group * b), carry,
                          tail, tail * b)
    aug, _, pos, ok = carry

    slots = lax.dynamic_slice(aug, (_i0, _i0, np.int32(m)), (k, m, m))

    def unpermute(slots_i, pos_i):
        invpos = jnp.zeros((m,), jnp.int32).at[pos_i].set(
            lax.broadcasted_iota(jnp.int32, (m,), 0))
        return jnp.take(jnp.take(slots_i, invpos, axis=1), pos_i, axis=0)

    inv = jax.vmap(unpermute)(slots, pos)[:, :n, :n]
    ok = jnp.logical_and(ok, jnp.all(jnp.isfinite(inv), axis=(-2, -1)))
    return inv, ok


@functools.partial(jax.jit,
                   static_argnames=("pivot", "b", "k", "interpret",
                                    "precision", "group_size", "refine"))
def _lockstep_inverse_jit(a, *, pivot: bool, b: int, k: int,
                          interpret: bool, precision: str,
                          group_size: int, refine: int):
    """(B, n, n) batch in lockstep chunks of ``k`` (B padded to k | B)."""
    bsz, n = a.shape[0], a.shape[-1]
    pad = (-bsz) % k
    if pad:
        a = jnp.concatenate(
            [a, jnp.broadcast_to(jnp.eye(n, dtype=a.dtype), (pad, n, n))],
            axis=0)
    chunks = a.reshape(-1, k, n, n)
    fn = functools.partial(_blocked_gj_lockstep, pivot=pivot, b=b, k=k,
                           interpret=interpret,
                           precision=_PRECISIONS[precision],
                           group_size=group_size)
    if chunks.shape[0] > 1:
        # Chunks loop through lax.map: vmap of Pallas kernels hangs the
        # v5e (DESIGN.md section 5), and the lockstep kernel already IS
        # the batched lowering.
        inv, ok = lax.map(fn, chunks)
    else:
        inv, ok = fn(chunks[0])
        inv, ok = inv[None], ok[None]
    inv = inv.reshape(-1, n, n)[:bsz]
    ok = ok.reshape(-1)[:bsz]
    if refine > 0:
        from gpu_matrix_inversion_tpu.ops.refine import newton_schulz_refine
        inv = newton_schulz_refine(a[:bsz], inv, iters=refine)
        ok = jnp.logical_and(ok, jnp.all(jnp.isfinite(inv), axis=(-2, -1)))
    return inv, ok
