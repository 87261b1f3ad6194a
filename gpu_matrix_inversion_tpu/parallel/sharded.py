"""Panel-sharded multi-chip Gauss-Jordan inversion over an ICI mesh.

BASELINE.md configs[4]: invert N x N for N beyond single-chip HBM by
column-sharding the augmented (m, 2m) system over a mesh axis. SPMD design
(via ``shard_map``) with ONE collective per panel *group*:

1. *Group gather*: the (m, gw) outer strip of the next ``group`` panels is
   assembled from its owner shard(s) by a single masked-gather ``psum``
   (the TPU analog of the reference's pivot-row broadcast; on hardware this
   rides ICI). gw = group*b columns per collective instead of b: same total
   bytes (m^2 for the whole inversion), group-times fewer messages.
2. *Replicated group factorization*: every device runs the SAME
   ``ops/blocked._group_factor`` the single-chip path uses -- windowed
   pivot-order slot layout, composite panel transforms from the fused
   Pallas factor kernel (jnp fallback for CPU meshes / fp64), per-panel
   rank-b internal updates (identical data -> identical pivots; no index
   exchange, no divergence). This is the round-3 port of the single-chip
   redesign (VERDICT r2 #1); the mesh-scale generalization of the
   reference's two-stage workgroup argmax (FP32.cpp:68-142).
3. *Local windowed update*: each device applies the group's composite
   column transform C (m, gw) to its own column shard in one rank-gw MXU
   GEMM -- and SKIPS the GEMM entirely when none of its columns intersect
   the live window [kb0+gw, m+kb0) (out-of-window columns receive provably
   zero updates: finished left columns are zero at this group's pivot rows,
   future slot columns are still zero). The skip recovers the windowed
   layout's ~2x MAC saving on average across the mesh.

Comm volume: one (m, gw) psum per group = m^2 floats total for the whole
inversion -- a 16384^2 FP32 inversion moves ~1 GB over ICI, far below the
compute time of its 4*N^3 = 17.6 PFLOP -- plus one column permutation
(all-to-all) undoing the slot layout at the end.

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

from gpu_matrix_inversion_tpu.ops.gauss_jordan import _i0
from gpu_matrix_inversion_tpu.ops.blocked import (_PRECISIONS,
                                                  _default_group_size,
                                                  _emit_fused,
                                                  _group_factor, _round_up,
                                                  _select_block_params,
                                                  _unroll_groups)
from gpu_matrix_inversion_tpu.ops.fused import _is_tpu_device
from gpu_matrix_inversion_tpu.parallel.mesh import make_device_mesh

try:  # jax >= 0.6 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def _mesh_is_tpu(mesh: Mesh) -> bool:
    return all(_is_tpu_device(d) for d in np.ravel(mesh.devices))


def _local_gj(aug_loc: jax.Array, *, m: int, b: int, w: int, group: int,
              pivot: bool, axis: str, use_pallas: bool, search_bf16: bool,
              precision):
    """Per-device body: ``aug_loc`` is the (m, w) local column shard of the
    (m, 2m) slot-layout working set [A | slots].

    Same logical-permutation + windowed slot layout as the single-chip
    ``ops/blocked._blocked_gj`` (rows never move; slots deposit composite
    columns in pivot order; one global gather at the end restores order).
    The group factorization is the shared ``_group_factor``; only the
    strip gather, the deposit scatter, and the window-overlap skip are
    mesh-specific. Per group the ONLY communication is the one strip psum.
    """
    dtype = aug_loc.dtype
    my = lax.axis_index(axis).astype(jnp.int32)
    rows = lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    lane_w = lax.broadcasted_iota(jnp.int32, (1, w), 1)  # my local columns
    num_panels = m // b
    ngroups = num_panels // group
    tail = num_panels - ngroups * group
    emit = _emit_fused(m, b, use_pallas, search_bf16)
    group_factor = functools.partial(
        _group_factor, m=m, b=b, dtype=dtype, pivot=pivot,
        use_pallas=use_pallas, interpret=False, precision=precision,
        search_bf16=search_bf16, emit=emit)

    def shift_cols(chunk, width: int, start):
        """Place ``chunk`` (m, cw) into a zero (m, width) canvas at dynamic
        column ``start`` (clamped into range) via one dynamic_update_slice.

        This pad-shift is THE column-alignment primitive here: a
        ``jnp.take(..., axis=1)`` with traced indices lowers on XLA:TPU to
        a serial per-column gather loop — measured 490x slower end-to-end
        on a 1-device v5e mesh — while dynamic_update_slice is one
        contiguous vector copy.
        """
        buf = jnp.zeros((m, width), chunk.dtype)
        return lax.dynamic_update_slice(buf, chunk, (_i0, start))

    unroll = _unroll_groups(ngroups)

    def run_group(kb0, carry, gsize, gw, static_call=True):
        aug_loc, used, pos, ok = carry
        # With a static kb0 (the unrolled group loop) a column range that
        # lies entirely inside ONE shard is known at trace time; the gather
        # and deposits below then use static offsets over just (m, gw)
        # instead of full-width canvases/selects -- the round-5 fix for the
        # sharded path's single-device glue (VERDICT r4 #3: ~12.6 ms of
        # deposit canvases + selects per 4096^2 call at d=1).
        kb0_static = int(kb0) if static_call else None

        def inside_one_shard(g0):
            return g0 is not None and (g0 % w) + gw <= w

        # 1. Group gather: global columns [kb0, kb0+gw) live on one or two
        # shards (gw <= w by the group cap). Fast path (static kb0, group
        # inside one shard): every device takes the SAME static (m, gw)
        # slice of its local shard, scales by scalar ownership, and the
        # psum keeps only the owner's values (non-owners contribute zeros
        # from their own finite data). General path: each owner takes ONE
        # contiguous clipped (m, gw) dynamic_slice, pad-shifts it into
        # window coordinates, masks to the lanes it owns, and the psum
        # assembles the full strip (robust to any alignment, so gw never
        # needs to divide the shard width).
        if inside_one_shard(kb0_static):
            off_s = kb0_static % w
            cand = lax.slice(aug_loc, (0, off_s), (m, off_s + gw))
            own_dev = (my == kb0_static // w).astype(dtype)
            o_strip = lax.psum(cand * own_dev, axis)
        else:
            off = jnp.clip(kb0 - my * w, 0, jnp.int32(w - gw))
            cand = lax.dynamic_slice(aug_loc, (_i0, off), (m, gw))
            shift = my * w + off - kb0                   # in [-gw, gw]
            contrib = shift_cols(cand, 3 * gw, gw + shift)[:, gw:2 * gw]
            lane_g = kb0 + lax.broadcasted_iota(jnp.int32, (1, gw), 1)
            own = jnp.logical_and(lane_g >= my * w,
                                  lane_g < my * w + w).astype(dtype)
            o_strip = lax.psum(contrib * own, axis)

        # 2. Replicated factorization on [O | G] (identical inputs on every
        # device -> identical pivots/composites, no index exchange).
        og = jnp.concatenate([o_strip, jnp.zeros((m, gw), dtype)], axis=1)
        og, pivtot, used, ok_g = group_factor(og, kb0, used, gsize=gsize,
                                              gw=gw)
        ok = jnp.logical_and(ok, ok_g)
        pos = lax.dynamic_update_slice(pos, pivtot, (kb0,))

        # 3. Local windowed composite update: C = G_final - E^T applied to
        # my shard's intersection with the live window [kb0+gw, m+kb0) in
        # one rank-gw GEMM, skipped when my columns miss the window
        # entirely. The update is confined to a (m, ww) slice with
        # ww = min(w, m-gw): out-of-window columns receive provably zero
        # updates (finished left columns are zero at this group's pivot
        # rows, future slots are still zero), so a slice that clamps into
        # the shard and overhangs the window is exact -- but updating the
        # WHOLE shard, as this path did through round 4, schedules up to
        # 2m/(m-gw) times the live MACs: at d=1/4096^2 that was 9.2 ms of
        # update GEMMs vs the single-chip path's ~5 (r5 device trace),
        # the real source of the 1.2x sharded-vs-blocked gap.
        etot = (rows == pivtot[None, :]).astype(dtype)        # (m, gw)
        c = og[:, gw:] - etot
        lo = kb0 + gw
        hi = np.int32(m) + kb0
        ww = min(w, m - gw)

        def do_update(aug_loc):
            off_u = jnp.clip(lo - my * w, 0, jnp.int32(w - ww))
            win = lax.dynamic_slice(aug_loc, (_i0, off_u), (m, ww))
            # Barrier: see ops/blocked.py run_group -- materializing the
            # gathered pivot rows lets XLA update the region in place
            # instead of copying the shard to break the gather/overwrite
            # hazard. ONLY when this group body is straight-line code:
            # under a fori_loop the barrier measured a ~2% LOSS
            # (DESIGN.md 6e.3 attribution -- in-place needs static
            # offsets + barrier together), so dynamic-kb0 calls skip it.
            xp = jnp.take(win, pivtot, axis=0)                # (gw, ww)
            if static_call:
                xp = lax.optimization_barrier(xp)
            win = win + lax.dot_general(
                c, xp, (((1,), (0,)), ((), ())),
                preferred_element_type=dtype, precision=precision)
            return lax.dynamic_update_slice(aug_loc, win, (_i0, off_u))

        has = jnp.logical_and(my * w < hi, my * w + w > lo)
        aug_loc = lax.cond(has, do_update, lambda x: x, aug_loc)

        # 4. Deposits: the group's own columns get the finished O, its slot
        # columns [m+kb0, m+kb0+gw) get G. Fast path (static kb0, range
        # inside one shard): read the (m, gw) region at its STATIC local
        # offset, select chunk on the owner (scalar ownership), write it
        # back with one static dynamic_update_slice -- (m, gw) traffic
        # instead of the general path's full-width canvas + lane select,
        # which at d=1/4096^2 was most of the ~12.6 ms sharded glue
        # (VERDICT r4 #3). General path (dynamic kb0 or shard-straddling
        # group): pad-shift into local coordinates and write under a
        # lane-index ownership select (see shift_cols).
        jg = my * w + lane_w                                   # (1, w)

        def deposit(aug_loc, chunk, g0, g0_static):
            if inside_one_shard(g0_static):
                off_d = g0_static % w
                cur = lax.slice(aug_loc, (0, off_d), (m, off_d + gw))
                sel_dev = (my == g0_static // w)
                new = jnp.where(sel_dev, chunk, cur)
                # Same barrier rationale as do_update: materialize the
                # select so buffer assignment can write the region in
                # place (static offsets + barrier, DESIGN.md 6e.3).
                new = lax.optimization_barrier(new)
                return lax.dynamic_update_slice(aug_loc, new,
                                                (_i0, np.int32(off_d)))
            sel = jnp.logical_and(jg >= g0, jg < g0 + gw)
            t = jnp.clip(g0 - my * w, -jnp.int32(gw), jnp.int32(w))
            shifted = shift_cols(chunk, w + 2 * gw, gw + t)[:, gw:gw + w]
            return jnp.where(sel, shifted, aug_loc)

        aug_loc = deposit(aug_loc, og[:, :gw], kb0, kb0_static)
        aug_loc = deposit(aug_loc, og[:, gw:], np.int32(m) + kb0,
                          None if kb0_static is None else m + kb0_static)
        return aug_loc, used, pos, ok

    def group_step(kk, carry):
        kb0 = kk.astype(jnp.int32) * (group * b)
        return run_group(kb0, carry, group, group * b, static_call=False)

    used0 = jnp.zeros((m, 1), jnp.float32)
    pos0 = lax.broadcasted_iota(jnp.int32, (m,), 0)
    carry = (aug_loc, used0, pos0, jnp.bool_(True))
    if unroll:
        # Static unroll + barrier = in-place shard updates (the same
        # pairing as ops/blocked._blocked_gj; see DESIGN.md 6e.3).
        for kk in range(ngroups):
            carry = run_group(np.int32(kk * group * b), carry,
                              group, group * b)
    else:
        carry = lax.fori_loop(0, ngroups, group_step, carry)
    if tail:
        carry = run_group(np.int32(ngroups * group * b), carry,
                          tail, tail * b)
    aug_loc, _, pos, ok = carry
    return aug_loc, pos, ok.reshape(1)


def _build_aug_slots(a: jax.Array, m: int) -> jax.Array:
    """Pad to blockdiag(A, I) and append the ZERO slot half (the windowed
    slot layout of ops/blocked.py -- not the classic [A | I])."""
    n = a.shape[-1]
    dtype = a.dtype
    if m != n:
        apad = jnp.eye(m, dtype=dtype)
        apad = lax.dynamic_update_slice(apad, a, (0, 0))
        a = apad
    return jnp.concatenate([a, jnp.zeros((m, m), dtype=dtype)], axis=-1)


def _unpermute(aug_out, pos, m: int, n: int):
    """Slot half -> inverse: columns by the inverse permutation of pos,
    rows by pos (see ops/blocked.py). Under column sharding the column
    gather is a mesh permutation; XLA lowers it to collectives."""
    slots = lax.slice(aug_out, (0, m), (m, 2 * m))
    invpos = jnp.zeros((m,), jnp.int32).at[pos].set(
        lax.broadcasted_iota(jnp.int32, (m,), 0))
    return jnp.take(jnp.take(slots, invpos, axis=1), pos, axis=0)[:n, :n]


def _sharded_params(n: int, block_size: int, d: int, dtype,
                    search_bf16: bool, group_size):
    """Geometry for the sharded path: reuse the single-chip VMEM gating
    (every device runs the same factor kernels over the full m rows), then
    round m so panels tile the shard width (w = 2m/d, b | w)."""
    b, use_pallas, search_bf16 = _select_block_params(
        n, block_size, dtype, search_bf16)
    # Re-gate against the MESH-rounded m, to a fixpoint: rounding n up to
    # b*d (e.g. d=3, n=8100 -> m=8448) can push m past the VMEM budget the
    # b choice was sized for (b=128 is only safe to m=8192), and shrinking
    # b in turn changes the rounding. b only ever shrinks, so this
    # terminates in <= 3 steps.
    while True:
        m = _round_up(n, b * d)
        b2, use_pallas, search_bf16 = _select_block_params(
            m, min(block_size, b), dtype, search_bf16)
        if b2 == b and m % (b * d) == 0:
            break
        b = b2
    if group_size is None:
        group_size = _default_group_size(b)
    # gw = group*b <= w keeps every group on at most two shards, which is
    # what the one-dynamic-slice strip gather and pad-shift deposits in
    # _local_gj assume.
    group = max(1, min(group_size, m // b, 2 * m // (d * b)))
    return b, m, group, use_pallas, search_bf16


@functools.lru_cache(maxsize=64)
def _sharded_run(mesh: Mesh, n: int, m: int, b: int, group: int,
                 pivot: bool, axis: str, use_pallas: bool,
                 search_bf16: bool, precision: str, refine: int):
    """Build-and-cache the jitted single-matrix program for one geometry.

    The jit MUST be cached across calls: a fresh ``@jax.jit`` closure per
    call retraces and recompiles the whole shard_map program every time --
    measured ~25 s per call at 4096^2 on the v5e (667x the actual ~40 ms
    execution) before this cache existed. Mesh objects hash by device
    tuple + axis names, so the same mesh reuses its executable.
    """
    w = 2 * m // mesh.shape[axis]
    local = functools.partial(_local_gj, m=m, b=b, w=w, group=group,
                              pivot=pivot, axis=axis, use_pallas=use_pallas,
                              search_bf16=search_bf16,
                              precision=_PRECISIONS[precision])
    fn = shard_map(local, mesh=mesh, in_specs=P(None, axis),
                   out_specs=(P(None, axis), P(None), P(axis)),
                   check_vma=False)

    @jax.jit
    def run(a):
        aug = _build_aug_slots(a, m)
        aug_out, pos, ok = fn(aug)
        inv = _unpermute(aug_out, pos, m, n)
        ok = jnp.logical_and(jnp.all(ok), jnp.all(jnp.isfinite(inv)))
        if refine > 0:
            from gpu_matrix_inversion_tpu.ops.refine import (
                newton_schulz_refine)
            inv = newton_schulz_refine(a, inv, iters=refine)
            ok = jnp.logical_and(ok, jnp.all(jnp.isfinite(inv)))
        return inv, ok

    return run


def sharded_blocked_inverse(a: jax.Array, *, mesh: Optional[Mesh] = None,
                            block_size: int = 128, pivot: bool = True,
                            axis: str = "x", precision: str = "highest",
                            search_bf16: bool = False,
                            group_size: int | None = None,
                            refine: int = 1):
    """Invert a single (n, n) matrix column-sharded over ``mesh[axis]``.

    Returns ``(inverse, ok)`` like the single-chip paths. ``refine`` adds
    Newton-Schulz polish steps computed as global (sharded) GEMMs; the
    default matches ``blocked_inverse`` (one polish step) so auto-routing
    a large matrix to the mesh does not silently drop a quality tier.
    """
    a = jnp.asarray(a)
    if a.dtype == jnp.bfloat16:
        # Same bf16-as-I/O contract as blocked_inverse: compute in fp32
        # (bf16 GJ arithmetic is numerically useless past tiny n, and bf16
        # vector ops miscompile in parts of this Mosaic toolchain), return
        # bf16 — the mesh route must not silently drop a quality tier.
        inv, ok = sharded_blocked_inverse(
            a.astype(jnp.float32), mesh=mesh, block_size=block_size,
            pivot=pivot, axis=axis, precision=precision,
            search_bf16=search_bf16, group_size=group_size, refine=refine)
        return inv.astype(jnp.bfloat16), ok
    if mesh is None:
        from gpu_matrix_inversion_tpu.parallel.mesh import (
            default_platform_devices)
        mesh = make_device_mesh(len(default_platform_devices()), (axis,))
    d = mesh.shape[axis]
    n = a.shape[-1]
    use_pallas_hw = _mesh_is_tpu(mesh)
    b, m, group, use_pallas, search_bf16 = _sharded_params(
        n, block_size, d, a.dtype, search_bf16, group_size)
    use_pallas = use_pallas and use_pallas_hw

    run = _sharded_run(mesh, n, m, b, group, pivot, axis, use_pallas,
                       search_bf16, precision, refine)
    # Commit the input to the mesh's own devices (replicated) so nothing
    # ever lands on the process default device — which under the axon TPU
    # tunnel may be a different platform than the mesh (CLAUDE.md hazard #1).
    return run(jax.device_put(a, NamedSharding(mesh, P())))


def sharded_batched_inverse(a: jax.Array, *, mesh: Optional[Mesh] = None,
                            block_size: int = 128, pivot: bool = True,
                            dp_axis: str = "dp", tp_axis: str = "tp",
                            precision: str = "highest",
                            group_size: int | None = None):
    """Batched inversion on a 2D (dp, tp) mesh: batch sharded over ``dp``,
    augmented columns over ``tp``. ``a`` is (B, n, n); B % dp == 0.

    On dp-only TPU meshes (tp == 1) with matrices inside the fused kernel's
    VMEM reach, each device runs the single-chip gridded fused kernel on
    its local batch (``_batched_fused_route``); ``precision``/
    ``group_size`` apply only to the column-sharded panel body.

    Returns ``(inverse (B, n, n), ok (B,))``.
    """
    a = jnp.asarray(a)
    if a.dtype == jnp.bfloat16:
        # bf16 I/O contract (see sharded_blocked_inverse / blocked_inverse).
        inv, ok = sharded_batched_inverse(
            a.astype(jnp.float32), mesh=mesh, block_size=block_size,
            pivot=pivot, dp_axis=dp_axis, tp_axis=tp_axis,
            precision=precision, group_size=group_size)
        return inv.astype(jnp.bfloat16), ok
    if mesh is None:
        from gpu_matrix_inversion_tpu.parallel.mesh import (
            default_platform_devices)
        nd = len(default_platform_devices())
        dp = 2 if nd % 2 == 0 and nd > 1 else 1
        mesh = make_device_mesh((dp, nd // dp), (dp_axis, tp_axis))
    dp = mesh.shape[dp_axis]
    tp = mesh.shape[tp_axis]
    bsz, n, _ = a.shape
    if bsz % dp != 0:
        raise ValueError(f"batch {bsz} not divisible by dp={dp}")
    use_pallas_hw = _mesh_is_tpu(mesh)
    if _batched_fused_route(tp, n, a.dtype, use_pallas_hw):
        # dp-only meshes with VMEM-sized matrices: each device inverts its
        # local batch with the gridded fused kernel (ops/fused) -- the
        # single-chip headline path, ~10x the per-matrix blocked machinery
        # at 128^2 -- instead of lax.map over the panel-sharded body.
        # ``precision``/``group_size`` do not apply (fp32 VMEM compute).
        run = _sharded_batched_fused_run(mesh, pivot, dp_axis)
        return run(jax.device_put(a, NamedSharding(mesh, P(dp_axis))))
    b, m, group, use_pallas, search_bf16 = _sharded_params(
        n, block_size, tp, a.dtype, False, group_size)
    use_pallas = use_pallas and use_pallas_hw
    # jax.vmap of the Pallas factor kernels HANGS on the real v5e (canaried
    # 2026-08-17: batch=2, n=256 on a (1, 1) TPU mesh never returned and
    # wedged the chip; the unbatched path with the same kernels is fine).
    # So when the kernels are active the batched body loops the local batch
    # with lax.map (a scan) instead -- each iteration runs the UNVMAPPED
    # kernels, the exact lowering the unbatched path already validates on
    # hardware. The jnp factor path keeps vmap (vectorizing over batch is
    # free there and faster on CPU meshes).
    batch_map = use_pallas

    run = _sharded_batched_run(mesh, n, m, b, group, pivot, dp_axis,
                               tp_axis, use_pallas, search_bf16, precision,
                               batch_map)
    # See sharded_blocked_inverse: commit to the mesh devices, batch-sharded
    # over dp so each dp group only materializes its own slice.
    return run(jax.device_put(a, NamedSharding(mesh, P(dp_axis))))


def _batched_fused_route(tp: int, n: int, dtype, tpu_mesh: bool) -> bool:
    """True when the batched sharded path should run the gridded fused
    kernel per device instead of the column-sharded panel body: no tensor
    parallelism to honor (tp == 1), the matrix fits the fused kernel's
    VMEM reach, and the mesh is real TPUs (Pallas interpret mode cannot
    run inside shard_map, so CPU meshes keep the jnp panel body)."""
    from gpu_matrix_inversion_tpu.ops.fused import FUSED_MAX_N
    return (tp == 1 and n <= FUSED_MAX_N and tpu_mesh
            and dtype in (jnp.float32, jnp.bfloat16))


@functools.lru_cache(maxsize=64)
def _sharded_batched_fused_run(mesh: Mesh, pivot: bool, dp_axis: str):
    """Cached jitted dp-sharded fused-batched program (see _sharded_run for
    why the cache is load-bearing). The per-device body is the single-chip
    fused kernel (``ops/fused._fused_batched``): one gridded Pallas kernel
    over the local batch -- grid batching, NOT jax.vmap, which hangs the
    v5e (DESIGN.md section 5). interpret=False is forced explicitly: the
    route gate already proved the mesh is real TPUs, and fused_inverse's
    global ``tpu_available()`` auto-detection keys off the process default
    device, which may be pinned to CPU while the mesh is TPU -- interpret
    mode cannot run inside shard_map."""
    from gpu_matrix_inversion_tpu.ops.fused import _fused_batched

    def local(a_loc):
        return _fused_batched(a_loc, pivot=pivot, interpret=False)

    fn = shard_map(local, mesh=mesh, in_specs=P(dp_axis),
                   out_specs=(P(dp_axis), P(dp_axis)), check_vma=False)

    @jax.jit
    def run(a):
        # Trace in 32-bit land like fused_inverse: Mosaic cannot legalize
        # the i64 index plumbing x64 mode threads through grid index maps.
        with jax.enable_x64(False):
            return fn(a)

    return run


@functools.lru_cache(maxsize=64)
def _sharded_batched_run(mesh: Mesh, n: int, m: int, b: int, group: int,
                         pivot: bool, dp_axis: str, tp_axis: str,
                         use_pallas: bool, search_bf16: bool,
                         precision: str, batch_map: bool = False):
    """Cached jitted batched program (see _sharded_run for why).

    ``batch_map=True`` runs the local batch through ``lax.map`` (sequential
    scan) instead of ``jax.vmap`` -- required whenever the Pallas factor
    kernels are active, whose vmapped lowering hangs the v5e (see
    sharded_batched_inverse). Outputs are identical; a CPU parity test pins
    the two lowerings bit-for-bit.
    """
    w = 2 * m // mesh.shape[tp_axis]
    local = functools.partial(_local_gj, m=m, b=b, w=w, group=group,
                              pivot=pivot, axis=tp_axis,
                              use_pallas=use_pallas,
                              search_bf16=search_bf16,
                              precision=_PRECISIONS[precision])
    if batch_map:
        def local_batched(aug_b):
            return lax.map(local, aug_b)
    else:
        local_batched = jax.vmap(local)
    fn = shard_map(local_batched, mesh=mesh,
                   in_specs=P(dp_axis, None, tp_axis),
                   out_specs=(P(dp_axis, None, tp_axis), P(dp_axis, None),
                              P(dp_axis, tp_axis)),
                   check_vma=False)

    @jax.jit
    def run(a):
        aug = jax.vmap(lambda x: _build_aug_slots(x, m))(a)
        aug_out, pos, ok = fn(aug)
        inv = jax.vmap(lambda ao, p: _unpermute(ao, p, m, n))(aug_out, pos)
        ok = jnp.logical_and(jnp.all(ok, axis=-1),
                             jnp.all(jnp.isfinite(inv), axis=(-2, -1)))
        return inv, ok

    return run
