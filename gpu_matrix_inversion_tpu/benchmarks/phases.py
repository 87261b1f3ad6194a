"""Per-phase breakdown of the blocked inversion (reference Res slots).

The reference times makeAugmented / pivot / row / column per kernel enqueue
(``FP32_bench.cpp:256-443``). On TPU the whole inversion is ONE fused XLA
program -- there is no host-visible kernel boundary to put a timer on -- so
the per-stage numbers are recovered *differentially*: the program is
re-traced with one stage stubbed out (the Pallas pivot search replaced by
trivial pivot rows; the (b, b) block inverse replaced by identity) and the
amortized timings are differenced. The stubbed variants produce garbage
numerics by design; only their schedule cost matters. Enable inside the
bench API with ``MATINV_DEBUG_PHASES=1`` (api._bench), or call / run this
module directly::

    python -m gpu_matrix_inversion_tpu.benchmarks.phases --n 2048

Drift protocol (round 5, VERDICT r4 #5): the chip's clock state drifts
+-10-15% across multi-minute windows (DESIGN.md section 7), and every phase
value here is a DIFFERENCE between variant timings -- timing variant A's
reps then variant B's straddles windows and produced round 3's wrong
"pivot 9.2 ms" attribution (the trace showed 5.3). All probes (every
variant at k1 AND k2) are therefore compiled up front and timed
round-robin INTERLEAVED, so each rep of each program samples the same
window; min() then picks the fastest consistent sweep.

Phase mapping onto the reference's slots:

- ``make_augmented``: building the padded [A | slots] working matrix.
- ``pivot``: the Pallas pivot-search kernels (maxPivot/finalMaxPivot).
- ``row``: the (b, b) pivot-block inversion + scaled-row deposit (fixRow).
- ``column``: the trailing MXU updates + remaining glue (fixColumn).
"""

from __future__ import annotations

import argparse
import contextlib
import functools
import time
from unittest import mock

import numpy as np


def _amortized_multi(makers, a, k1: int, k2: int, reps: int):
    """Amortized per-op seconds for SEVERAL probe families at once.

    ``makers`` is a list of ``make_probe(k)`` callables. All ``2 * len``
    programs are compiled/warmed first, then each rep times every program
    back-to-back (interleaved), so the k1/k2 slope of every family -- and
    the differences BETWEEN families the caller computes -- are sampled
    inside one chip-state window (DESIGN.md section 7; the module-docstring
    drift protocol)."""
    import jax  # noqa: F401

    def run(p):
        t0 = time.perf_counter()
        float(np.asarray(p(a)))
        return time.perf_counter() - t0

    pairs = [(mk(k1), mk(k2)) for mk in makers]
    for p1, p2 in pairs:  # compile/warm everything before any timing
        float(np.asarray(p1(a)))
        float(np.asarray(p2(a)))
    best = [[float("inf"), float("inf")] for _ in pairs]
    for _ in range(reps):
        for i, (p1, p2) in enumerate(pairs):
            best[i][0] = min(best[i][0], run(p1))
            best[i][1] = min(best[i][1], run(p2))
    return [max(t2 - t1, 0.0) / (k2 - k1) for t1, t2 in best]


def measure_phases(n: int = 2048, *, block_size: int = 128, pivot: bool = True,
                   precision: str = "highest", seed: int = 0,
                   k: int = 3, reps: int = 2) -> dict:
    """Differential per-phase timings (seconds) of the fp32 blocked path.

    Returns a dict with ``make_augmented / pivot / row / column /
    total_compute`` keys -- the reference's Res slots that round 1 left
    permanently zero (VERDICT r1 #4 missing item).
    """
    import jax
    import jax.numpy as jnp
    from jax import lax
    import gpu_matrix_inversion_tpu.ops.blocked as B
    from gpu_matrix_inversion_tpu.ops.fused import tpu_available
    from gpu_matrix_inversion_tpu.utils.generators import hollow_random_matrix

    a = jnp.asarray(hollow_random_matrix(n, seed=seed))
    b, use_pallas, sbf16 = B._select_block_params(n, block_size,
                                                  a.dtype, False)
    # Same derivation as blocked_inverse: from the GATED b, so the profiled
    # configuration matches the real path (composite width ~1536).
    group_size = B._default_group_size(b)
    interpret = not tpu_available()

    def fake_search(strip, kb, used, *, m, b, pivot, interpret):
        return kb + lax.broadcasted_iota(jnp.int32, (b, 1), 0)[:, 0]

    def fake_inv(dblk, *, pivot, interpret):
        return jnp.eye(dblk.shape[-1], dtype=dblk.dtype), jnp.bool_(True)

    def fake_factor(strip, kb, used, *, m, b, pivot, interpret):
        # Round-3 fused path: search + block-inverse are ONE kernel, so the
        # whole launch is stubbed under the "pivot" slot and the "row" slot
        # reads ~0 (the scaled-row deposit rides the trailing GEMM).
        return (kb + lax.broadcasted_iota(jnp.int32, (b, 1), 0)[:, 0],
                jnp.zeros((b, m), strip.dtype), jnp.bool_(True))

    def make_probe(kk, *, stub_search=False, stub_inv=False):
        gj = functools.partial(
            B._blocked_gj, pivot=pivot, b=b, use_pallas=use_pallas,
            interpret=interpret, precision=B._PRECISIONS[precision],
            search_bf16=sbf16, group_size=group_size)

        @jax.jit
        def probe(x):
            def body(c, _):
                inv, ok = gj(x + c)
                return c + jnp.asarray(1e-7, x.dtype), jnp.sum(inv)
            c, outs = lax.scan(body, jnp.asarray(0, x.dtype), None,
                               length=kk)
            return jnp.sum(outs) + c

        # Trace (and thus bake the stubs in) NOW, inside the patch scope;
        # the cached public jit is never touched.
        with contextlib.ExitStack() as st:
            if stub_search:
                st.enter_context(mock.patch.object(B, "_pivot_search",
                                                   fake_search))
                st.enter_context(mock.patch.object(B, "_panel_factor",
                                                   fake_factor))
            if stub_inv:
                st.enter_context(mock.patch.object(B, "_invert_small",
                                                   fake_inv))
            with jax.enable_x64(False):
                probe(a)
        return probe

    @jax.jit
    def probe_aug(x):
        m = max(B._round_up(n, b), b)
        if m != n:
            apad = jnp.eye(m, dtype=x.dtype)
            apad = lax.dynamic_update_slice(apad, x, (0, 0))
            x = apad
        aug = jnp.concatenate([x, jnp.zeros((m, m), x.dtype)], axis=-1)
        return jnp.sum(aug)

    def make_aug_probe(kk):
        @jax.jit
        def probe(x):
            def body(c, _):
                return c + jnp.asarray(1e-7, x.dtype), probe_aug(x + c)
            c, outs = lax.scan(body, jnp.asarray(0, x.dtype), None,
                               length=kk)
            return jnp.sum(outs) + c
        return probe

    # One interleaved sweep over all four probe families: every phase below
    # is a difference between two of these, so they must share a window.
    t_full, t_nosearch, t_noinv, t_aug = _amortized_multi(
        [lambda kk: make_probe(kk),
         lambda kk: make_probe(kk, stub_search=True),
         lambda kk: make_probe(kk, stub_inv=True),
         make_aug_probe],
        a, 1, k, reps)

    t_pivot = max(t_full - t_nosearch, 0.0)
    t_row = max(t_full - t_noinv, 0.0)
    t_column = max(t_full - t_pivot - t_row - t_aug, 0.0)
    return {
        "make_augmented": t_aug,
        "pivot": t_pivot,
        "row": t_row,
        "column": t_column,
        "total_compute": t_full,
    }


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--n", type=int, default=2048)
    ap.add_argument("--block-size", type=int, default=128)
    ap.add_argument("--precision", default="highest")
    ap.add_argument("--k", type=int, default=3)
    args = ap.parse_args(argv)
    # Persistent compile cache: 69 s cold -> ~1 s warm through the axon
    # tunnel (CLAUDE.md TPU-driver rule; bench.py/sweep do the same).
    from gpu_matrix_inversion_tpu.utils.config import enable_compile_cache
    enable_compile_cache()
    phases = measure_phases(args.n, block_size=args.block_size,
                            precision=args.precision, k=args.k)
    for key, val in phases.items():
        print(f"{key:>16}: {val * 1e3:10.3f} ms")
    tc = phases["total_compute"]
    if tc:
        print(f"{'gflops(4N^3)':>16}: {4 * args.n ** 3 / tc / 1e9:10.1f}")


if __name__ == "__main__":
    main()
