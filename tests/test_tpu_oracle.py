"""On-hardware kernel-oracle gate (VERDICT r2 weak #5 / next #4).

The pivot-oracle suite (``test_pivot_oracle.py``) runs the Pallas kernels
in interpret mode on CPU by conftest design; this toolchain's Mosaic has
repeatedly miscompiled patterns interpret mode executes fine (CLAUDE.md
hazard list). This module re-runs the semantic oracles *compiled* on the
real TPU at canary sizes, per the wedge protocol: small shapes first, so a
Mosaic crash is cheap to recover from.

Skipped under the CPU-pinned conftest unless ``MATINV_TPU_TESTS=1`` is set
AND a non-CPU device is visible. Run via the verify skill:

    MATINV_TPU_TESTS=1 timeout 550 python -m pytest tests/test_tpu_oracle.py -v

Semantics pinned (reference maxPivot/finalMaxPivot tier,
``matrix_inversion_FP32.cpp:68-142``): well-separated pivot parity with the
full-precision jnp search, near-tie first-index tie-break, >16384 kmask
index packing, bf16 search validity, and the fused factor kernel's
composite algebra.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpu_matrix_inversion_tpu.ops.blocked import (_panel_factor,
                                                  _panel_pivots_logical,
                                                  _pivot_search)


def _tpu_device():
    for d in jax.devices():
        if d.platform not in ("cpu",):
            return d
    return None


pytestmark = pytest.mark.tpu

_dev = _tpu_device() if os.environ.get("MATINV_TPU_TESTS") == "1" else None
if _dev is None:
    pytest.skip("set MATINV_TPU_TESTS=1 with a TPU visible to run the "
                "on-hardware oracle gate", allow_module_level=True)


def _put(x):
    """Commit to the TPU so every downstream op (incl. pallas_call with
    interpret=False) compiles and executes on hardware."""
    return jax.device_put(jnp.asarray(x), _dev)


def test_hw_kernel_pivots_match_logical():
    """Canary first (wedge protocol): compiled search at m=256 must agree
    exactly with the full-precision jnp search on separated values."""
    m, b = 256, 32
    rng = np.random.default_rng(7 * m + b)
    mag = np.exp(rng.uniform(0.0, 8.0, (m, b)))
    strip = (mag * rng.choice([-1.0, 1.0], (m, b))).astype(np.float32)
    used = np.zeros((m, 1), np.float32)
    used[:8] = 1.0

    got = _pivot_search(_put(strip), jnp.int32(0), _put(used), m=m, b=b,
                        pivot=True, interpret=False)
    want, _, _ = _panel_pivots_logical(jnp.asarray(strip),
                                       jnp.asarray(used), jnp.int32(0),
                                       m=m, b=b, pivot=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert not np.any(np.isin(np.asarray(got), np.arange(8)))


def test_hw_kernel_near_tie_valid_and_first_index():
    """Near-tie below the packed-key truncation: smallest row index wins;
    above it: the true max wins (compiled semantics, not interpret's)."""
    m, b = 256, 32
    rng = np.random.default_rng(3)
    strip = rng.uniform(0.1, 0.9, (m, b)).astype(np.float32)
    v = np.float32(1000.0)
    strip[200, 0] = v * (1 + 2.0 ** -20)
    strip[50, 0] = v
    used = np.zeros((m, 1), np.float32)
    got = _pivot_search(_put(strip), jnp.int32(0), _put(used), m=m, b=b,
                        pivot=True, interpret=False)
    p0 = int(np.asarray(got)[0])
    assert p0 == 50
    assert abs(strip[p0, 0]) >= abs(strip[:, 0]).max() * (1 - 2.0 ** -14)

    strip[200, 0] = v * (1 + 2.0 ** -10)
    got = _pivot_search(_put(strip), jnp.int32(0), _put(used), m=m, b=b,
                        pivot=True, interpret=False)
    assert int(np.asarray(got)[0]) == 200


def test_hw_kernel_wide_index_mask():
    """m past 16384: the 15-bit kmask packing must survive compilation
    (bf16 regime there, so assert validity of the bf16 search too)."""
    m, b = 16448, 32
    rng = np.random.default_rng(11)
    strip = np.zeros((m, b), np.float32)
    strip[:64] = rng.uniform(0.1, 1.0, (64, b)).astype(np.float32)
    strip[16400] = np.linspace(100.0, 200.0, b).astype(np.float32)
    used = np.zeros((m, 1), np.float32)
    got = _pivot_search(_put(strip), jnp.int32(0), _put(used), m=m, b=b,
                        pivot=True, interpret=False)
    assert int(np.asarray(got)[0]) == 16400
    want, _, _ = _panel_pivots_logical(
        jnp.asarray(strip), jnp.asarray(used), jnp.int32(0), m=m, b=b,
        pivot=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_hw_kernel_bf16_pivots_valid():
    """Compiled bf16 search: permutation validity + used-mask respect
    (exact-parity is not promised; see test_pivot_oracle)."""
    m, b = 256, 32
    rng = np.random.default_rng(77)
    strip = rng.standard_normal((m, b)).astype(np.float32)
    used = np.zeros((m, 1), np.float32)
    used[:8] = 1.0
    got = np.asarray(_pivot_search(
        _put(strip).astype(jnp.bfloat16), jnp.int32(0), _put(used),
        m=m, b=b, pivot=True, interpret=False))
    assert len(np.unique(got)) == b
    assert not np.any(got < 8)


def test_hw_panel_factor_composite():
    """The fused factor kernel compiled on hardware: pivot parity with the
    logical search AND the composite reproduces the elimination algebra
    (pivot rows scaled to D^-1 @ D rows, other rows annihilated)."""
    m, b = 256, 32
    rng = np.random.default_rng(13 * m + b)
    strip = rng.standard_normal((m, b)).astype(np.float32)
    used = np.zeros((m, 1), np.float32)
    used[:8] = 1.0

    pivrows, ct, ok = _panel_factor(_put(strip), jnp.int32(0), _put(used),
                                    m=m, b=b, pivot=True, interpret=False)
    assert bool(ok)
    want, _, _ = _panel_pivots_logical(jnp.asarray(strip),
                                       jnp.asarray(used), jnp.int32(0),
                                       m=m, b=b, pivot=True)
    np.testing.assert_array_equal(np.asarray(pivrows), np.asarray(want))

    pr = np.asarray(pivrows)
    c_hw = np.asarray(ct).T.astype(np.float64)
    x_new = strip.astype(np.float64) + c_hw @ strip[pr].astype(np.float64)
    dblk = strip[pr].astype(np.float64)
    dinv = np.linalg.inv(dblk)
    np.testing.assert_allclose(x_new[pr], dinv @ dblk, atol=1e-4)
    mask = np.ones(m, bool)
    mask[pr] = False
    np.testing.assert_allclose(x_new[mask], 0.0, atol=1e-3)


def test_hw_fused_batched_inverse():
    """The fused batched kernel compiled on hardware (the headline path,
    BASELINE configs[2]): residual vs numpy at pack=8, the padded
    non-pow2 route, bf16 I/O, and the singular flag. The CPU suite runs
    this kernel interpret-only with pack=1, so Mosaic lowering of the
    unrolled pack bodies is only exercised here."""
    from gpu_matrix_inversion_tpu.ops.fused import _fused_batched
    from gpu_matrix_inversion_tpu.utils.generators import hollow_random_matrix
    from gpu_matrix_inversion_tpu.utils.residual import relative_residual

    def run(x, pivot=True):
        # interpret=False explicitly: the conftest pins the process default
        # device to CPU, so fused_inverse's tpu_available() auto-detection
        # would silently select interpret mode and this oracle would never
        # compile the kernel. Committed inputs put execution on the TPU.
        with jax.enable_x64(False):
            return _fused_batched(_put(x), pivot=pivot, interpret=False)

    base = np.stack([hollow_random_matrix(128, seed=i) for i in range(8)])
    inv, ok = run(base)
    assert bool(np.all(np.asarray(ok)))
    inv = np.asarray(inv)
    assert max(relative_residual(base[i], inv[i]) for i in range(8)) < 1e-5

    a2 = np.stack([hollow_random_matrix(100, seed=9)])  # pad path
    i2, ok2 = run(a2)
    assert bool(np.asarray(ok2)[0])
    assert relative_residual(a2[0], np.asarray(i2)[0]) < 1e-5

    ib, _ = run(base.astype(jnp.bfloat16))  # bf16 I/O
    rb = relative_residual(base[0], np.asarray(ib, dtype=np.float32)[0])
    assert rb < 5e-3  # bf16 output floor ~2e-4

    _, oks = run(np.ones((1, 128, 128), np.float32))
    assert not bool(np.asarray(oks)[0])


def test_hw_sharded_paths_on_one_device_mesh():
    """The sharded programs executed on the real chip (1-device meshes).

    Two canaries per the wedge protocol: (a) the single-matrix path with
    the Pallas factor kernel active under shard_map; (b) the batched
    dp x tp path. jax.vmap of the Pallas kernels HANGS on the v5e
    (canaried 2026-08-17, chip wedge), so on TPU meshes the batched body
    loops the local batch via lax.map with the kernels active -- this test
    gates that map-of-Pallas lowering stays executable on hardware."""
    from gpu_matrix_inversion_tpu.parallel.mesh import make_device_mesh
    from gpu_matrix_inversion_tpu.parallel.sharded import (
        sharded_batched_inverse, sharded_blocked_inverse)
    from gpu_matrix_inversion_tpu.utils.generators import hollow_random_matrix
    from gpu_matrix_inversion_tpu.utils.residual import relative_residual

    mesh1 = make_device_mesh(1, ("x",), platform=_dev.platform)
    a = hollow_random_matrix(256, seed=31)
    inv, ok = sharded_blocked_inverse(jnp.asarray(a), mesh=mesh1, refine=0)
    assert bool(ok)
    assert relative_residual(a, np.asarray(inv)) < 1e-5

    mesh2 = make_device_mesh((1, 1), ("dp", "tp"), platform=_dev.platform)
    ab = np.stack([hollow_random_matrix(128, seed=s) for s in (41, 42)])
    # (b1) dp-only fused fast path: the gridded fused kernel under
    # shard_map (grid batching inside a mapped body is its own lowering).
    invb, okb = sharded_batched_inverse(jnp.asarray(ab), mesh=mesh2)
    assert bool(np.all(np.asarray(okb)))
    for i in range(2):
        assert relative_residual(ab[i], np.asarray(invb)[i]) < 1e-5

    # (b2) the column-sharded panel body with lax.map over the local batch
    # (unreachable on a 1-device mesh unless the fused route is forced
    # off) -- this is the map-of-Pallas lowering this test originally
    # gated; keep gating it.
    import gpu_matrix_inversion_tpu.parallel.sharded as sh
    orig = sh._batched_fused_route
    sh._batched_fused_route = lambda *a_, **k_: False
    try:
        invb2, okb2 = sharded_batched_inverse(jnp.asarray(ab), mesh=mesh2)
    finally:
        sh._batched_fused_route = orig
    assert bool(np.all(np.asarray(okb2)))
    for i in range(2):
        assert relative_residual(ab[i], np.asarray(invb2)[i]) < 1e-5
