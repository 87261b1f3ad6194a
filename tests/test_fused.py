"""Golden tests of the fused Pallas VMEM kernel vs the jnp spec / numpy.
Runs in Pallas interpret mode on CPU; compiled on real TPU (SURVEY.md sec 4)."""

import numpy as np
import pytest

from gpu_matrix_inversion_tpu.ops.fused import fused_inverse, FUSED_MAX_N
from gpu_matrix_inversion_tpu.utils.generators import hollow_random_matrix
from gpu_matrix_inversion_tpu.utils.residual import relative_residual


def test_fused_128():
    a = hollow_random_matrix(128, seed=20)
    inv, ok = fused_inverse(a)
    assert bool(ok)
    assert relative_residual(a, np.asarray(inv)) < 1e-5


def test_fused_padding_non_multiple():
    a = hollow_random_matrix(100, seed=21)
    inv, ok = fused_inverse(a)
    assert bool(ok)
    assert inv.shape == (100, 100)
    assert relative_residual(a, np.asarray(inv)) < 1e-5


def test_fused_batched():
    a = np.stack([hollow_random_matrix(64, seed=s) for s in range(3)])
    inv, ok = fused_inverse(a)
    assert inv.shape == a.shape
    assert bool(np.all(np.asarray(ok)))
    for i in range(3):
        assert relative_residual(a[i], np.asarray(inv)[i]) < 1e-5


def test_fused_singular_flagged():
    a = np.zeros((32, 32), dtype=np.float32)
    _, ok = fused_inverse(a)
    assert not bool(ok)


def test_fused_rejects_fp64():
    a = hollow_random_matrix(32, seed=22, dtype=np.float64)
    with pytest.raises(NotImplementedError):
        fused_inverse(a)


def test_fused_rejects_oversize():
    a = np.eye(FUSED_MAX_N + 128, dtype=np.float32)
    with pytest.raises(NotImplementedError):
        fused_inverse(a)


def test_fused_no_pivot():
    from gpu_matrix_inversion_tpu.utils.generators import well_conditioned_matrix
    a = well_conditioned_matrix(64, seed=23)
    inv, ok = fused_inverse(a, pivot=False)
    assert bool(ok)
    assert relative_residual(a, np.asarray(inv)) < 1e-5


def test_fused_bfloat16_smoke():
    import jax.numpy as jnp
    a = hollow_random_matrix(64, seed=24).astype(jnp.bfloat16)
    inv, ok = fused_inverse(a)
    assert bool(ok)
    assert inv.dtype == jnp.bfloat16
    # bf16 has ~3 significant digits; loose gate.
    assert relative_residual(np.asarray(a, np.float64),
                             np.asarray(inv, np.float64)) < 1e-2


def test_blocked_bfloat16_io():
    """bf16 blocked path: bf16 in/out, fp32 compute (VERDICT r1 #6)."""
    import jax.numpy as jnp
    from gpu_matrix_inversion_tpu.ops.blocked import blocked_inverse
    a = hollow_random_matrix(160, seed=31).astype(jnp.bfloat16)
    inv, ok = blocked_inverse(a, block_size=64, refine=0)
    assert bool(ok) and inv.dtype == jnp.bfloat16
    a64 = np.asarray(a, np.float64)
    inv64 = np.asarray(inv, np.float64)
    r = np.linalg.norm(a64 @ inv64 - np.eye(160)) / (
        np.linalg.norm(a64) * np.linalg.norm(inv64))
    assert r < 5e-3  # bf16 output quantization floor


def test_fused_pack_gt1_interpret(monkeypatch):
    """The unrolled multi-system kernel body (pack > 1, what the TPU always
    runs) exercised in interpret mode: 3 systems at pack=2 forces one
    identity-padded program and multi-system block indexing."""
    monkeypatch.setenv("MATINV_FUSED_PACK", "2")
    from gpu_matrix_inversion_tpu.ops import fused
    fused._fused_batched.clear_cache()
    try:
        a = np.stack([hollow_random_matrix(96, seed=s) for s in (7, 8, 9)])
        inv, ok = fused_inverse(a)
        assert bool(np.all(np.asarray(ok)))
        for i in range(3):
            assert relative_residual(a[i], np.asarray(inv)[i]) < 1e-5
    finally:
        monkeypatch.delenv("MATINV_FUSED_PACK")
        fused._fused_batched.clear_cache()
