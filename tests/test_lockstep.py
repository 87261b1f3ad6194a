"""Tests of the lockstep-batched blocked path (ops/lockstep.py).

The lockstep kernel factors K matrices per launch so the serial
panel-factor chain is paid once per panel instead of once per matrix
(VERDICT r3 #5). Its contract: BIT-identical results to the per-matrix
blocked path (same packed-key pivots, same arithmetic, same group
composites)."""

import os
from unittest import mock

import numpy as np
import jax.numpy as jnp

from gpu_matrix_inversion_tpu.ops.blocked import (_blocked_inverse_jit,
                                                  blocked_inverse)
from gpu_matrix_inversion_tpu.ops.lockstep import (_lockstep_inverse_jit,
                                                   _lockstep_k)
from gpu_matrix_inversion_tpu.utils.generators import hollow_random_matrix
from gpu_matrix_inversion_tpu.utils.residual import relative_residual


def test_lockstep_gate():
    f32 = jnp.float32
    # Opt-in: measured slower-or-equal than lax.map on the v5e (module
    # docstring), so the default is OFF.
    assert _lockstep_k(16, 1024, 128, f32) == 0
    with mock.patch.dict(os.environ, {"MATINV_LOCKSTEP": "1"}):
        assert _lockstep_k(16, 1024, 128, f32) == 8
        assert _lockstep_k(16, 2048, 128, f32) == 4
        assert _lockstep_k(16, 8192, 128, f32) == 0   # past the VMEM cap
        assert _lockstep_k(3, 1024, 128, f32) == 3    # capped by the batch
        assert _lockstep_k(1, 1024, 128, f32) == 0    # no batch
        assert _lockstep_k(16, 1024, 128, jnp.float64) == 0
        assert _lockstep_k(16, 1024, 128, f32, search_bf16=True) == 0


def test_lockstep_matches_per_matrix_bitexact():
    """Odd batch (pad path) + n not a multiple of b + a tail group: the
    lockstep result must equal the per-matrix blocked path bit-for-bit."""
    B, n = 5, 200
    batch = np.stack([hollow_random_matrix(n, seed=50 + i)
                      for i in range(B)])
    a = jnp.asarray(batch)
    inv_ls, ok_ls = _lockstep_inverse_jit(
        a, pivot=True, b=32, k=2, interpret=True, precision="highest",
        group_size=4, refine=0)
    inv_ref, ok_ref = _blocked_inverse_jit(
        a, pivot=True, block_size=32, use_pallas=True, interpret=True,
        precision="highest", search_bf16=False, group_size=4, refine=0)
    assert bool(np.all(np.asarray(ok_ls))) and bool(np.all(np.asarray(ok_ref)))
    np.testing.assert_array_equal(np.asarray(inv_ls), np.asarray(inv_ref))


def test_lockstep_no_pivot_matches():
    B, n = 4, 96
    batch = np.stack([
        hollow_random_matrix(n, seed=60 + i) + np.eye(n, dtype=np.float32) * 500.0
        for i in range(B)])
    a = jnp.asarray(batch)
    inv_ls, ok_ls = _lockstep_inverse_jit(
        a, pivot=False, b=16, k=4, interpret=True, precision="highest",
        group_size=3, refine=0)
    inv_ref, ok_ref = _blocked_inverse_jit(
        a, pivot=False, block_size=16, use_pallas=True, interpret=True,
        precision="highest", search_bf16=False, group_size=3, refine=0)
    assert bool(np.all(np.asarray(ok_ls)))
    np.testing.assert_array_equal(np.asarray(inv_ls), np.asarray(inv_ref))


def test_lockstep_flags_singular_member_only():
    B, n = 4, 64
    batch = np.stack([hollow_random_matrix(n, seed=70 + i)
                      for i in range(B)])
    batch[2] = 1.0  # rank-1: singular
    _, ok = _lockstep_inverse_jit(
        jnp.asarray(batch), pivot=True, b=16, k=2, interpret=True,
        precision="highest", group_size=2, refine=0)
    ok = np.asarray(ok)
    assert not bool(ok[2])
    assert bool(ok[0]) and bool(ok[1]) and bool(ok[3])


def test_blocked_inverse_batch_routes_lockstep():
    """The public batched entry point must give the same answer with the
    lockstep route opted in (MATINV_LOCKSTEP=1) and off (the default
    lax.map of the single-matrix program)."""
    B, n = 3, 160
    batch = np.stack([hollow_random_matrix(n, seed=80 + i)
                      for i in range(B)])
    with mock.patch.dict(os.environ, {"MATINV_LOCKSTEP": "1"}):
        inv_on, ok_on = blocked_inverse(batch, block_size=32, refine=1)
    inv_off, ok_off = blocked_inverse(batch, block_size=32, refine=1)
    assert bool(np.all(np.asarray(ok_on))) and bool(np.all(np.asarray(ok_off)))
    np.testing.assert_allclose(np.asarray(inv_on), np.asarray(inv_off),
                               rtol=0, atol=0)
    for i in range(B):
        assert relative_residual(batch[i], np.asarray(inv_on)[i]) < 1e-5
