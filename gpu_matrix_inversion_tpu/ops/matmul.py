"""Tiled Pallas matmul: the verification GEMM as a first-class TPU kernel.

Reference C8 (``matrix_multiply.cpp:17-36``) ships a naive O(N^3) OpenCL
GEMM (``simpleMultiply``, one work-item per output element) used only to
verify inverses. The TPU-native counterpart is a classic MXU-tiled Pallas
kernel with a VMEM accumulator -- also serving as the template/kernel-zoo
example for writing new Pallas ops in this codebase.

(The production paths use ``jnp.matmul`` and let XLA tile; this kernel
exists for C8 parity, as a pedagogical reference, and to cross-check XLA's
GEMM in tests.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpu_matrix_inversion_tpu.ops.fused import tpu_available


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _matmul_kernel(a_ref, b_ref, o_ref, acc, *, k_steps: int):
    """Grid (i, j, k): accumulate a (bm, bk) @ (bk, bn) tile product."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc[:, :] = jnp.zeros_like(acc)

    # Precision by operand dtype (ADVICE r2): for fp32 operands HIGHEST —
    # the TPU default would round them to bf16 inside the kernel, defeating
    # a VERIFICATION gemm's whole purpose. For native bf16 operands DEFAULT —
    # one bf16 MXU pass into the fp32 accumulator is already exact, and bf16
    # operands with an fp32 contract precision fail to Mosaic-compile
    # ("Bad lhs type"; same rule as ops/blocked.py's search dots).
    prec = (jax.lax.Precision.DEFAULT if a_ref.dtype == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)
    acc[:, :] += jnp.dot(a_ref[:, :], b_ref[:, :],
                         preferred_element_type=jnp.float32,
                         precision=prec)

    @pl.when(k == k_steps - 1)
    def _():
        o_ref[:, :] = acc[:, :].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bm", "bn", "bk", "interpret"))
def _matmul(a, b, *, bm: int, bn: int, bk: int, interpret: bool):
    m, k = a.shape
    _, n = b.shape
    grid = (pl.cdiv(m, bm), pl.cdiv(n, bn), pl.cdiv(k, bk))
    kernel = functools.partial(_matmul_kernel, k_steps=grid[2])
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), a.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        interpret=interpret,
    )(a, b)


def pallas_matmul(a: jax.Array, b: jax.Array, *, block: int = 256):
    """``a @ b`` via the tiled Pallas kernel (fp32/bf16, 2D operands).

    Pads to tile multiples; fp32 accumulate. Reference simpleMultiply
    parity (matrix_multiply.cpp:17-36) at MXU speed instead of
    one-thread-per-element.
    """
    if a.ndim != 2 or b.ndim != 2 or a.shape[1] != b.shape[0]:
        raise ValueError(f"bad matmul shapes {a.shape} x {b.shape}")
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    if a.dtype not in (jnp.float32, jnp.bfloat16):
        raise NotImplementedError(f"pallas_matmul serves fp32/bf16, "
                                  f"got {a.dtype}")
    m, k = a.shape
    _, n = b.shape
    bm = bn = bk = block
    mp, kp, np_ = _round_up(m, bm), _round_up(k, bk), _round_up(n, bn)
    if (mp, kp) != (m, k):
        a = jnp.zeros((mp, kp), a.dtype).at[:m, :k].set(a)
    if (kp, np_) != (k, n):
        b = jnp.zeros((kp, np_), b.dtype).at[:k, :n].set(b)
    interpret = not tpu_available()
    with jax.enable_x64(False):
        out = _matmul(a, b, bm=bm, bn=bn, bk=bk, interpret=interpret)
    return out[:m, :n]
