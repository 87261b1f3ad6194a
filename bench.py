"""Headline benchmark: prints ONE JSON line for the driver.

Metric: batched 128x128 FP32 inversions/sec/chip (vmapped fused Pallas
kernel, BASELINE.json configs[2]) with ``vs_baseline`` = speedup over
single-core NumPy/LAPACK ``np.linalg.inv`` measured live on this host
(target >= 5x, BASELINE.md). Extra fields report the 4096^2 blocked-path
GFLOP/s (4*N^3 fixColumn flop model, matrix_inversion_FP64.cpp:753-755).

Timing protocol: computations are jitted to a scalar probe so device sync
costs 4 bytes of readback -- on tunneled TPU setups, reading back a full
matrix measures the network, not the chip.
"""

from __future__ import annotations

import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def _bench(fn, *args, reps: int = 3) -> float:
    out = fn(*args)
    float(np.asarray(out))  # warm-up + sync
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        float(np.asarray(out))
        times.append(time.perf_counter() - t0)
    return min(times)


def main() -> None:
    from gpu_matrix_inversion_tpu.ops.fused import fused_inverse
    from gpu_matrix_inversion_tpu.ops.blocked import blocked_inverse
    from gpu_matrix_inversion_tpu.utils.generators import hollow_random_matrix
    from gpu_matrix_inversion_tpu.utils.residual import relative_residual

    # --- headline: batched 128^2 throughput (configs[2]) ------------------
    bs, n = 4096, 128
    base = np.stack([hollow_random_matrix(n, seed=i) for i in range(8)])
    batch = jnp.asarray(np.tile(base, (bs // 8, 1, 1)))

    @jax.jit
    def probe_batched(x):
        inv, ok = fused_inverse(x)
        return jnp.sum(inv) + jnp.sum(ok)

    t_batched = _bench(probe_batched, batch)
    inv_per_s = bs / t_batched

    # NumPy/LAPACK single-core baseline on the same matrices.
    np.linalg.inv(base[0])  # warm-up
    t0 = time.perf_counter()
    n_np = 64
    for i in range(n_np):
        np.linalg.inv(base[i % 8])
    t_np = (time.perf_counter() - t0) / n_np
    np_inv_per_s = 1.0 / t_np

    # --- secondary: 4096^2 blocked Gauss-Jordan (configs[1]) --------------
    n_big = 4096
    a_big = jnp.asarray(hollow_random_matrix(n_big, seed=1))

    @jax.jit
    def probe_blocked(a):
        inv, ok = blocked_inverse(a, block_size=256)
        return jnp.sum(inv) + ok.astype(jnp.float32)

    @jax.jit
    def probe_blocked_raw(a):
        inv, ok = blocked_inverse(a, block_size=256, refine=0)
        return jnp.sum(inv) + ok.astype(jnp.float32)

    @jax.jit
    def probe_lu(a):
        from gpu_matrix_inversion_tpu.ops.lu import lu_inverse_fast
        inv, ok = lu_inverse_fast(a)
        return jnp.sum(inv) + ok.astype(jnp.float32)

    t_blocked = _bench(probe_blocked, a_big)
    t_blocked_raw = _bench(probe_blocked_raw, a_big)
    t_lu = _bench(probe_lu, a_big)
    gflops_blocked = 4 * n_big**3 / t_blocked / 1e9

    # --- correctness gate (BASELINE: <=1e-4 rel residual) ------------------
    inv_small, ok_small = fused_inverse(np.asarray(base[0]))
    resid = relative_residual(base[0], np.asarray(inv_small))

    result = {
        "metric": "batched_128x128_fp32_inversions_per_sec",
        "value": round(inv_per_s, 1),
        "unit": "inv/s",
        "vs_baseline": round(inv_per_s / np_inv_per_s, 2),
        "batch": bs,
        "numpy_inv_per_s": round(np_inv_per_s, 1),
        "blocked_4096_ms": round(t_blocked * 1e3, 1),
        "blocked_4096_ms_no_refine": round(t_blocked_raw * 1e3, 1),
        "lu_getri_4096_ms": round(t_lu * 1e3, 1),
        "blocked_4096_gflops_4n3": round(gflops_blocked, 1),
        "residual_128_fused": float(f"{resid:.3g}"),
        "ok": bool(ok_small),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
