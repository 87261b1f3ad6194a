"""Benchmark sweep CLI: the reference's experiment protocol, TPU-native.

Reproduces the reference drivers (SURVEY.md C9/C13/C14):

- C++ ``main()`` sweep: N = 10 -> 2000 step 10, then -> 16000 step 1000,
  hollow-diagonal random matrices, per-phase timings + residual per row,
  appended to a text file (``main_file.cpp:27-83``).
- PyOpenCL ``__main__`` sweep: same ramp, compute/total timings + residual
  (``matrix_inv_pyopencl.py:358-370``).
- NumPy baseline sweep: N = 10 -> 2000 step 10, then -> 5000 step 1000
  (``matrix_inv_numpy.py:7-34``).

Differences by design: output paths are CLI flags instead of hardcoded
Windows thesis paths; the error column reports BOTH the reference's quirky
``sqrt(N) - ||inv @ A||_F`` metric and the proper normalized residual
(SURVEY.md section 4 flags the former as comparing norms, not residuals);
and timings sync through a scalar probe (tunnel-safe).

Usage::

    python -m gpu_matrix_inversion_tpu.benchmarks.sweep \
        --method auto --max-n 4096 --out sweep_tpu.txt
    python -m gpu_matrix_inversion_tpu.benchmarks.sweep --numpy-baseline
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def reference_sizes(max_n: int, *, coarse_step: int = 1000):
    """The reference's N ramp (main_file.cpp:73-78): 10..2000 step 10, then
    step 1000 up to max_n."""
    n = 10
    while n <= max_n:
        yield n
        n += 10 if n < 2000 else coarse_step


def _done_sizes(path: str) -> set:
    """Sizes already present in an output file -- the reference's only
    resume aid is incremental txt appends (main_file.cpp:39, :81); we make
    that an explicit --resume that skips completed rows."""
    import os
    done = set()
    if path and path != "-" and os.path.exists(path):
        with open(path) as f:
            for line in f:
                head = line.split(None, 1)[0] if line.strip() else ""
                if head.isdigit():
                    done.add(int(head))
    return done


def sweep_numpy(max_n: int, out, *, repeat: int = 1, skip=(), sizes=None):
    """C14 parity: NumPy/LAPACK CPU baseline sweep (matrix_inv_numpy.py)."""
    from gpu_matrix_inversion_tpu.utils.generators import hollow_random_matrix
    from gpu_matrix_inversion_tpu.utils.residual import (
        reference_error_metric, relative_residual)

    for n in (sizes if sizes is not None else reference_sizes(max_n)):
        if n in skip:
            continue
        a = hollow_random_matrix(n, seed=n)
        best = float("inf")
        for _ in range(repeat):
            t0 = time.monotonic()
            inv = np.linalg.inv(a)
            best = min(best, time.monotonic() - t0)
        err = reference_error_metric(a, inv)
        res = relative_residual(a, inv)
        out.write(f"{n} {best:.6f} {err:.6e} {res:.3e}\n")
        out.flush()


def _spd_matrix(n: int, *, seed: int, dtype=np.float32):
    """SPD test input for the Cholesky family: ``G Gᵀ/n + I`` (the analog of
    the reference's hollow recipe, which has a zero diagonal and is never
    SPD)."""
    rng = np.random.default_rng(seed)
    g = rng.standard_normal((n, n))
    return (np.matmul(g, g.T) / n + np.eye(n)).astype(dtype)


def sweep_tpu(max_n: int, out, *, method: str = "auto", repeat: int = 3,
              dtype=np.float32, skip=(), sizes=None, amortize: int = 0,
              strict_verify: bool = False, spd: bool = False):
    """C9/C13 parity: device sweep with Res-style phase timings per row.

    Row format: ``N t_buffers t_compile t_compute t_readback t_total
    err_reference resid_normalized [t_amortized] [max|AX-I|]`` -- the phase
    slots map onto the reference's Res.times (FP32_bench.cpp:256-443;
    SURVEY.md section 5). With ``amortize=k > 1`` a trailing column reports
    the per-inversion time net of the ~26 ms tunnel dispatch floor (k
    inversions inside one jitted scan, differenced against the single
    call); that is the honest steady-state compute time on this setup.
    ``strict_verify`` appends the on-device max elementwise |A@X - I|
    (the reference's identity self-check tier, FP32.cpp:814-835).
    """
    import jax
    import jax.numpy as jnp
    from jax import lax
    from gpu_matrix_inversion_tpu.utils.config import enable_compile_cache
    enable_compile_cache()  # every new shape recompiles; persist them
    from gpu_matrix_inversion_tpu.models.solver import inverse
    from gpu_matrix_inversion_tpu.utils.generators import hollow_random_matrix
    from gpu_matrix_inversion_tpu.utils.residual import (
        reference_error_metric, relative_residual)

    # Warm the tunnel + dispatch path before the first timed row: round 1's
    # artifact recorded 447 s of one-time warm-up inside row one's
    # t_buffers.
    warm = jax.device_put(jnp.zeros((128, 128), dtype=dtype))
    float(jnp.sum(warm))

    for n in (sizes if sizes is not None else reference_sizes(max_n)):
        if n in skip:
            continue
        a_host = (_spd_matrix(n, seed=n, dtype=dtype) if spd
                  else hollow_random_matrix(n, seed=n, dtype=dtype))

        t0 = time.perf_counter()
        a = jax.device_put(jnp.asarray(a_host))
        float(jnp.sum(a))  # force the transfer
        t_buffers = time.perf_counter() - t0

        def probe(x):
            inv, ok = inverse(x, method=method)
            return jnp.sum(inv) + ok.astype(inv.dtype), inv

        t0 = time.perf_counter()
        s, inv = probe(a)
        float(s)
        t_compile = time.perf_counter() - t0  # trace+compile+1st run

        t_compute = float("inf")
        for _ in range(repeat):
            t0 = time.perf_counter()
            s, inv = probe(a)
            float(s)  # scalar sync: full readback measures the network
            t_compute = min(t_compute, time.perf_counter() - t0)

        t0 = time.perf_counter()
        inv_host = np.asarray(inv)
        t_read = time.perf_counter() - t0

        err = reference_error_metric(a_host, inv_host)
        res = relative_residual(a_host, inv_host)
        total = t_buffers + t_compile + t_compute + t_read
        row = (f"{n} {t_buffers:.6f} {t_compile:.6f} {t_compute:.6f} "
               f"{t_read:.6f} {total:.6f} {err:.6e} {res:.3e}")

        if amortize > 1:
            k = amortize

            @jax.jit
            def probe_k(x):
                def body(c, _):
                    invk, okk = inverse(x + c, method=method)
                    return c + jnp.asarray(1e-7, x.dtype), jnp.sum(invk)
                c, outs = lax.scan(body, jnp.asarray(0, a.dtype),
                                   None, length=k)
                return jnp.sum(outs) + c

            float(probe_k(a))  # compile
            t_k = float("inf")
            for _ in range(repeat):
                t0 = time.perf_counter()
                float(probe_k(a))
                t_k = min(t_k, time.perf_counter() - t0)
            row += f" {max(t_k - t_compute, 0.0) / (k - 1):.6f}"

        if strict_verify:
            from gpu_matrix_inversion_tpu.api import _strict_identity_error
            row += f" {_strict_identity_error(a, inv):.3e}"

        out.write(row + "\n")
        out.flush()


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="Matrix-inversion benchmark sweep (reference protocol)")
    ap.add_argument("--max-n", type=int, default=2000,
                    help="largest matrix order (reference goes to 16000)")
    ap.add_argument("--method", default="auto",
                    choices=["auto", "spec", "fused", "blocked", "lu",
                             "cholesky", "ns", "sharded"],
                    help="inversion path (models/solver.py METHODS); "
                         "'sharded' runs the mesh path over all visible "
                         "devices")
    ap.add_argument("--repeat", type=int, default=3,
                    help="timed repetitions per size (REP, main_file.cpp:16)")
    ap.add_argument("--out", default="-",
                    help="output file (reference: hardcoded txt paths)")
    ap.add_argument("--numpy-baseline", action="store_true",
                    help="run the NumPy CPU baseline sweep instead (C14)")
    ap.add_argument("--fp64", action="store_true",
                    help="FP64 sweep (reference FP64_bench path)")
    ap.add_argument("--resume", action="store_true",
                    help="skip sizes already present in --out")
    ap.add_argument("--sizes", default=None,
                    help="comma-separated explicit sizes (overrides the "
                         "reference ramp; useful on TPU where every new "
                         "shape recompiles)")
    ap.add_argument("--amortize", type=int, default=0,
                    help="if k > 1, append a per-inversion time amortized "
                         "over k in-jit runs (nets out the ~26 ms tunnel "
                         "dispatch floor; costs one extra compile per size)")
    ap.add_argument("--strict-verify", action="store_true",
                    help="append the on-device max|A@X - I| column (the "
                         "reference's identity self-check, FP32.cpp:814-835)")
    ap.add_argument("--spd", action="store_true",
                    help="use SPD inputs (G G^T/n + I) instead of the "
                         "hollow recipe; pair with --method cholesky")
    args = ap.parse_args(argv)

    skip = _done_sizes(args.out) if args.resume else set()
    sizes = ([int(x) for x in args.sizes.split(",")] if args.sizes else None)
    out = sys.stdout if args.out == "-" else open(args.out, "a")
    try:
        if args.numpy_baseline:
            sweep_numpy(args.max_n, out, repeat=args.repeat, skip=skip,
                        sizes=sizes)
        else:
            dtype = np.float64 if args.fp64 else np.float32
            if args.fp64:
                import jax
                jax.config.update("jax_enable_x64", True)
            sweep_tpu(args.max_n, out, method=args.method,
                      repeat=args.repeat, dtype=dtype, skip=skip,
                      sizes=sizes, amortize=args.amortize,
                      strict_verify=args.strict_verify, spd=args.spd)
    finally:
        if out is not sys.stdout:
            out.close()


if __name__ == "__main__":
    main()
