"""Linear solves and mixed-precision refinement.

The reference only ever forms explicit inverses (its README concedes to
LAPACK's LU solves, README.md:62); this library ships the LAPACK-shaped
path too: getrf/getrs triangular solves plus classic iterative refinement
reusing the factorization (the dsgesv pattern), and a config-driven
session object replacing the reference's compile-time `#define` variant
selection (main_file.cpp:14-18).
"""
import numpy as np
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # run as a script without installing
import gpu_matrix_inversion_tpu as mi

n = 512
rng = np.random.default_rng(5)
a = rng.uniform(0, 100, (n, n)).astype(np.float32)
np.fill_diagonal(a, 0)
b = rng.standard_normal((n, 4)).astype(np.float32)

# LU solve (auto-routes to blocked getrf + triangular solves at this size).
x, ok = mi.solve(a, b)
print("solve ok:", bool(ok),
      "rel err:", float(np.linalg.norm(a @ np.asarray(x) - b)
                        / np.linalg.norm(b)))

# Iterative refinement: fp32 factorization, near-fp64 solution quality.
xr, okr = mi.solve(a, b, refine_iters=2)
print("refined rel err:", float(np.linalg.norm(a @ np.asarray(xr) - b)
                                / np.linalg.norm(b)))

# Session API: pick dtype/method/refinement once, reuse everywhere
# (the runtime replacement for the reference's #define matrix).
inv = mi.Inverter(dtype="float32", method="blocked", refine_iters=1)
xi, oki = inv.inverse(a)
print("Inverter ok:", bool(oki), "max|A@X - I|:",
      float(np.abs(a @ np.asarray(xi) - np.eye(n)).max()))
