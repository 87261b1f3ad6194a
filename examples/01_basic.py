"""Basic usage: the reference's product API and the high-level API.

Reference equivalent: MATLAB `clib.matInv.matrix_inv_32(b, N)` via clibgen
(README.md:49-51) or C++ `matrix_inversion_FP32(vector, N)` (headers.h:8).
"""
import numpy as np
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # run as a script without installing
import gpu_matrix_inversion_tpu as mi

n = 256
a = np.random.default_rng(0).uniform(0, 100, (n, n)).astype(np.float32)
np.fill_diagonal(a, 0)  # the reference's "hollow" test matrices

# Flat row-major vector in, flat inverse out, EMPTY on invalid/singular.
out = mi.matrix_inv_32(a.reshape(-1), n)
assert out.size == n * n

# High-level API: (inverse, ok) with automatic algorithm dispatch.
x, ok = mi.inverse(a)
print("ok:", bool(ok), "max|A@X - I|:",
      float(np.abs(a @ np.asarray(x) - np.eye(n)).max()))

# Singular input -> empty vector (reference mat_inv_32.cpp:389-394).
print("singular ->", mi.matrix_inv_32(np.ones(16, np.float32), 4).size, "elements")
