"""Static lint: every device dot must carry an explicit ``precision=``.

On TPU the *default* f32 ``dot_general`` rounds its data operands to
bf16 — including inside Pallas kernels, and including dots with a one-hot
operand (the one-hot does not make the contraction exact).  That silent
~1e-3 rounding caused two real bugs in this repo:

- round 1: default-precision GEMMs cost ~4 digits of residual
  (DESIGN.md "performance facts");
- round 2: two unguarded ``lax.dot_general`` calls inside the sub-blocked
  pivot-search kernel corrupted the search working set and occasionally
  selected a catastrophically small pivot (residual cliffs at e.g.
  n=1950/5000 on hardware, exact on CPU interpret so tests never saw it).

CPU tests cannot catch this class (CPU default precision is exact), so we
enforce it statically: parse every module in the device-compute packages
and require a ``precision`` keyword on every jnp/lax dot-family call.
Intentionally lower tiers (e.g. the Newton-Schulz correction GEMM one
tier down, or a bf16 search path) still pass — the requirement is that
the choice be *explicit*.
"""

from __future__ import annotations

import ast
import pathlib

import gpu_matrix_inversion_tpu as pkg

DOT_NAMES = {"matmul", "dot", "dot_general", "einsum", "tensordot", "vdot"}
# Packages whose code runs on device (utils/ residual checks are host-side
# NumPy, which is exact).
DEVICE_PACKAGES = ("ops", "models", "parallel")


def _dot_calls_missing_precision(path: pathlib.Path):
    tree = ast.parse(path.read_text(), filename=str(path))
    bad = []
    for node in ast.walk(tree):
        if not isinstance(node, ast.Call):
            continue
        func = node.func
        if not (isinstance(func, ast.Attribute) and func.attr in DOT_NAMES):
            continue
        # Only jnp./lax./jax.lax. call sites; host-side np. dots are exact.
        base = func.value
        root = None
        if isinstance(base, ast.Name):
            root = base.id
        elif isinstance(base, ast.Attribute) and isinstance(base.value,
                                                            ast.Name):
            root = f"{base.value.id}.{base.attr}"
        if root not in {"jnp", "lax", "jax", "jax.lax", "jax.numpy"}:
            continue
        if not any(kw.arg == "precision" for kw in node.keywords):
            bad.append(f"{path.name}:{node.lineno} {ast.unparse(func)}")
    return bad


def test_every_device_dot_has_explicit_precision():
    root = pathlib.Path(pkg.__file__).parent
    offenders = []
    for sub in DEVICE_PACKAGES:
        for path in sorted((root / sub).glob("*.py")):
            offenders.extend(_dot_calls_missing_precision(path))
    assert not offenders, (
        "device dots without explicit precision= (TPU default silently "
        "rounds f32 operands to bf16):\n  " + "\n  ".join(offenders))
