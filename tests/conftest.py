"""Test config: run on CPU with 8 virtual devices (SURVEY.md section 4).

Multi-chip sharding tests run against a virtual CPU mesh via
``xla_force_host_platform_device_count`` -- no TPU pod required. x64 is
enabled so the FP64 API paths (reference matrix_inversion_FP64 /
no_pivots parity) are exercised with real double precision.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

# Under the axon TPU tunnel the JAX_PLATFORMS *env var* is ignored (the
# plugin registers natively), but the PROGRAMMATIC flag is honored -- and
# it must be: backend discovery otherwise initializes the axon client,
# which HANGS whenever the chip is wedged or the tunnel relay is down
# (observed 2026-08-17: the whole CPU suite hung for that reason). With
# the flag set the suite never touches the remote chip at all. The
# on-hardware oracle gate (test_tpu_oracle.py, MATINV_TPU_TESTS=1) is the
# one run that NEEDS the remote platform, so it opts out.
if os.environ.get("MATINV_TPU_TESTS") != "1":
    jax.config.update("jax_platforms", "cpu")

# Belt and braces: pin the default device too (Pallas kernels run in
# interpret mode on CPU).
try:
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
except RuntimeError:
    pass
