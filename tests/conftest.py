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

# Under some TPU tunnel platforms JAX_PLATFORMS=cpu is ignored; pin the
# default device to CPU explicitly so the suite never depends on (or wedges
# with) the remote chip. Pallas kernels run in interpret mode on CPU.
try:
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
except RuntimeError:
    pass
