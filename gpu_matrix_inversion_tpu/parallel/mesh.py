"""Device-mesh helpers.

TPU-native replacement for the reference's hardcoded device selection
(``platforms[0]/devices[0]``, matrix_inversion_FP32.cpp:293, :337): meshes
are first-class, sized by request, and can be pinned to a platform (the test
suite builds 8-way CPU meshes via ``xla_force_host_platform_device_count``).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import jax
from jax.sharding import Mesh


def default_platform_devices():
    """Devices of the platform computations land on by default.

    Honors a pinned ``jax_default_device`` -- under the axon TPU tunnel
    ``JAX_PLATFORMS=cpu`` is ignored (CLAUDE.md hazard #1), so the pinned
    device's platform, not the global default list, decides where implicit
    meshes are built.
    """
    default = getattr(jax.config, "jax_default_device", None)
    if default is not None:
        # jax also accepts a platform STRING here ("cpu", "cpu:0") -- a
        # Device attribute access would crash on it (AttributeError).
        if isinstance(default, str):
            platform = default.split(":", 1)[0]
        else:
            platform = getattr(default, "platform", None)
        if platform:
            try:
                return jax.devices(platform)
            except RuntimeError:  # unknown/uninitialized platform name
                pass
    return jax.devices()


def make_device_mesh(shape: Sequence[int] | int,
                     axis_names: Tuple[str, ...] = ("x",),
                     platform: Optional[str] = None) -> Mesh:
    """Build a ``jax.sharding.Mesh`` of the requested shape.

    Args:
      shape: total devices (int) or per-axis sizes.
      axis_names: mesh axis names (e.g. ``("dp", "tp")``).
      platform: pin to a platform (``"cpu"``/``"tpu"``); defaults to the
        platform with the most devices available.
    """
    if isinstance(shape, int):
        shape = (shape,)
    shape = tuple(int(s) for s in shape)
    n = int(np.prod(shape))

    if platform is not None:
        devices = jax.devices(platform)
    else:
        devices = default_platform_devices()
        if len(devices) < n:
            # Fall back to the (virtual) CPU backend, which can expose more
            # devices than the default platform via XLA_FLAGS.
            try:
                cpus = jax.devices("cpu")
                if len(cpus) >= n:
                    devices = cpus
            except RuntimeError:
                pass
    if len(devices) < n:
        raise ValueError(
            f"mesh of {n} devices requested but only {len(devices)} "
            f"available (platform={platform or 'any'})")
    arr = np.asarray(devices[:n]).reshape(shape)
    if len(axis_names) != len(shape):
        raise ValueError(f"{len(shape)} mesh dims need {len(shape)} axis "
                         f"names, got {axis_names}")
    return Mesh(arr, axis_names)
