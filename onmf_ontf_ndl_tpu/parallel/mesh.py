"""Device-mesh helpers."""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh

__all__ = ["make_mesh"]


def make_mesh(axes: dict[str, int] | None = None, devices=None) -> Mesh:
    """Build a mesh over the available devices.

    ``axes`` maps axis names to sizes (row-major over the device list);
    default is a 1-D ``{"dp": <all devices>}`` mesh.
    """
    explicit = devices is not None
    if devices is None:
        devices = jax.devices()
    if axes is None:
        axes = {"dp": len(devices)}
    sizes = tuple(axes.values())
    if int(np.prod(sizes)) != len(devices):
        raise ValueError(
            f"mesh axes {axes} need {np.prod(sizes)} devices, "
            f"have {len(devices)}")
    if not explicit:
        # topology-aware ordering: on a real TPU slice a naive row-major
        # reshape can put non-ICI-adjacent chips on one mesh axis and
        # push every psum over slow links
        try:
            from jax.experimental import mesh_utils

            return Mesh(mesh_utils.create_device_mesh(sizes, devices),
                        tuple(axes.keys()))
        except Exception:
            pass                       # fall back to row-major
    arr = np.asarray(devices).reshape(sizes)
    return Mesh(arr, tuple(axes.keys()))
