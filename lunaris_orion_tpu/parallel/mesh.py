"""Device-mesh construction."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


DATA_AXIS = "data"
MODEL_AXIS = "model"
AXES = (DATA_AXIS, MODEL_AXIS)


def make_mesh(mesh_shape: Optional[Tuple[int, int]] = None,
              devices: Optional[Sequence[jax.Device]] = None,
              axis_names: Tuple[str, str] = AXES) -> Mesh:
    """('data', 'model') mesh. Default: all devices on the data axis.

    On a v5e-8 the default (8, 1) is pure DP riding ICI; (4, 2) adds
    TP/EP over the model axis.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if mesh_shape is None:
        mesh_shape = (n, 1)
    assert mesh_shape[0] * mesh_shape[1] == n, (mesh_shape, n)
    arr = np.asarray(devices).reshape(mesh_shape)
    return Mesh(arr, axis_names)


def local_mesh() -> Mesh:
    """Single-process default mesh over all visible devices."""
    return make_mesh()
