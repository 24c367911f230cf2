"""Triangulation serialization (checkpoint/resume analog).

The reference has no checkpointing; its closest artifact is the text dump
``output_triangulation`` (integrity_check.c:246-284).  The SoA device
arrays serialize trivially; this module round-trips a DeviceTriangulation
(+ optional response vector) through a single ``.npz`` file.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..models.device_tri import DeviceTriangulation


def save(path, tri: DeviceTriangulation, response=None) -> None:
    arrays = {f: np.asarray(getattr(tri, f)) for f in tri._fields if f != "grid_res"}
    arrays["grid_res"] = np.asarray(tri.grid_res)
    if response is not None:
        arrays["response"] = np.asarray(response)
    np.savez_compressed(path, **arrays)


def load(path):
    """Returns (DeviceTriangulation, response-or-None)."""
    with np.load(path) as f:
        fields = {
            k: jnp.asarray(f[k])
            for k in DeviceTriangulation._fields
            if k != "grid_res"
        }
        tri = DeviceTriangulation(grid_res=int(f["grid_res"]), **fields)
        resp = jnp.asarray(f["response"]) if "response" in f else None
    return tri, resp
