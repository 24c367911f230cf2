"""Surface reconstruction: alpha shapes from Delaunay (README:30).

The second of the reference's unstarted "possible additions"
(/root/reference/README:27-30).  Built on the machinery the engine
already has: the alpha shape of a point set is a subcomplex of its
Delaunay triangulation — keep every simplex whose circumradius is below
``alpha``, and the reconstructed surface is the boundary of the kept
union (faces incident to exactly one kept simplex).  Circumradii come
from the batched Eickemeyer solver (ops.geometry.circumsphere), so the
filter is one device pass; the boundary extraction is a host-side
sorted-face count.

* 2D: returns boundary EDGES — the concave-hull ("shape") of the sample.
* 3D: returns boundary TRIANGLES — a watertight surface mesh when alpha
  matches the sampling density (the classic alpha-shape reconstruction).

Triangulation sources: the native engines, or any imported triangulation
(geometry_extras.from_scipy_delaunay — the reference's planned QHull
interop, README:18).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from . import device_tri
from ..ops import geometry
from ..utils import errors


class AlphaShape(NamedTuple):
    faces: np.ndarray        # [F, d] user point ids per boundary face
    kept: np.ndarray         # [K] kept simplex rows (into tri.tri_verts)
    circumradius: np.ndarray  # [T] raw-coordinate circumradius per simplex


def _data_simplices(tri: device_tri.DeviceTriangulation):
    d = tri.dim
    tv = np.asarray(tri.tri_verts)
    return tv, np.all(tv > d, axis=1)


def alpha_shape(tri: device_tri.DeviceTriangulation, alpha: float) -> AlphaShape:
    """Alpha-shape boundary of the data sites of a triangulation.

    Args:
      tri: a DeviceTriangulation (native build or imported); only
        all-data simplexes participate (cage simplexes are never kept).
      alpha: circumradius threshold in RAW coordinate units.

    Returns faces as USER point ids (0-based data rows).
    """
    d = tri.dim
    tv, is_data = _data_simplices(tri)
    verts_raw = geometry.take_rows(
        jnp.asarray(tri.points_raw, jnp.float64), jnp.asarray(tv)
    )
    _, r2, ok = geometry.circumsphere(verts_raw)
    r = np.sqrt(np.maximum(np.asarray(r2), 0.0))
    keep = is_data & np.asarray(ok) & (r <= alpha)
    kept_rows = np.nonzero(keep)[0]
    if kept_rows.size == 0:
        raise errors.DomainError(
            f"alpha={alpha} keeps no simplex (min data circumradius "
            f"{r[is_data].min() if is_data.any() else np.inf:.3g})"
        )
    # Boundary faces: appear in exactly one kept simplex.
    faces = []
    for k in range(d + 1):
        f = np.delete(tv[kept_rows], k, axis=1)
        faces.append(np.sort(f, axis=1))
    allf = np.concatenate(faces, axis=0)
    uniq, counts = np.unique(allf, axis=0, return_counts=True)
    boundary = uniq[counts == 1] - (d + 1)  # to user ids
    return AlphaShape(faces=boundary, kept=kept_rows, circumradius=r)


def reconstruct_surface(points, alpha: float | None = None):
    """3D surface mesh from a point sample (alpha-shape reconstruction).

    Triangulates via Qhull import (the host cavity engine also handles
    d=3 but serially; reconstruction inputs are usually large), picks
    ``alpha`` automatically as 2.5x the median nearest-neighbor spacing
    when not given, and returns (faces [F, 3] point ids, alpha).
    """
    from scipy.spatial import Delaunay, cKDTree

    from . import geometry_extras

    points = np.asarray(points, np.float64)
    if points.shape[1] != 3:
        raise errors.InvalidArgumentError("reconstruct_surface expects 3D")
    if alpha is None:
        nn, _ = cKDTree(points).query(points, k=2)
        alpha = 2.5 * float(np.median(nn[:, 1]))
    tri = geometry_extras.from_scipy_delaunay(Delaunay(points), points)
    shape = alpha_shape(tri, alpha)
    return shape.faces, alpha


def edge_manifold_check(faces: np.ndarray) -> bool:
    """True if every edge of a 3D face set is shared by exactly 2 faces
    (watertight, 2-manifold surface)."""
    e = np.concatenate(
        [faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [0, 2]]], axis=0
    )
    e = np.sort(e, axis=1)
    _, counts = np.unique(e, axis=0, return_counts=True)
    return bool((counts == 2).all())
