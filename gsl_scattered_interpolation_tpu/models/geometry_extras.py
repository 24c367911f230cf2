"""Convex hull, Voronoi diagram, and external-triangulation import.

All three are features the reference PLANS but never built (README:18-27:
"import triangulations computed from other libraries (QHull, CGAL)",
"convex hulls and Voronoi diagram computation").  On the SoA device
arrays they are nearly free:

* the convex hull of the sites = the boundary between all-data simplexes
  and cage-touching simplexes;
* Voronoi vertices = the circumcenters the engine already computes, with
  the Delaunay adjacency as the Voronoi edge graph (duality);
* an externally built triangulation (e.g. scipy.spatial.Delaunay/Qhull)
  maps directly onto DeviceTriangulation by adding the cage as an
  unconnected boundary convention.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from . import device_tri
from ..ops import geometry


def _data_tri_mask(tri, d):
    return np.asarray(tri.tri_verts > d).all(axis=1)


def convex_hull_edges(tri: device_tri.DeviceTriangulation) -> np.ndarray:
    """Hull edges as [E, 2] arrays of USER point ids (0-based data rows).

    An edge of an all-data simplex lies on the convex hull iff its
    neighbor across that edge touches the cage.
    """
    d = tri.dim
    tv = np.asarray(tri.tri_verts)
    tn = np.asarray(tri.tri_nbrs)
    is_data = (tv > d).all(axis=1)
    edges = []
    for k in range(d + 1):
        nbr = tn[:, k]
        nbr_safe = np.where(nbr >= 0, nbr, 0)
        nbr_cage = ~is_data[nbr_safe] | (nbr < 0)
        on_hull = is_data & nbr_cage
        face = np.delete(tv, k, axis=1)[on_hull] - (d + 1)
        edges.append(face)
    return np.concatenate(edges, axis=0)


def convex_hull_points(tri: device_tri.DeviceTriangulation) -> np.ndarray:
    """Sorted unique USER point ids on the convex hull."""
    return np.unique(convex_hull_edges(tri).ravel())


def voronoi(tri: device_tri.DeviceTriangulation):
    """Voronoi diagram of the data sites by Delaunay duality.

    Returns (vertices [T, d] standardized circumcenters of all-data
    simplexes, ridges [R, 2] index pairs into `vertices` for each pair of
    adjacent all-data simplexes).  Cells touching the hull are unbounded;
    their rays are omitted (use the hull edges to close them if needed).
    """
    d = tri.dim
    tv = np.asarray(tri.tri_verts)
    tn = np.asarray(tri.tri_nbrs)
    is_data = (tv > d).all(axis=1)
    idx = np.nonzero(is_data)[0]
    remap = np.full(tv.shape[0], -1, np.int64)
    remap[idx] = np.arange(idx.size)
    verts_std = np.asarray(tri.points_std)[tv[idx]]
    centers, _, ok = geometry.circumsphere(jnp.asarray(verts_std))
    centers = np.asarray(centers)
    ridges = []
    for k in range(d + 1):
        nbr = tn[idx, k]
        good = (nbr >= 0) & (remap[np.where(nbr >= 0, nbr, 0)] >= 0)
        a = remap[idx[good]]
        b = remap[nbr[good]]
        keep = a < b  # each ridge once
        ridges.append(np.stack([a[keep], b[keep]], -1))
    return centers, np.concatenate(ridges, axis=0)


def from_scipy_delaunay(sd, sites: np.ndarray, grid_res: int = 256):
    """Import a scipy.spatial.Delaunay (Qhull) triangulation.

    The reference planned exactly this interoperability (README:18).  The
    external simplexes become the all-data part; the cage and its
    fade-to-zero boundary are synthesized so evaluation semantics match a
    native build (hull-boundary faces get no cage simplexes — queries
    beyond the hull report out-of-domain rather than fading, which is the
    conservative choice for imported meshes).

    Args:
      sd: scipy.spatial.Delaunay over ``sites``.
      sites: [n, d] raw coordinates (must be what sd was built from).

    Returns a DeviceTriangulation; map responses with
    ``jnp.concatenate([jnp.zeros(d+1), values])`` (identity order).
    """
    sites = np.asarray(sites, np.float64)
    n, d = sites.shape
    lo, hi = sites.min(0), sites.max(0)
    shift = (lo + hi) / 2.0
    ext = hi - lo
    scale = np.where(ext > 0, 1.0 / np.where(ext > 0, ext, 1), 1.0)
    cage = geometry.cage_vertices(d, shift, scale)
    points_raw = np.concatenate([cage, sites])
    tv = np.asarray(sd.simplices, np.int32) + (d + 1)
    tn = np.asarray(sd.neighbors, np.int32)
    tn = np.where(tn >= 0, tn, -1).astype(np.int32)
    # scipy convention matches ours: neighbors[i, k] is opposite vertex k.
    alive = np.ones(tv.shape[0], bool)
    return device_tri.from_arrays(
        points_raw, shift, scale, tv, tn, alive, grid_res=grid_res
    )
