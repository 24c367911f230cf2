"""Alpha-shape surface reconstruction (README:30)."""

import numpy as np
import pytest
from scipy.spatial import Delaunay

from gsl_scattered_interpolation_tpu.models import (
    geometry_extras as gx,
    host_tree as ht,
    device_tri as dt,
    surface,
)
from gsl_scattered_interpolation_tpu.utils import errors


def _fibonacci_sphere(n, r=1.0):
    i = np.arange(n) + 0.5
    phi = np.arccos(1 - 2 * i / n)
    theta = np.pi * (1 + 5**0.5) * i
    return r * np.stack(
        [np.sin(phi) * np.cos(theta), np.sin(phi) * np.sin(theta),
         np.cos(phi)], -1,
    )


class TestAlphaShape3D:
    def test_ball_boundary_watertight(self):
        # Solid ball sample on a jittered grid: the alpha boundary is the
        # sphere surface.  (A hollow shell sample is the classic alpha-
        # shape failure mode — every circumsphere ~ R — so the solid case
        # is the meaningful reconstruction test.)
        rng = np.random.default_rng(0)
        g = np.linspace(-1, 1, 13)
        pts = np.stack(np.meshgrid(g, g, g, indexing="ij"), -1).reshape(-1, 3)
        pts = pts[np.linalg.norm(pts, axis=1) <= 1.0]
        h = g[1] - g[0]
        pts = pts + rng.uniform(-0.05 * h, 0.05 * h, pts.shape)
        faces, alpha = surface.reconstruct_surface(pts, alpha=1.2 * h)
        # Watertight 2-manifold mesh.
        assert surface.edge_manifold_check(faces)
        # Euler characteristic of a sphere: V - E + F = 2.
        used = np.unique(faces)
        V = used.size
        e = np.concatenate(
            [faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [0, 2]]], 0
        )
        E = np.unique(np.sort(e, 1), axis=0).shape[0]
        F = faces.shape[0]
        assert V - E + F == 2, (V, E, F)
        # Boundary vertices sit near the unit sphere.
        rad = np.linalg.norm(pts[used], axis=1)
        assert rad.min() > 1.0 - 2.5 * h, rad.min()

    def test_alpha_too_small_raises(self):
        pts = _fibonacci_sphere(200)
        with pytest.raises(errors.DomainError):
            surface.reconstruct_surface(pts, alpha=1e-9)


class TestAlphaShape2D:
    def test_ring_concave_hull(self):
        # An annulus: the alpha boundary has TWO loops (outer + hole),
        # which a convex hull cannot represent.
        rng = np.random.default_rng(0)
        t = rng.uniform(0, 2 * np.pi, 1500)
        r = rng.uniform(0.6, 1.0, 1500)
        pts = np.stack([r * np.cos(t), r * np.sin(t)], -1)
        tri = gx.from_scipy_delaunay(Delaunay(pts), pts)
        shape = surface.alpha_shape(tri, alpha=0.15)
        edges = shape.faces
        assert edges.shape[1] == 2
        # every boundary vertex has exactly two incident boundary edges
        ids, counts = np.unique(edges.ravel(), return_counts=True)
        assert (counts == 2).all()
        # boundary vertices cluster near r=0.6 and r=1.0
        rad = np.linalg.norm(pts[ids], axis=1)
        assert (np.abs(rad - 1.0) < 0.1).any()
        assert (np.abs(rad - 0.6) < 0.1).any()

    def test_native_build_source(self):
        # alpha_shape accepts the native device build too.
        from gsl_scattered_interpolation_tpu.models import device_delaunay as dd

        rng = np.random.default_rng(1)
        pts = rng.uniform(-0.5, 0.5, size=(400, 2))
        tri, _ = dd.triangulate(pts, flags=ht.NOSTANDARDIZE)
        shape = surface.alpha_shape(tri, alpha=0.2)
        assert shape.faces.size > 0
        assert (shape.faces >= 0).all() and (shape.faces < 400).all()
