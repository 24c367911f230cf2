"""Convex hull / Voronoi / external-triangulation import (planned features)."""

import jax.numpy as jnp
import numpy as np
from scipy.spatial import ConvexHull, Delaunay as ScipyDelaunay, Voronoi

from gsl_scattered_interpolation_tpu.models import (
    device_delaunay as dd,
    device_tri as dt,
    geometry_extras as gx,
    host_tree as ht,
)


def _sites(n=120, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(-0.5, 0.5, size=(n, 2))


class TestHull:
    def test_matches_scipy_convex_hull(self):
        sites = _sites()
        tri, shuffle = dd.triangulate(sites, flags=ht.NOSTANDARDIZE)
        hull_ids = gx.convex_hull_points(tri)
        # map internal (shuffled) ids back to user rows
        user = np.sort(shuffle[hull_ids])
        ref = np.sort(ConvexHull(sites).vertices)
        np.testing.assert_array_equal(user, ref)


class TestVoronoi:
    def test_vertices_are_circumcenters(self):
        sites = _sites(60, 1)
        tri, shuffle = dd.triangulate(sites, flags=ht.NOSTANDARDIZE)
        verts, ridges = gx.voronoi(tri)
        assert verts.shape[1] == 2
        assert ridges.min() >= 0 and ridges.max() < len(verts)
        # Voronoi vertex count equals scipy's (same Delaunay on generic pts).
        sv = Voronoi(sites)
        assert len(verts) == len(sv.vertices)
        # Every Voronoi vertex appears in scipy's set (standardized == raw
        # here since NOSTANDARDIZE).
        d = np.abs(verts[:, None, :] - sv.vertices[None, :, :]).sum(-1).min(1)
        assert d.max() < 1e-6


class TestImport:
    def test_scipy_import_evaluates(self):
        sites = _sites(80, 2)
        vals = np.sin(4 * sites[:, 0]) + sites[:, 1]
        sd = ScipyDelaunay(sites)
        tri = gx.from_scipy_delaunay(sd, sites)
        resp = jnp.concatenate([jnp.zeros(3), jnp.asarray(vals)])
        rng = np.random.default_rng(3)
        Q = rng.uniform(-0.4, 0.4, size=(300, 2))
        ours = np.asarray(dt.interp(tri, resp, jnp.asarray(Q)))
        from scipy.interpolate import LinearNDInterpolator

        ref = LinearNDInterpolator(sd, vals)(Q)
        inside = ~np.isnan(ref)
        assert inside.sum() > 200
        np.testing.assert_allclose(ours[inside], ref[inside], atol=1e-9)

    def test_import_out_of_hull_is_out_of_domain(self):
        sites = _sites(50, 4)
        sd = ScipyDelaunay(sites)
        tri = gx.from_scipy_delaunay(sd, sites)
        resp = jnp.concatenate([jnp.zeros(3), jnp.ones(50)])
        out = dt.interp(tri, resp, jnp.asarray([[5.0, 5.0]]))
        assert float(out[0]) == 0.0
