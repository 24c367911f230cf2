"""Device (batched-parallel) 2D Delaunay build vs host oracle and scipy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial import Delaunay as ScipyDelaunay

from gsl_scattered_interpolation_tpu.ops import geometry

from gsl_scattered_interpolation_tpu.models import (
    device_delaunay as dd,
    device_tri as dt,
    host_tree as ht,
)
from gsl_scattered_interpolation_tpu.utils import datasets, integrity


def _rand(n, seed):
    rng = np.random.default_rng(seed)
    return rng.uniform(-0.5, 0.5, size=(n, 2))


def _alive_simplex_set(tri):
    tv = np.asarray(tri.tri_verts)
    return {tuple(sorted(r.tolist())) for r in tv}


class TestBuild:
    @pytest.mark.parametrize("n", [1, 2, 5, 30, 200, 1000])
    def test_integrity(self, n):
        sites = _rand(n, n)
        tri, shuffle = dd.triangulate(sites, flags=ht.NOSTANDARDIZE)
        assert tri.n_tris == 2 * n + 1  # Euler: cage triangle split n times
        integrity.check_arrays(
            np.asarray(tri.points_std),
            tri.tri_verts,
            tri.tri_nbrs,
            n_data=n,
        )

    def test_matches_host_cavity_engine(self):
        # Delaunay uniqueness: same simplex set as the sequential host
        # build on generic-position data, regardless of insertion schedule.
        sites = _rand(300, 42)
        tri, shuffle = dd.triangulate(sites, flags=ht.NOSTANDARDIZE)
        tree = ht.build(sites, flags=ht.NOSTANDARDIZE)
        host_tri = dt.freeze(tree)
        # Map device ids (cage 0..2, data 3+i in shuffle order) to user rows.
        inv = {3 + i: int(shuffle[i]) + 3 for i in range(len(shuffle))}

        def canon(tv):
            return {
                tuple(
                    sorted(inv.get(int(v), int(v)) for v in row)
                )
                for row in np.asarray(tv)
            }

        dev = canon(tri.tri_verts)
        host = {
            tuple(sorted(int(v) for v in row))
            for row in np.asarray(host_tri.tri_verts)
        }
        assert dev == host

    def test_matches_scipy_interior(self):
        sites = _rand(500, 7)
        tri, shuffle = dd.triangulate(sites, flags=ht.NOSTANDARDIZE)
        sd = ScipyDelaunay(sites)
        scipy_set = {tuple(sorted(s)) for s in sd.simplices.tolist()}
        ours = set()
        for row in np.asarray(tri.tri_verts):
            if (row > 2).all():
                ours.add(tuple(sorted(int(shuffle[v - 3]) for v in row)))
        assert ours <= scipy_set
        assert len(ours) >= 0.8 * len(scipy_set)

    def test_gridded_degenerate(self):
        # 5x5 lattice: cocircular quads everywhere
        # (scattered_interp_example.c:103-128 stress case).
        side = 5
        pts = np.stack(
            np.meshgrid(np.arange(side), np.arange(side), indexing="ij"),
            axis=-1,
        ).reshape(-1, 2).astype(float)
        tri, _ = dd.triangulate(pts)  # standardized
        integrity.check_arrays(
            np.asarray(tri.points_std),
            tri.tri_verts,
            tri.tri_nbrs,
            n_data=len(pts),
        )

    def test_chunked_equals_single(self):
        # The host-orchestrated chunked build (the only path that runs at
        # north-star scale) must produce the identical triangulation to the
        # single-program build; force it via chunk_threshold.
        sites = _rand(700, 11)
        tri_a, sh_a = dd.triangulate(sites, flags=ht.NOSTANDARDIZE)
        tri_b, sh_b = dd.triangulate(
            sites, flags=ht.NOSTANDARDIZE, chunk_threshold=100
        )
        np.testing.assert_array_equal(sh_a, sh_b)
        assert _alive_simplex_set(tri_a) == _alive_simplex_set(tri_b)
        integrity.check_arrays(
            np.asarray(tri_b.points_std),
            tri_b.tri_verts,
            tri_b.tri_nbrs,
            n_data=len(sites),
        )

    def test_qhull_seeded_equals_single(self):
        # The Qhull-import bootstrap (the at-scale default, README:18)
        # must produce the identical triangulation to the self-seeded
        # build: the seed is Delaunay by construction and the remaining
        # sites insert through the same claim/split/flip machinery.
        sites = _rand(3000, 17)
        tri_a, sh_a = dd.triangulate(sites, flags=ht.NOSTANDARDIZE)
        tri_b, sh_b = dd.triangulate(
            sites, flags=ht.NOSTANDARDIZE, chunk_threshold=1000,
            seed_min=1000,
        )
        np.testing.assert_array_equal(sh_a, sh_b)
        assert _alive_simplex_set(tri_a) == _alive_simplex_set(tri_b)
        integrity.check_arrays(
            np.asarray(tri_b.points_std),
            tri_b.tri_verts,
            tri_b.tri_nbrs,
            n_data=len(sites),
        )

    def test_seed_state_f64_starts_dirty(self):
        # ADVICE r4 medium: Qhull tolerance-merges near-degenerate
        # facets, and for f64 builds the 8-ulp jitter sits INSIDE that
        # tolerance — seed triangles must start dirty so the first
        # sweep re-verifies them under the compensated predicates.  f32
        # seeds (jitter >> Qhull tolerance) stay clean.
        rng = np.random.default_rng(5)
        n = 1024
        sites = rng.uniform(-0.5, 0.5, size=(n, 2))
        import jax.numpy as jnp

        from gsl_scattered_interpolation_tpu.ops import geometry as geo

        cage_raw = geo.cage_vertices(
            2, np.zeros(2), np.ones(2), np.float64
        )
        pad = np.zeros((dd.bucket_size(n), 2))
        pad[:n] = sites
        for dtype, want_dirty in ((jnp.float64, True),
                                  (jnp.float32, False)):
            out = dd._seed_state_2d(pad, cage_raw, n, dtype, seed_frac=2)
            assert out is not None
            pts, st, dirty = out
            T0 = int(
                np.asarray((st.tri_v[:, 0] >= 0)).sum()
            )
            d0 = np.asarray(dirty)
            if want_dirty:
                assert d0[:T0].all() and not d0[T0:].any()
            else:
                assert not d0.any()

    def test_qhull_seeded_gridded_degenerate(self):
        # Lattice input through the seeded path: duplicate-free but
        # exactly-degenerate pre-jitter; the seed locate's exact walk and
        # the flip machinery must still produce a valid triangulation.
        side = 40  # 1600 sites
        pts = np.stack(
            np.meshgrid(np.arange(side), np.arange(side), indexing="ij"),
            axis=-1,
        ).reshape(-1, 2).astype(float)
        tri, _ = dd.triangulate(
            pts, chunk_threshold=500, seed_min=500
        )
        integrity.check_arrays(
            np.asarray(tri.points_std),
            tri.tri_verts,
            tri.tri_nbrs,
            n_data=len(pts),
        )

    def test_staged_capacity_equals_single(self):
        # Force many capacity stages (start_cap far below 2N+3, smallest
        # growth factor) and compact-sweep overflow (r_compact << M): the
        # staged orchestrator must still produce the identical
        # triangulation to the one-program build.
        sites = _rand(400, 13)
        cage_std = jnp.asarray(
            geometry.cage_vertices(2, np.zeros(2), np.ones(2), np.float64)
        )
        std = jnp.asarray(sites)
        tv_a, tn_a, alive_a, _ = jax.jit(dd.build_2d)(
            std, cage_std, n_real=jnp.int32(400)
        )
        tv_b, tn_b, alive_b, _ = dd.build_2d_chunked(
            std,
            cage_std,
            n_real=400,
            start_cap=64,
            ladder_factor=2,
            r_compact=96,
        )
        set_a = {
            tuple(sorted(r.tolist()))
            for r in np.asarray(tv_a)[np.asarray(alive_a)]
        }
        set_b = {
            tuple(sorted(r.tolist()))
            for r in np.asarray(tv_b)[np.asarray(alive_b)]
        }
        assert set_a == set_b

    def test_weather_end_to_end(self):
        sites, temps = datasets.weather()
        tri, shuffle = dd.triangulate(sites, key=0)
        integrity.check_arrays(
            np.asarray(tri.points_std),
            tri.tri_verts,
            tri.tri_nbrs,
            n_data=50,
        )
        resp = jnp.concatenate(
            [jnp.zeros(3), jnp.asarray(temps)[shuffle]]
        )
        # Interpolation at the sites reproduces the responses.
        vals = np.asarray(dt.interp(tri, resp, jnp.asarray(sites)))
        np.testing.assert_allclose(vals, temps, atol=1e-7)
        # And agrees with the host engine away from cocircular ties.
        tree = ht.build(sites, key=0)
        rng = np.random.default_rng(3)
        Q = rng.uniform([-89.0, 41.2], [-87.0, 42.8], size=(200, 2))
        dev_vals = np.asarray(dt.interp(tri, resp, jnp.asarray(Q)))
        host_vals = np.array([tree.interp(temps, q) for q in Q])
        close = np.abs(dev_vals - host_vals) < 1e-8
        # The weather set contains a ~5e-16-cocircular quad (see
        # test_device_tri); triangulations may differ there.
        assert close.mean() > 0.97
