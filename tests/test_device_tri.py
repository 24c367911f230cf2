"""Device query path vs the host oracle and scipy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.interpolate import griddata

from gsl_scattered_interpolation_tpu.models import device_tri as dt
from gsl_scattered_interpolation_tpu.models import host_tree as ht
from gsl_scattered_interpolation_tpu.utils import datasets


@pytest.fixture(scope="module")
def weather_pair():
    sites, temps = datasets.weather()
    tree = ht.build(sites, key=0)
    tri = dt.freeze(tree)
    resp = dt.reindex_response(tree, temps)
    return sites, temps, tree, tri, resp


class TestFreeze:
    def test_layout(self, weather_pair):
        sites, temps, tree, tri, resp = weather_pair
        assert tri.points_std.shape == (3 + 50, 2)
        assert tri.tri_verts.shape == tri.tri_nbrs.shape
        assert tri.tri_verts.shape[0] == len(tree.leaves())
        # Cage rows of the response are zero (fade-to-zero boundary).
        assert np.all(np.asarray(resp[:3]) == 0)
        # Neighbor symmetry: if t lists u, u lists t.
        tn = np.asarray(tri.tri_nbrs)
        T = tn.shape[0]
        for t in range(T):
            for u in tn[t]:
                if u >= 0:
                    assert t in tn[u]

    def test_grid_full(self, weather_pair):
        *_, tri, _ = weather_pair
        g = np.asarray(tri.grid_tri)
        assert g.shape == (64, 64)
        assert (g >= 0).all() and (g < tri.n_tris).all()

    def test_device_freeze_matches_host_freeze(self):
        # The at-scale device-side freeze (compaction + remap + grid on
        # device) must agree with the host assembly.
        from gsl_scattered_interpolation_tpu.models import (
            device_delaunay as dd,
        )
        from gsl_scattered_interpolation_tpu.ops import geometry

        rng = np.random.default_rng(21)
        sites = jnp.asarray(rng.uniform(-0.5, 0.5, (400, 2)))
        cage = jnp.asarray(
            geometry.cage_vertices(2, np.zeros(2), np.ones(2), np.float64)
        )
        tv, tn, alive, _ = jax.jit(dd.build_2d)(
            sites, cage, n_real=jnp.int32(400)
        )
        raw = np.concatenate(
            [
                np.asarray(
                    geometry.cage_vertices(
                        2, np.zeros(2), np.ones(2), np.float64
                    )
                ),
                np.asarray(sites),
            ]
        )
        host = dt.from_arrays(
            raw, np.zeros(2), np.ones(2), tv, tn, alive, grid_res=32
        )
        dev = dt.from_arrays(
            raw, np.zeros(2), np.ones(2), tv, tn, alive, grid_res=32,
            device_freeze_min=1,
        )
        np.testing.assert_array_equal(
            np.asarray(host.tri_verts), np.asarray(dev.tri_verts)
        )
        np.testing.assert_array_equal(
            np.asarray(host.tri_nbrs), np.asarray(dev.tri_nbrs)
        )
        # same math, but jit fusion reorders ops vs the eager host path
        np.testing.assert_allclose(
            np.asarray(host.affine), np.asarray(dev.affine),
            rtol=1e-9, atol=1e-9,
        )
        g = np.asarray(dev.grid_tri)
        assert (g >= 0).all() and (g < dev.n_tris).all()
        # Functional equivalence of the query path (grids may pick
        # different — equally valid — walk starts).
        rng2 = np.random.default_rng(3)
        Q = jnp.asarray(rng2.uniform(-0.45, 0.45, (500, 2)))
        resp = jnp.asarray(
            np.concatenate([np.zeros(3), rng.normal(size=400)])
        )
        va = np.asarray(dt.interp(host, resp, Q))
        vb = np.asarray(dt.interp(dev, resp, Q))
        np.testing.assert_allclose(va, vb, atol=1e-12)


class TestLocate:
    def test_matches_host_find_leaf(self, weather_pair):
        sites, temps, tree, tri, resp = weather_pair
        rng = np.random.default_rng(0)
        Q = rng.uniform([-89.6, 41.0], [-86.4, 43.1], size=(200, 2))
        leaf, w, ok = dt.locate(tri, jnp.asarray(Q))
        leaf = np.asarray(leaf)
        assert np.asarray(ok).all()
        # The located simplex must actually contain the query (weights >= -tiny).
        assert np.asarray(w).min() > -1e-9
        # And the vertex set must match the host DAG's answer.
        leaves = tree.leaves()
        for i, q in enumerate(Q):
            host_leaf = tree.find_leaf(q)
            host_verts = {
                (-p - 1) if p < 0 else 2 + 1 + p
                for p in tree.tri_points[host_leaf]
            }
            dev_verts = set(np.asarray(tri.tri_verts[leaf[i]]).tolist())
            assert host_verts == dev_verts, (i, q)

    def test_walk_from_worst_start(self, weather_pair):
        # Walk must succeed from an arbitrary (non-hinted) start.
        *_, tree, tri, resp = weather_pair
        q = jnp.asarray([[-88.0, 42.0]])
        for start in range(0, int(tri.n_tris), 7):
            leaf, w, ok = dt.locate(
                tri, q, start=jnp.asarray([start], jnp.int32)
            )
            assert float(jnp.min(w)) > -1e-9


class TestInterp:
    def test_matches_host_oracle(self, weather_pair):
        sites, temps, tree, tri, resp = weather_pair
        rng = np.random.default_rng(1)
        Q = rng.uniform([-89.6, 41.0], [-86.4, 43.1], size=(500, 2))
        ours = np.asarray(dt.interp(tri, resp, jnp.asarray(Q)))
        expect = np.array([tree.interp(temps, q) for q in Q])
        leaf, w, ok = dt.locate(tri, jnp.asarray(Q))
        all_data = np.asarray(tri.tri_verts[leaf] > 2).all(axis=1)
        # 1e-10 parity holds on data-region simplexes; simplexes touching
        # the cage are huge slivers where LAPACK-LU (host) vs Cramer
        # (device) legitimately differ at ~1e-12 relative on the weights.
        np.testing.assert_allclose(
            ours[all_data], expect[all_data], rtol=0, atol=1e-10
        )
        np.testing.assert_allclose(ours, expect, rtol=0, atol=1e-8)

    def test_matches_scipy_inside_hull(self, weather_pair):
        sites, temps, tree, tri, resp = weather_pair
        rng = np.random.default_rng(2)
        Q = rng.uniform([-88.9, 41.3], [-87.1, 42.9], size=(300, 2))
        # The default build standardizes per-axis (linear_simplex.c:187-198),
        # so its Delaunay is of the SCALED sites; the oracle must see the
        # same geometry.
        ref = griddata(
            (sites - tree.shift) * tree.scale,
            temps,
            (Q - tree.shift) * tree.scale,
            method="linear",
        )
        ours = np.asarray(dt.interp(tri, resp, jnp.asarray(Q)))
        leaf, w, ok = dt.locate(tri, jnp.asarray(Q))
        leaf = np.asarray(leaf)
        all_data = np.asarray(tri.tri_verts[leaf] > 2).all(axis=1)
        # Exclude near-cocircular ties: the weather data contains a quad
        # cocircular to ~5e-16 relative, where our tie-break (matching the
        # reference, linear_simplex.c:535-536) and Qhull's exact predicates
        # legitimately pick different diagonals.
        pts_std = np.stack([tree.point_std(i) for i in range(tree.n_points)])
        robust = np.ones(len(Q), bool)
        for i in np.unique(leaf):
            node = tree.leaves()[i]
            c, r2 = tree._circumsphere_pts(tree.tri_points[node])
            if c is None:
                robust[leaf == i] = False
                continue
            slack = (np.sum((pts_std - c) ** 2, axis=1) - r2) / r2
            own = [p for p in tree.tri_points[node] if p >= 0]
            slack[own] = np.inf  # the simplex's own vertices sit on the sphere
            if slack.min() < 1e-9:
                robust[leaf == i] = False
        mask = all_data & robust & ~np.isnan(ref)
        assert mask.sum() > 100
        np.testing.assert_allclose(ours[mask], ref[mask], atol=1e-8)

    def test_out_of_cage_zero(self, weather_pair):
        *_, tri, resp = weather_pair
        out = dt.interp(tri, resp, jnp.asarray([[1e7, 1e7]]))
        assert float(out[0]) == 0.0

    def test_jit_and_3d(self):
        rng = np.random.default_rng(3)
        sites = rng.uniform(-0.5, 0.5, size=(40, 3))
        vals = rng.normal(size=40)
        tree = ht.build(sites, flags=ht.NOSTANDARDIZE)
        tri = dt.freeze(tree)
        resp = dt.reindex_response(tree, vals)
        f = jax.jit(lambda q: dt.interp(tri, resp, q))
        Q = rng.uniform(-0.4, 0.4, size=(100, 3))
        ours = np.asarray(f(jnp.asarray(Q)))
        expect = np.array([tree.interp(vals, q) for q in Q])
        np.testing.assert_allclose(ours, expect, atol=1e-9)

    def test_reproduces_sites(self, weather_pair):
        sites, temps, tree, tri, resp = weather_pair
        ours = np.asarray(dt.interp(tri, resp, jnp.asarray(sites)))
        np.testing.assert_allclose(ours, temps, atol=1e-7)


class TestPallasLocate:
    def test_interpret_matches_dense(self, weather_pair):
        from gsl_scattered_interpolation_tpu.ops import pallas_locate as plx

        *_, tree, tri, resp = weather_pair
        tri32 = tri.cast(jnp.float32)
        rng = np.random.default_rng(5)
        Q = jnp.asarray(
            rng.uniform([-89.5, 41.0], [-86.5, 43.1], size=(1500, 2)),
            jnp.float32,
        )
        ref, w, ok = dt.locate_dense(tri32, Q)
        got = plx.locate_dense_pallas(tri32, Q, interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


class TestCellIndex:
    """Cell-candidate locate: exactness vs the walk and dense paths."""

    def _tri(self, n=800, seed=0):
        rng = np.random.default_rng(seed)
        sites = rng.uniform(-0.5, 0.5, size=(n, 2))
        tree = ht.build(sites, flags=ht.NOSTANDARDIZE)
        return dt.freeze(tree, grid_res=64), sites, tree

    def test_matches_dense_locate(self):
        tri, sites, tree = self._tri()
        cells = dt.build_cell_index(tri)
        rng = np.random.default_rng(1)
        q = jnp.asarray(rng.uniform(-0.49, 0.49, size=(3000, 2)))
        leaf_c, w_c, in_c = dt.locate_cells(tri, cells, q)
        leaf_d, w_d, in_d = dt.locate_dense(tri, q)
        # Leaves may differ only where the query sits on an edge; the
        # weights/value must agree everywhere.
        np.testing.assert_allclose(
            np.asarray(w_c.min(-1)), np.asarray(w_d.min(-1)), atol=1e-9
        )
        resp = jnp.asarray(
            np.concatenate([np.zeros(3), rng.standard_normal(len(sites))])
        )
        v_c = np.asarray(
            dt.interp(tri, resp, q, method="cells", cells=cells)
        )
        v_d = np.asarray(dt.interp(tri, resp, q, method="dense"))
        np.testing.assert_allclose(v_c, v_d, atol=1e-9)

    def test_out_of_square_and_cage(self):
        tri, sites, tree = self._tri(n=200, seed=2)
        cells = dt.build_cell_index(tri)
        # Far outside the data square but inside the cage: interp -> 0
        # region, must not crash and must agree with the walk path.
        q = jnp.asarray([[5.0, 5.0], [-3.0, 0.2], [0.0, 0.0]])
        resp = jnp.asarray(np.concatenate([np.zeros(3), np.ones(200)]))
        v_c = np.asarray(dt.interp(tri, resp, q, method="cells", cells=cells))
        v_w = np.asarray(dt.interp(tri, resp, q, method="walk"))
        np.testing.assert_allclose(v_c, v_w, atol=1e-9)

    def test_small_fallback_cap_still_exact(self):
        # Force the "many bad" branch: tiny fallback buffer.
        tri, sites, tree = self._tri(n=300, seed=3)
        cells = dt.build_cell_index(tri, K=2)  # heavy overflow
        rng = np.random.default_rng(4)
        q = jnp.asarray(rng.uniform(-0.49, 0.49, size=(512, 2)))
        leaf_c, w_c, in_c = dt.locate_cells(
            tri, cells, q, fallback_frac=512
        )
        leaf_d, w_d, in_d = dt.locate_dense(tri, q)
        np.testing.assert_allclose(
            np.asarray(w_c.min(-1)), np.asarray(w_d.min(-1)), atol=1e-9
        )

    def test_jit_and_grid_eval(self):
        tri, sites, tree = self._tri(n=500, seed=5)
        cells = dt.build_cell_index(tri)
        resp = jnp.asarray(
            np.concatenate([np.zeros(3), np.ones(500)])
        )
        f = jax.jit(
            lambda qq: dt.interp(tri, resp, qq, method="cells", cells=cells)
        )
        g = np.linspace(-0.45, 0.45, 40)
        Q = jnp.asarray(
            np.stack(np.meshgrid(g, g), -1).reshape(-1, 2)
        )
        out = np.asarray(f(Q))
        # interior of the data hull: constant-1 response reproduced
        interior = np.asarray(jnp.all(jnp.abs(Q) < 0.35, axis=1))
        np.testing.assert_allclose(out[interior], 1.0, atol=1e-9)


class TestCellIndexDevice:
    """Device-built cell index (VERDICT r4 item 3): exactness vs the
    dense locate, and list equivalence vs the host rasterizer where
    nothing is span-capped."""

    def _tri(self, n=800, seed=0, d=2):
        rng = np.random.default_rng(seed)
        sites = rng.uniform(-0.5, 0.5, size=(n, d))
        tree = ht.build(sites, flags=ht.NOSTANDARDIZE)
        return dt.freeze(tree, grid_res=64 if d == 2 else 16), sites, tree

    @pytest.mark.parametrize("rank", ["sort", "minround"])
    def test_2d_matches_dense(self, rank):
        tri, sites, tree = self._tri()
        cells = dt._build_cell_index_device(tri, rank=rank)
        # Native builds carry cage slivers beyond the span cap: the
        # device index must declare itself incomplete and stay exact
        # through the walk-everything-not-contained rule.
        assert not cells.complete
        rng = np.random.default_rng(1)
        q = jnp.asarray(rng.uniform(-0.49, 0.49, size=(3000, 2)))
        leaf_c, w_c, in_c = dt.locate_cells(tri, cells, q)
        leaf_d, w_d, in_d = dt.locate_dense(tri, q)
        np.testing.assert_allclose(
            np.asarray(w_c.min(-1)), np.asarray(w_d.min(-1)), atol=1e-9
        )
        # out-of-square + cage region queries stay correct (walk route)
        q2 = jnp.asarray([[5.0, 5.0], [-3.0, 0.2], [0.0, 0.0]])
        resp = jnp.asarray(
            np.concatenate([np.zeros(3), np.ones(len(sites))])
        )
        v_c = np.asarray(
            dt.interp(tri, resp, q2, method="cells", cells=cells)
        )
        v_w = np.asarray(dt.interp(tri, resp, q2, method="walk"))
        np.testing.assert_allclose(v_c, v_w, atol=1e-9)

    def test_2d_lists_match_host_for_import(self):
        # Qhull import (no cage slivers): every bbox fits the span cap,
        # so the device build is COMPLETE and its non-overflow cell
        # lists must match the host rasterizer's exactly (same
        # first-K-by-id semantics, same conservative support test).
        from scipy.spatial import Delaunay as ScipyDelaunay

        from gsl_scattered_interpolation_tpu.models import (
            geometry_extras as gx,
        )

        rng = np.random.default_rng(3)
        sites = rng.uniform(-0.5, 0.5, size=(1200, 2))
        tri = gx.from_scipy_delaunay(ScipyDelaunay(sites), sites)
        hostc = dt.build_cell_index(tri, method="host")
        devc = dt._build_cell_index_device(tri, grid_res=hostc.res,
                                           K=hostc.k)
        assert devc.complete
        th = np.asarray(hostc.table).reshape(hostc.res**2, 7, hostc.k)
        td = np.asarray(devc.table).reshape(devc.res**2, 7, devc.k)
        ok_rows = ~np.asarray(hostc.overflow)
        ids_h = th[ok_rows, 6, :]
        ids_d = td[ok_rows, 6, :]
        # The device support margin (exact box support on the edge
        # normal) is TIGHTER than the host's half-diagonal margin, so
        # each device list must be a SUBSET of the host list — never
        # list a triangle the (conservative-complete) host missed.
        subset = (
            (ids_d[:, :, None] == ids_h[:, None, :]).any(-1)
            | (ids_d < 0)
        ).all(-1)
        assert subset.all(), (~subset).sum()
        # ...and both stay exact (checked below via locate agreement).
        q = jnp.asarray(rng.uniform(-0.45, 0.45, size=(4000, 2)))
        _, wh, _ = dt.locate_cells(tri, hostc, q)
        _, wd_, _ = dt.locate_cells(tri, devc, q)
        np.testing.assert_allclose(
            np.asarray(wh.min(-1)), np.asarray(wd_.min(-1)), atol=1e-9
        )

    @pytest.mark.parametrize("packed", [True, False])
    def test_3d_matches_dense(self, packed, monkeypatch):
        if packed:
            monkeypatch.delenv("GSI_CELLS3D_PACKED_BYTES", raising=False)
        else:
            monkeypatch.setenv("GSI_CELLS3D_PACKED_BYTES", "0")
        tri, sites, tree = self._tri(n=400, seed=5, d=3)
        cells = dt._build_cell_index_device(tri)
        assert (cells.rows is None) == packed
        rng = np.random.default_rng(7)
        q = jnp.asarray(rng.uniform(-0.49, 0.49, size=(3000, 3)))
        _, w_c, _ = dt.locate_cells(tri, cells, q)
        _, w_d, _ = dt.locate_dense(tri, q)
        np.testing.assert_allclose(
            np.asarray(w_c.min(-1)), np.asarray(w_d.min(-1)), atol=1e-9
        )

    def test_auto_dispatch_threshold(self):
        tri, sites, tree = self._tri(n=300, seed=9)
        cells = dt.build_cell_index(tri)  # small -> host path
        assert cells.complete

    def test_budget_spill_stays_exact(self):
        # The r5 3D regression class: a pair budget too small for the
        # bbox total silently drops listed pairs.  The index must flag
        # itself incomplete and locate_cells must stay exact through
        # the walk-everything-not-contained rule (slow, never wrong).
        tri, sites, tree = self._tri(n=600, seed=11)
        cells = dt._build_cell_index_device(tri, pair_budget_override=1)
        assert not cells.complete
        rng = np.random.default_rng(12)
        q = jnp.asarray(rng.uniform(-0.49, 0.49, size=(2000, 2)))
        _, w_c, _ = dt.locate_cells(tri, cells, q)
        _, w_d, _ = dt.locate_dense(tri, q)
        np.testing.assert_allclose(
            np.asarray(w_c.min(-1)), np.asarray(w_d.min(-1)), atol=1e-9
        )


class TestCellIndex3d:
    """3D cell-candidate locate + G^3 walk-start grid."""

    def _tri3(self, n=500, seed=5):
        rng = np.random.default_rng(seed)
        sites = rng.uniform(-0.5, 0.5, size=(n, 3))
        tree = ht.build(sites, flags=ht.NOSTANDARDIZE)
        return dt.freeze(tree), sites, tree

    def test_grid3d_built_and_full(self):
        tri, sites, tree = self._tri3()
        assert tri.grid_tri.ndim == 3
        assert tri.grid_res > 1
        assert int(jnp.min(tri.grid_tri)) >= 0

    def test_walk_start_speeds_walk_and_stays_exact(self):
        tri, sites, tree = self._tri3()
        rng = np.random.default_rng(6)
        q = jnp.asarray(rng.uniform(-0.45, 0.45, size=(2000, 3)))
        leaf_w, w_w, in_w = dt.locate(tri, q)
        leaf_d, w_d, in_d = dt.locate_dense(tri, q)
        np.testing.assert_allclose(
            np.asarray(w_w.min(-1)), np.asarray(w_d.min(-1)), atol=1e-9
        )

    def test_cells3d_matches_dense(self):
        tri, sites, tree = self._tri3()
        cells = dt.build_cell_index(tri)
        rng = np.random.default_rng(7)
        q = jnp.asarray(rng.uniform(-0.49, 0.49, size=(4000, 3)))
        resp = jnp.asarray(
            np.concatenate([np.zeros(4), rng.standard_normal(len(sites))])
        )
        v_c = np.asarray(
            dt.interp(tri, resp, q, method="cells", cells=cells)
        )
        v_d = np.asarray(dt.interp(tri, resp, q, method="dense"))
        np.testing.assert_allclose(v_c, v_d, atol=1e-9)

    def test_cells3d_interp_matches_host_oracle(self):
        tri, sites, tree = self._tri3(n=300)
        vals = np.sin(2 * sites[:, 0]) + sites[:, 1] * sites[:, 2]
        resp = dt.reindex_response(tree, vals)
        cells = dt.build_cell_index(tri)
        rng = np.random.default_rng(8)
        Q = rng.uniform(-0.4, 0.4, size=(200, 3))
        ours = np.asarray(
            dt.interp(tri, resp, jnp.asarray(Q), method="cells",
                      cells=cells)
        )
        expect = np.array([tree.interp(vals, q) for q in Q])
        np.testing.assert_allclose(ours, expect, atol=1e-6)

    def test_cells3d_two_stage_layout_matches_packed(self, monkeypatch):
        """The over-HBM-budget two-stage layout must locate identically."""
        tri, sites, tree = self._tri3()
        monkeypatch.setenv("GSI_CELLS3D_PACKED_BYTES", "0")
        cells2 = dt.build_cell_index(tri)
        assert cells2.rows is not None  # two-stage selected
        monkeypatch.delenv("GSI_CELLS3D_PACKED_BYTES")
        cells1 = dt.build_cell_index(tri)
        assert cells1.rows is None  # packed selected
        rng = np.random.default_rng(9)
        q = jnp.asarray(rng.uniform(-0.49, 0.49, size=(4000, 3)))
        _, wd, _ = dt.locate_dense(tri, q)
        for cells in (cells1, cells2):
            _, w, _ = dt.locate_cells(tri, cells, q)
            np.testing.assert_allclose(
                np.asarray(w.min(-1)), np.asarray(wd.min(-1)), atol=1e-9
            )

    def test_cells3d_chunked_1m_queries(self, monkeypatch):
        """>= 1M queries drives the lax.map block chunking of BOTH 3D
        layouts — the BENCH_r03 queries_3d failure was a scale-dependent
        gather layout (f32[B*K, 12] lane-padded to 24.6 GB at B=2M), so
        the at-scale shape path must be exercised even on CPU."""
        tri, sites, tree = self._tri3(n=200, seed=11)
        vals = np.sin(2 * sites[:, 0]) + sites[:, 1]
        resp = dt.reindex_response(tree, vals)
        rng = np.random.default_rng(12)
        B = 1_100_000
        Q = jnp.asarray(rng.uniform(-0.45, 0.45, size=(B, 3)))
        sub = 50_000
        ref = np.asarray(dt.interp(tri, resp, Q[:sub], method="dense"))
        for env in (None, "0"):
            if env is None:
                monkeypatch.delenv(
                    "GSI_CELLS3D_PACKED_BYTES", raising=False
                )
            else:
                monkeypatch.setenv("GSI_CELLS3D_PACKED_BYTES", env)
            cells = dt.build_cell_index(tri)
            out = np.asarray(
                dt.interp(tri, resp, Q, method="cells", cells=cells)
            )
            assert out.shape == (B,)
            assert np.isfinite(out).all()
            np.testing.assert_allclose(out[:sub], ref, atol=1e-9)
