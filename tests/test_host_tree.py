"""Host Delaunay engine tests: the reference's acceptance suite, rebuilt.

Ports the behavioral contracts of ``scattered_interp_example.c``:
trivial_test's exact first-insertion topology (:25-81), uniform random
sweeps in d=3 (:83-101), degenerate lattice sweeps in d=2 (:103-128), and
the 50-station weather flow (:130-249) — plus scipy/Qhull as an external
oracle and the integrity checker as the Delaunay-property oracle.
"""

import numpy as np
import pytest
from scipy.interpolate import griddata
from scipy.spatial import Delaunay as ScipyDelaunay

from gsl_scattered_interpolation_tpu.models import host_tree as ht
from gsl_scattered_interpolation_tpu.utils import datasets, integrity
from gsl_scattered_interpolation_tpu.utils.errors import (
    CapacityError,
    InvalidArgumentError,
)


class TestTrivial:
    """scattered_interp_example.c:25-81, semantics preserved exactly."""

    def test_alloc_free(self):
        ht.SimplexTree(dim=2, capacity=10)

    def test_empty_tree_interp_zero(self):
        tree = ht.SimplexTree(dim=2, capacity=50)
        tree.init(None, flags=ht.NOSTANDARDIZE)
        # Cage circumsphere is computable on the root.
        c, r2 = tree._circumsphere_pts(tree.tri_points[0])
        assert c is not None and r2 > 0
        # find_leaf on the bare cage returns the root; interp is exactly 0
        # (all vertices are seed points, linear_simplex.c:697-706).
        q = np.array([-88.0, 41.0])
        leaf = tree.find_leaf(q)
        assert leaf == 0
        assert tree.interp_at(leaf, None, q) == 0.0

    def test_first_insertion_topology(self):
        # Exact child vertex ids after the first insertion
        # (scattered_interp_example.c:58-77).
        tree = ht.SimplexTree(dim=2, capacity=50)
        tree.init(None, flags=ht.NOSTANDARDIZE)
        data = np.array([[-88.0, 41.0], [-89.0, 41.0]])
        tree.set_data(data)
        leaf = tree.insert_next()
        assert leaf == 0
        assert not tree.is_leaf(0)
        L = tree.tri_links
        P = tree.tri_points
        assert P[L[0, 0], 0] == 0 and P[L[0, 0], 1] == -2 and P[L[0, 0], 2] == -3
        assert P[L[0, 1], 0] == 0 and P[L[0, 1], 1] == -1 and P[L[0, 1], 2] == -3
        assert P[L[0, 2], 0] == 0 and P[L[0, 2], 1] == -1 and P[L[0, 2], 2] == -2
        # Data point 0 is inside the cage circumsphere
        # (scattered_interp_example.c:70).
        assert tree.in_hypersphere(0, 0)
        # Locating the second point lands in the child omitting seed -1
        # (scattered_interp_example.c:73-77).
        leaf2 = tree.find_leaf(data[1])
        np.testing.assert_array_equal(tree.tri_points[leaf2], [0, -2, -3])

    def test_init_requires_bounds_or_data(self):
        tree = ht.SimplexTree(dim=2, capacity=10)
        with pytest.raises(InvalidArgumentError):
            tree.init(None)

    def test_capacity_overflow(self):
        tree = ht.SimplexTree(dim=2, capacity=3)
        with pytest.raises(CapacityError):
            tree.init(np.zeros((5, 2)))


def _rand_sites(n, d, seed):
    rng = np.random.default_rng(seed)
    return rng.uniform(-0.5, 0.5, size=(n, d))


class TestBuildInvariants:
    @pytest.mark.parametrize("method", ["cavity", "flips"])
    @pytest.mark.parametrize("n", [10, 50])
    def test_uniform_2d(self, n, method):
        tree = ht.build(
            _rand_sites(n, 2, n), flags=ht.NOSTANDARDIZE, method=method
        )
        integrity.check_structure(tree)
        integrity.check_delaunay(tree)

    @pytest.mark.parametrize("d", [3, 4])
    def test_uniform_highd_cavity(self, d):
        # uniform_test d=3 (scattered_interp_example.c:83-101).  Cavity
        # insertion maintains Delaunay in every dimension — unlike the
        # reference's d->d-flips-only path (see host_tree module docstring).
        tree = ht.build(_rand_sites(40, d, 7), flags=ht.NOSTANDARDIZE)
        integrity.check_structure(tree)
        integrity.check_delaunay(tree)

    def test_uniform_3d_flips_incomplete(self):
        # Documents the REFERENCE's structural gap: with only d->d flips
        # (edge_flip.c), 3D insertion leaves empty-circumsphere violations.
        tree = ht.build(
            _rand_sites(40, 3, 7), flags=ht.NOSTANDARDIZE, method="flips"
        )
        integrity.check_structure(tree)  # structure is still sound
        with pytest.raises(AssertionError, match="Delaunay violated"):
            integrity.check_delaunay(tree)

    @pytest.mark.parametrize("method", ["cavity", "flips"])
    def test_gridded_2d_degenerate(self, method):
        # gridded_test (scattered_interp_example.c:103-128): 5^2 lattice
        # points — maximally cospherical/degenerate input.
        d = 2
        side = 5
        pts = np.stack(
            np.meshgrid(*[np.arange(side, dtype=float)] * d, indexing="ij"),
            axis=-1,
        ).reshape(-1, d)
        tree = ht.build(pts, flags=ht.NOSTANDARDIZE, method=method)
        integrity.check_structure(tree)
        integrity.check_delaunay(tree)

    def test_cavity_flips_agree_2d(self):
        # Both insertion algorithms produce the same leaf simplex set on
        # generic-position data (Delaunay uniqueness).
        sites = _rand_sites(40, 2, 11)
        t1 = ht.build(sites, flags=ht.NOSTANDARDIZE, method="cavity")
        t2 = ht.build(sites, flags=ht.NOSTANDARDIZE, method="flips")
        s1 = {
            tuple(sorted(t1.tri_points[n].tolist())) for n in t1.leaves()
        }
        s2 = {
            tuple(sorted(t2.tri_points[n].tolist())) for n in t2.leaves()
        }
        assert s1 == s2

    def test_standardized_with_shuffle(self):
        sites, _ = datasets.weather()
        tree = ht.build(sites, key=0)
        integrity.check_structure(tree)
        integrity.check_delaunay(tree)
        # Shuffle is a real permutation.
        assert sorted(tree.shuffle.tolist()) == list(range(50))
        assert not np.array_equal(tree.shuffle, np.arange(50))

    def test_isoscale(self):
        sites, _ = datasets.weather()
        tree = ht.build(sites, flags=ht.ISOSCALE)
        assert np.unique(tree.scale).size == 1
        integrity.check_delaunay(tree)


class TestWeather:
    """The reference's flagship example (scattered_interp_example.c:130-249)."""

    @pytest.fixture(scope="class")
    def tree(self):
        sites, _ = datasets.weather()
        t = ht.SimplexTree(dim=2, capacity=50)
        t.init(None, flags=ht.NOSTANDARDIZE)
        t.set_data(sites)
        for _ in range(50):
            t.insert_next()
        return t

    def test_invariants(self, tree):
        integrity.check_structure(tree)
        integrity.check_delaunay(tree)
        assert tree.n_points == 50

    def test_single_point_interp_matches_scipy(self, tree):
        sites, temps = datasets.weather()
        q = np.array([-88.0, 41.0])
        ours = tree.interp(temps, q)
        ref = griddata(sites, temps, q[None, :], method="linear")[0]
        if not np.isnan(ref):
            assert abs(ours - ref) < 1e-8
        assert np.isfinite(ours)

    def test_grid_eval_matches_scipy_inside_hull(self, tree):
        sites, temps = datasets.weather()
        lo = np.array([-89.6763, 40.9479])
        hi = np.array([-86.303, 43.20])
        n_grid = 40
        xs = lo[0] + (hi[0] - lo[0]) / n_grid * np.arange(n_grid)
        ys = lo[1] + (hi[1] - lo[1]) / n_grid * np.arange(n_grid)
        qx, qy = np.meshgrid(xs, ys, indexing="ij")
        Q = np.stack([qx.ravel(), qy.ravel()], axis=-1)
        ref = griddata(sites, temps, Q, method="linear")
        n_checked = 0
        for q, r in zip(Q, ref):
            leaf = tree.find_leaf(q)
            assert leaf >= 0
            ours = tree.interp_at(leaf, temps, q)
            # Compare only where the containing simplex is all-data: simplices
            # touching the cage implement the fade-to-zero boundary the
            # reference defines (linear_simplex.c:697-706), which Qhull
            # doesn't have.
            if np.all(tree.tri_points[leaf] >= 0) and not np.isnan(r):
                assert abs(ours - r) < 1e-8, (q, ours, r)
                n_checked += 1
        assert n_checked > 0.4 * len(Q)

    def test_interp_reproduces_sites(self, tree):
        # At each data site, the interpolant equals the response exactly
        # (piecewise-linear interpolation property).
        sites, temps = datasets.weather()
        for i in range(50):
            v = tree.interp(temps, sites[i])
            assert abs(v - temps[i]) < 1e-7, i

    def test_out_of_cage_returns_zero(self, tree):
        _, temps = datasets.weather()
        assert tree.interp(temps, np.array([1e7, 1e7])) == 0.0

    def test_output_triangulation(self, tree, tmp_path):
        _, temps = datasets.weather()
        integrity.output_triangulation(
            tree,
            response=temps,
            lines_path=tmp_path / "lines.dat",
            points_path=tmp_path / "points.dat",
            circles_path=tmp_path / "circles.dat",
        )
        lines = (tmp_path / "lines.dat").read_text().strip().splitlines()
        assert len(lines) > 50
        pts = (tmp_path / "points.dat").read_text().strip().splitlines()
        assert len(pts) == 50
        circ = (tmp_path / "circles.dat").read_text().strip().splitlines()
        assert all(len(l.split()) == 3 for l in circ)


class TestVsScipyTriangulation:
    def test_same_simplices_interior(self):
        # The all-data simplices of our cage triangulation must be Delaunay
        # w.r.t. the data alone (empty-circumsphere is hereditary).
        sites = _rand_sites(40, 2, 3)
        tree = ht.build(sites, flags=ht.NOSTANDARDIZE)
        sd = ScipyDelaunay(sites)
        scipy_set = {
            tuple(sorted(s)) for s in sd.simplices.tolist()
        }
        ours = set()
        for node in tree.leaves():
            pts = tree.tri_points[node]
            if np.all(pts >= 0):
                ours.add(tuple(sorted(int(tree.shuffle[p]) for p in pts)))
        # Every all-data simplex of ours appears in scipy's Delaunay
        # triangulation (up to cospherical ties, absent in random data).
        assert ours <= scipy_set
        # And we cover most of it (boundary simplices may connect to cage).
        assert len(ours) >= 0.6 * len(scipy_set)
