"""Geometry kernel tests: golden values + scipy cross-checks.

Mirrors the reference's implicit geometry contracts: the regular-simplex
cage construction (linear_simplex.c:215-267), barycentric solve convention
(:607-651), containment (:653-676), Eickemeyer circumsphere (:556-605), and
the in-sphere tie-break (:535-536).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from gsl_scattered_interpolation_tpu.ops import geometry as g
from gsl_scattered_interpolation_tpu.utils import machine, testing


class TestRegularSimplex:
    @pytest.mark.parametrize("dim", [1, 2, 3, 4, 7])
    def test_unit_circumradius_and_equilateral(self, dim):
        s = g.regular_simplex(dim)
        # All vertices on the unit sphere.
        testing.test_rel(np.linalg.norm(s, axis=1), np.ones(dim + 1), 1e-12)
        # All pairwise distances equal.
        d2 = np.sum((s[:, None] - s[None, :]) ** 2, axis=-1)
        off = d2[~np.eye(dim + 1, dtype=bool)]
        testing.test_rel(off, np.full_like(off, off[0]), 1e-12)

    def test_2d_matches_construction(self):
        # linear_simplex.c:215-232 with d=2: v0=(1,0), v1=(-1/2, sqrt(3)/2)...
        s = g.regular_simplex(2)
        testing.test_abs(s[0], [1.0, 0.0], 1e-15)
        testing.test_abs(s[1], [-0.5, np.sqrt(3) / 2], 1e-15)
        testing.test_abs(s[2], [-0.5, -np.sqrt(3) / 2], 1e-15)

    def test_cage_scale_up(self):
        # Insphere radius after scale-up is 1/root5(eps) >> 0.5 data range
        # (linear_simplex.c:234-251).
        dim = 2
        shift = np.zeros(dim)
        scale = np.ones(dim)
        cage = g.cage_vertices(dim, shift, scale)
        s = g.regular_simplex(dim)
        altitude = s[0, 0] - s[1, 0]
        radius = altitude / (dim + 1)
        expected = s / (machine.ROOT5_DBL_EPSILON * radius)
        testing.test_rel(cage, expected, 1e-14)
        assert np.abs(cage).max() > 1000  # 1/root5(dbl eps) ~ 1351

    def test_cage_inverse_standardization(self):
        shift = np.array([10.0, -5.0])
        scale = np.array([0.5, 2.0])
        cage = g.cage_vertices(2, shift, scale)
        base = g.cage_vertices(2, np.zeros(2), np.ones(2))
        testing.test_rel(cage, base / scale + shift, 1e-14)


class TestBary:
    def test_simple_triangle(self):
        verts = jnp.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
        # Convention: coords are weights of verts 0..d-1; vert d weight = 1-sum.
        c, ok = g.bary_coords(verts, jnp.array([0.0, 0.0]))
        assert ok
        testing.test_abs(np.asarray(c), [1.0, 0.0], 1e-14)
        c, _ = g.bary_coords(verts, jnp.array([1.0, 0.0]))
        testing.test_abs(np.asarray(c), [0.0, 1.0], 1e-14)
        c, _ = g.bary_coords(verts, jnp.array([0.0, 1.0]))
        testing.test_abs(np.asarray(c), [0.0, 0.0], 1e-14)
        c, _ = g.bary_coords(verts, jnp.array([1 / 3, 1 / 3]))
        testing.test_abs(np.asarray(c), [1 / 3, 1 / 3], 1e-14)

    @pytest.mark.parametrize("dim", [2, 3, 5])
    def test_reconstruction_batched(self, dim):
        rng = np.random.default_rng(0)
        n = 64
        verts = rng.normal(size=(n, dim + 1, dim))
        w = rng.dirichlet(np.ones(dim + 1), size=n)
        q = np.einsum("nkd,nk->nd", verts, w)
        c, ok = g.bary_coords(jnp.asarray(verts), jnp.asarray(q))
        assert np.all(np.asarray(ok))
        full = np.concatenate(
            [np.asarray(c), 1 - np.sum(np.asarray(c), -1, keepdims=True)], -1
        )
        testing.test_abs(full, w, 1e-9)
        assert np.all(np.asarray(g.contains(c, ok)))

    def test_singular_is_not_inside(self):
        # Degenerate (collinear) triangle: singular => contains False
        # (linear_simplex.c:661-663).
        verts = jnp.array([[0.0, 0.0], [1.0, 1.0], [2.0, 2.0]])
        c, ok = g.bary_coords(verts, jnp.array([0.5, 0.5]))
        assert not bool(ok)
        assert not bool(g.contains(c, ok))
        assert np.isinf(np.asarray(g.worst_violation(c, ok)))

    def test_worst_violation(self):
        verts = jnp.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
        # Outside across the x-edge: coord0 = bary of vert0... compute directly.
        c, ok = g.bary_coords(verts, jnp.array([-0.25, 0.5]))
        v = float(g.worst_violation(c, ok))
        # Reference metric (linear_simplex.c:375-390): max violation of any
        # coord or the sum from [0,1].
        cc = np.asarray(c)
        tot = cc.sum()
        expected = max(
            max(max(-cc.min(), (cc - 1).max()), 0),
            max(-tot, tot - 1, 0),
        )
        testing.test_rel(v, expected, 1e-12)
        assert v > 0


class TestCircumsphere:
    def test_right_triangle(self):
        # Circumcenter of right triangle = hypotenuse midpoint.
        verts = jnp.array([[0.0, 0.0], [2.0, 0.0], [0.0, 2.0]])
        center, r2, ok = g.circumsphere(verts)
        assert ok
        testing.test_abs(np.asarray(center), [1.0, 1.0], 1e-12)
        testing.test_rel(float(r2), 2.0, 1e-12)

    @pytest.mark.parametrize("dim", [2, 3, 4])
    def test_equidistance_batched(self, dim):
        rng = np.random.default_rng(1)
        verts = rng.normal(size=(32, dim + 1, dim))
        center, r2, ok = g.circumsphere(jnp.asarray(verts))
        assert np.all(np.asarray(ok))
        d2 = np.sum(
            (verts - np.asarray(center)[:, None, :]) ** 2, axis=-1
        )
        testing.test_rel(d2, np.broadcast_to(np.asarray(r2)[:, None], d2.shape), 1e-7)

    def test_degenerate_in_sphere_true(self):
        # Collinear points: singular system; in_sphere must report True
        # (linear_simplex.c:517-521).
        verts = jnp.array([[0.0, 0.0], [1.0, 0.0], [2.0, 0.0]])
        center, r2, ok = g.circumsphere(verts)
        assert not bool(ok)
        assert bool(g.in_sphere(center, r2, ok, jnp.array([50.0, 50.0])))

    def test_in_sphere_tie_break(self):
        # A point exactly on the sphere is OUT (strict, shrunken radius,
        # linear_simplex.c:535-536).
        verts = jnp.array([[1.0, 0.0], [0.0, 1.0], [-1.0, 0.0]])
        center, r2, ok = g.circumsphere(verts)
        assert bool(g.in_sphere(center, r2, ok, jnp.array([0.0, 0.0])))
        assert not bool(g.in_sphere(center, r2, ok, jnp.array([0.0, -1.0])))


class TestStandardize:
    def test_shift_scale(self):
        lo = jnp.array([0.0, -2.0])
        hi = jnp.array([4.0, 2.0])
        shift, scale = g.shift_scale_from_bounds(lo, hi)
        testing.test_abs(np.asarray(shift), [2.0, 0.0], 1e-15)
        testing.test_abs(np.asarray(scale), [0.25, 0.25], 1e-15)
        # Standardized data spans [-0.5, 0.5].
        testing.test_abs(
            np.asarray(g.standardize(lo, shift, scale)), [-0.5, -0.5], 1e-15
        )
        testing.test_abs(
            np.asarray(g.standardize(hi, shift, scale)), [0.5, 0.5], 1e-15
        )

    def test_degenerate_extent_scale_one(self):
        # max-min <= 0 => scale 1.0 fallback (linear_simplex.c:193-196).
        shift, scale = g.shift_scale_from_bounds(
            jnp.array([1.0]), jnp.array([1.0])
        )
        testing.test_abs(np.asarray(scale), [1.0], 0)

    def test_isoscale(self):
        s = g.isotropic_scale(jnp.array([0.5, 0.2, 0.9]))
        testing.test_abs(np.asarray(s), [0.2, 0.2, 0.2], 0)


def test_orient2d():
    a = jnp.array([0.0, 0.0])
    b = jnp.array([1.0, 0.0])
    c = jnp.array([0.0, 1.0])
    assert float(g.orient2d(a, b, c)) > 0
    assert float(g.orient2d(a, c, b)) < 0
    assert float(g.orient2d(a, b, jnp.array([2.0, 0.0]))) == 0
