"""Parallel Bowyer-Watson device build (any d) vs host cavity oracle.

The host engine (models/host_tree.py, cavity method) is the sequential
reference implementation — Delaunay-correct in every dimension.  On
generic-position data the Delaunay triangulation is unique, so the device
build's simplex set must match it exactly regardless of the parallel
insertion schedule (VERDICT round-1 item 5 acceptance criterion).
"""

import numpy as np
import pytest

from gsl_scattered_interpolation_tpu.models import (
    device_cavity as dc,
    device_tri as dt,
    host_tree as ht,
)
from gsl_scattered_interpolation_tpu.utils import integrity


def _rand(n, d, seed):
    rng = np.random.default_rng(seed)
    return rng.uniform(-0.5, 0.5, size=(n, d))


def _canon(tri, shuffle, d):
    """Canonical simplex set in user row ids (cage ids stay 0..d)."""
    inv = {d + 1 + i: int(shuffle[i]) + d + 1 for i in range(len(shuffle))}
    return {
        tuple(sorted(inv.get(int(v), int(v)) for v in row))
        for row in np.asarray(tri.tri_verts)
    }


class TestCavity2D:
    @pytest.mark.parametrize("n", [1, 2, 7, 50, 400])
    def test_integrity_and_euler(self, n):
        sites = _rand(n, 2, seed=n)
        tri, shuffle = dc.triangulate(sites, flags=ht.NOSTANDARDIZE)
        assert tri.n_tris == 2 * n + 1  # each 2D insertion nets 2 triangles
        integrity.check_arrays(
            np.asarray(tri.points_std),
            tri.tri_verts,
            tri.tri_nbrs,
            n_data=n,
        )

    def test_matches_host_oracle(self):
        sites = _rand(300, 2, seed=42)
        tri, shuffle = dc.triangulate(sites, flags=ht.NOSTANDARDIZE)
        tree = ht.build(sites, flags=ht.NOSTANDARDIZE)
        host = {
            tuple(sorted(int(v) for v in row))
            for row in np.asarray(dt.freeze(tree).tri_verts)
        }
        assert _canon(tri, shuffle, 2) == host

    def test_matches_flip_engine(self):
        # cavity and flip device engines agree in 2D
        from gsl_scattered_interpolation_tpu.models import (
            device_delaunay as dd,
        )

        sites = _rand(500, 2, seed=7)
        t1, s1 = dc.triangulate(sites, flags=ht.NOSTANDARDIZE)
        t2, s2 = dd.triangulate(sites, flags=ht.NOSTANDARDIZE)
        assert _canon(t1, s1, 2) == _canon(t2, s2, 2)


class TestCavity3D:
    @pytest.mark.parametrize("n", [1, 2, 5, 40, 300])
    def test_integrity(self, n):
        sites = _rand(n, 3, seed=100 + n)
        tri, shuffle = dc.triangulate(sites, flags=ht.NOSTANDARDIZE)
        integrity.check_arrays(
            np.asarray(tri.points_std),
            tri.tri_verts,
            tri.tri_nbrs,
            n_data=n,
        )

    @pytest.mark.parametrize("n", [30, 200])
    def test_matches_host_oracle(self, n):
        sites = _rand(n, 3, seed=n)
        tri, shuffle = dc.triangulate(sites, flags=ht.NOSTANDARDIZE)
        tree = ht.build(sites, flags=ht.NOSTANDARDIZE)
        host = {
            tuple(sorted(int(v) for v in row))
            for row in np.asarray(dt.freeze(tree).tri_verts)
        }
        assert _canon(tri, shuffle, 3) == host

    @pytest.mark.slow
    @pytest.mark.parametrize("n", [1500, 10_000])
    def test_matches_host_oracle_at_scale(self, n):
        # VERDICT round-1 item 5 acceptance: device build matches the host
        # cavity oracle at 10k+ generic-position sites (host build is
        # sequential Python — minutes at 10k; run with `pytest -m slow`).
        sites = _rand(n, 3, seed=n)
        tri, shuffle = dc.triangulate(sites, flags=ht.NOSTANDARDIZE)
        integrity.check_arrays(
            np.asarray(tri.points_std),
            tri.tri_verts,
            tri.tri_nbrs,
            n_data=n,
        )
        tree = ht.build(sites, flags=ht.NOSTANDARDIZE)
        host = {
            tuple(sorted(int(v) for v in row))
            for row in np.asarray(dt.freeze(tree).tri_verts)
        }
        assert _canon(tri, shuffle, 3) == host

    def test_interp_reproduces_sites(self):
        import jax.numpy as jnp
        from gsl_scattered_interpolation_tpu.models import device_tri

        n = 300
        sites = _rand(n, 3, seed=3)
        vals = np.sin(4 * sites[:, 0]) + sites[:, 1] * sites[:, 2]
        tri, shuffle = dc.triangulate(sites, flags=ht.NOSTANDARDIZE)
        resp = device_tri.response_for_build(shuffle, vals, d=3)
        out = device_tri.interp(tri, resp, jnp.asarray(sites), method="walk")
        np.testing.assert_allclose(np.asarray(out), vals, atol=1e-9)

    def test_interior_queries_match_scipy(self):
        from scipy.interpolate import LinearNDInterpolator
        import jax.numpy as jnp
        from gsl_scattered_interpolation_tpu.models import device_tri

        n = 300
        sites = _rand(n, 3, seed=11)
        vals = sites[:, 0] ** 2 + 2 * sites[:, 1] - sites[:, 2]
        tri, shuffle = dc.triangulate(sites, flags=ht.NOSTANDARDIZE)
        resp = device_tri.response_for_build(shuffle, vals, d=3)
        q = _rand(1000, 3, seed=12) * 0.7  # interior
        ours = np.asarray(
            device_tri.interp(tri, resp, jnp.asarray(q), method="walk")
        )
        ref = LinearNDInterpolator(sites, vals)(q)
        # Delaunay is unique on generic input, but near-degenerate slivers
        # may triangulate differently than Qhull; both are valid piecewise-
        # linear interpolants of the same data, so agree closely.
        m = np.isfinite(ref)
        assert m.mean() > 0.95
        np.testing.assert_allclose(ours[m], ref[m], atol=5e-3)
        assert np.mean(np.abs(ours[m] - ref[m])) < 1e-4


class TestDegenerate:
    def test_3d_lattice(self):
        # exactly-degenerate (cospherical cells) input: build must
        # terminate and produce a structurally valid triangulation
        g = np.linspace(-0.4, 0.4, 5)
        X, Y, Z = np.meshgrid(g, g, g)
        sites = np.stack([X.ravel(), Y.ravel(), Z.ravel()], axis=1)
        tri, shuffle = dc.triangulate(sites, flags=ht.NOSTANDARDIZE)
        integrity.check_arrays(
            np.asarray(tri.points_std),
            tri.tri_verts,
            tri.tri_nbrs,
            n_data=len(sites),
        )


class TestEscalation:
    def test_tiny_cavity_cap_escalates_and_matches(self):
        # cavity_cap=1 cannot hold real Bowyer-Watson cavities: rounds
        # strand (overflowing candidates defer), the k-batched device
        # loop exits early, and the host must escalate C until insertion
        # completes — the final simplex set must be identical to the
        # default build's (Delaunay uniqueness on generic input).
        sites = _rand(120, 3, seed=7)
        tri_a, shuf_a = dc.triangulate(
            sites, flags=ht.NOSTANDARDIZE, cavity_cap=1
        )
        tri_b, shuf_b = dc.triangulate(sites, flags=ht.NOSTANDARDIZE)
        assert _canon(tri_a, shuf_a, 3) == _canon(tri_b, shuf_b, 3)
        integrity.check_arrays(
            np.asarray(tri_a.points_std),
            tri_a.tri_verts,
            tri_a.tri_nbrs,
            n_data=len(sites),
        )


class TestCavity4D:
    def test_matches_host_oracle(self):
        # Arbitrary-d parity (reference README:19 plans "arbitrary
        # dimensions"; the engine's generic-d in-sphere uses the batched
        # lifted determinant): the 4D device build must reproduce the
        # host cavity oracle's simplex set exactly on generic input.
        n = 60
        sites = _rand(n, 4, seed=44)
        tri, shuffle = dc.triangulate(sites, flags=ht.NOSTANDARDIZE)
        integrity.check_arrays(
            np.asarray(tri.points_std),
            tri.tri_verts,
            tri.tri_nbrs,
            n_data=n,
        )
        tree = ht.build(sites, flags=ht.NOSTANDARDIZE)
        host = {
            tuple(sorted(int(v) for v in row))
            for row in np.asarray(dt.freeze(tree).tri_verts)
        }
        assert _canon(tri, shuffle, 4) == host

    def test_f32_matches_f64_build(self, monkeypatch):
        # VERDICT r3 item 7 acceptance: with the generic-d double-single
        # predicates (ops/robust.py orientnd_ds/inspherend_ds) a float32
        # 4D device build makes f64-grade sign decisions.  Protocol: the
        # input must be bit-identical across dtypes, so (a) sites are
        # rounded to f32-representable values and (b) the cage — whose
        # vertex positions are dtype-dependent (geometry.cage_vertices
        # scales by 1/ROOT5_EPS(dtype)) — is pinned to one
        # f32-representable geometry for both builds.  Near-degenerate
        # slivers have huge circumspheres that reach the cage, so a
        # different cage legitimately changes the simplex set; that is
        # input perturbation, not predicate noise.  The f64 build is
        # itself host-oracle-verified by test_matches_host_oracle above.
        import jax.numpy as jnp

        from gsl_scattered_interpolation_tpu.ops import geometry

        orig = geometry.cage_vertices

        def pinned(dim, shift, scale, dtype=np.float64):
            return orig(dim, shift, scale, np.float32).astype(np.float64)

        monkeypatch.setattr(geometry, "cage_vertices", pinned)

        n = 60
        sites = _rand(n, 4, seed=44).astype(np.float32).astype(np.float64)
        t32, s32 = dc.triangulate(
            sites, flags=ht.NOSTANDARDIZE, dtype=jnp.float32
        )
        integrity.check_arrays(
            np.asarray(t32.points_std),
            t32.tri_verts,
            t32.tri_nbrs,
            n_data=n,
        )
        t64, s64 = dc.triangulate(
            sites, flags=ht.NOSTANDARDIZE, dtype=jnp.float64,
            jitter_ulps=0.0,
        )
        assert _canon(t32, s32, 4) == _canon(t64, s64, 4)


class TestQhullSeed:
    """Qhull-seeded start (the import feature bootstrapping the rounds)."""

    def test_seeded_matches_host_oracle(self):
        n = 400
        sites = _rand(n, 3, seed=21)
        tri, shuffle = dc.triangulate(
            sites, flags=ht.NOSTANDARDIZE, seed_min=64
        )
        integrity.check_arrays(
            np.asarray(tri.points_std),
            tri.tri_verts,
            tri.tri_nbrs,
            n_data=n,
        )
        tree = ht.build(sites, flags=ht.NOSTANDARDIZE)
        host = {
            tuple(sorted(int(v) for v in row))
            for row in np.asarray(dt.freeze(tree).tri_verts)
        }
        assert _canon(tri, shuffle, 3) == host

    def test_seeded_2d_matches_unseeded(self):
        n = 300
        sites = _rand(n, 2, seed=22)
        t1, s1 = dc.triangulate(
            sites, flags=ht.NOSTANDARDIZE, seed_min=64
        )
        t2, s2 = dc.triangulate(
            sites, flags=ht.NOSTANDARDIZE, seed_import="self"
        )
        assert _canon(t1, s1, 2) == _canon(t2, s2, 2)
