"""Cell-list compact RBF vs the dense O(N^2) reference implementation."""

import jax.numpy as jnp
import numpy as np
import pytest

from gsl_scattered_interpolation_tpu.models import rbf, rbf_compact


def _problem(n, seed=0):
    rng = np.random.default_rng(seed)
    sites = rng.uniform(-2.0, 3.0, size=(n, 2))
    vals = np.sin(2.0 * sites[:, 0]) * np.cos(sites[:, 1])
    return sites, vals


class TestCellGrid:
    def test_pack_unpack_roundtrip(self):
        sites, vals = _problem(400)
        lo, hi = sites.min(0), sites.max(0)
        xs = (sites - (lo + hi) / 2) / (hi - lo)
        grid = rbf_compact.build_cell_grid(xs, rho=0.07)
        v = jnp.asarray(vals)
        back = rbf_compact.unpack_values(
            grid, rbf_compact.pack_values(grid, v)
        )
        np.testing.assert_allclose(np.asarray(back), vals, rtol=0, atol=0)

    def test_no_site_lost(self):
        sites, _ = _problem(777, seed=3)
        lo, hi = sites.min(0), sites.max(0)
        xs = (sites - (lo + hi) / 2) / (hi - lo)
        grid = rbf_compact.build_cell_grid(xs, rho=0.03)
        slots = np.asarray(grid.slot_site).reshape(-1)
        assert sorted(slots[slots >= 0].tolist()) == list(range(777))


class TestMatvecParity:
    def test_matvec_matches_dense(self):
        sites, vals = _problem(500, seed=1)
        eps = 8.0
        lo, hi = sites.min(0), sites.max(0)
        shift, scale = (lo + hi) / 2, 1.0 / (hi - lo)
        xs = scale * (sites - shift)
        grid = rbf_compact.build_cell_grid(xs, rho=1.0 / eps)
        phi = rbf.KERNELS["wendland_c2"].phi
        # dense reference
        A = phi(rbf.pairwise_dist(jnp.asarray(xs), jnp.asarray(xs)), eps)
        want = np.asarray(A @ jnp.asarray(vals))
        v_pad = rbf_compact.pack_values(grid, jnp.asarray(vals))
        got_pad = rbf_compact.matvec_pad(grid, phi, eps, 0.0, v_pad)
        got = np.asarray(rbf_compact.unpack_values(grid, got_pad))
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


class TestCompactRbfFit:
    def test_interpolates_and_matches_dense_path(self):
        sites, vals = _problem(600, seed=2)
        m = rbf_compact.CompactRbf(
            sites, vals, epsilon=6.0, tol=1e-13, maxiter=5000
        )
        # interpolation at the sites to CG accuracy
        assert float(m.residual()) < 1e-9
        at_sites = np.asarray(m.eval(sites))
        np.testing.assert_allclose(at_sites, vals, atol=1e-9)
        # same coefficients as the dense CG path (same system)
        dense = rbf.RbfInterp(
            sites, vals, kernel="wendland_c2", epsilon=6.0, solver="cg",
            cg_tol=1e-13, cg_maxiter=5000,
        )
        np.testing.assert_allclose(
            np.asarray(m.lam), np.asarray(dense.lam), rtol=0, atol=1e-6
        )
        # off-site evaluation agrees with the dense evaluator
        rng = np.random.default_rng(5)
        q = rng.uniform(-1.5, 2.5, size=(200, 2))
        np.testing.assert_allclose(
            np.asarray(m.eval(q)), np.asarray(dense.eval(q)), atol=1e-7
        )

    def test_default_epsilon_scales(self):
        sites, vals = _problem(2000, seed=4)
        m = rbf_compact.CompactRbf(sites, vals, tol=1e-10, maxiter=5000)
        assert float(m.residual()) < 1e-5
        # reproduction quality on a smooth function away from the hull edge
        rng = np.random.default_rng(6)
        q = rng.uniform(-1.0, 2.0, size=(300, 2))
        truth = np.sin(2.0 * q[:, 0]) * np.cos(q[:, 1])
        err = np.abs(np.asarray(m.eval(q)) - truth)
        # Compact support is a LOCAL method: global reproduction of a
        # smooth function is good in the bulk but degrades where site
        # gaps approach the support radius — check bulk quality.
        assert np.median(err) < 0.01, np.median(err)
        assert np.quantile(err, 0.95) < 0.2, np.quantile(err, 0.95)
