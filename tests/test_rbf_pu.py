"""Partition-of-unity TPS: interpolation exactness + accuracy vs global."""

import jax
import jax.numpy as jnp
import numpy as np

from gsl_scattered_interpolation_tpu.models import rbf, rbf_pu


def _problem(n, seed=0):
    rng = np.random.default_rng(seed)
    sites = rng.uniform(-2.0, 1.0, size=(n, 2))
    vals = np.sin(2 * sites[:, 0]) * np.cos(sites[:, 1]) + 0.1 * sites[:, 1]
    return sites, vals


class TestPuTps:
    def test_interpolates_sites_exactly(self):
        sites, vals = _problem(3000)
        m = rbf_pu.fit(sites, vals)
        at = np.asarray(rbf_pu.evaluate(m, sites))
        np.testing.assert_allclose(at, vals, atol=5e-8)

    def test_matches_global_tps_off_sites(self):
        sites, vals = _problem(2500, seed=1)
        m = rbf_pu.fit(sites, vals)
        g = rbf.RbfInterp(sites, vals, kernel="thin_plate", solver="direct")
        rng = np.random.default_rng(2)
        q = rng.uniform(-1.8, 0.8, size=(500, 2))
        pu = np.asarray(rbf_pu.evaluate(m, q))
        gl = np.asarray(g.eval(q))
        # Locally the PU blend tracks the global spline closely.
        assert np.abs(pu - gl).max() < 5e-3, np.abs(pu - gl).max()
        truth = np.sin(2 * q[:, 0]) * np.cos(q[:, 1]) + 0.1 * q[:, 1]
        assert np.abs(pu - truth).max() < 5e-3

    def test_jit_eval_and_fadeout(self):
        sites, vals = _problem(800, seed=3)
        m = rbf_pu.fit(sites, vals)
        f = jax.jit(lambda qq: rbf_pu.evaluate(m, qq))
        out = np.asarray(f(jnp.asarray([[0.0, 0.0], [50.0, 50.0]])))
        assert np.isfinite(out).all()
        assert out[1] == 0.0  # far outside every patch: fade to zero
