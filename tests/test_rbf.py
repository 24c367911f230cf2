"""RBF interpolation tests: exactness, scipy oracle, matrix-free CG."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.interpolate import RBFInterpolator

from gsl_scattered_interpolation_tpu.models import rbf
from gsl_scattered_interpolation_tpu.utils import errors, testing


def _sites(n=80, d=2, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.uniform(-1, 1, size=(n, d))
    f = np.sin(2 * x[:, 0]) * np.cos(x[:, 1] if d > 1 else 0.0)
    return x, f


class TestDirect:
    @pytest.mark.parametrize(
        "kernel",
        [
            "gaussian",
            "multiquadric",
            "inverse_multiquadric",
            "linear",
            "cubic",
            "thin_plate",
            "wendland_c2",
        ],
    )
    def test_interpolates_sites(self, kernel):
        x, f = _sites()
        eps = 2.0 if kernel in ("gaussian", "wendland_c2") else None
        it = rbf.RbfInterp(x, f, kernel=kernel, epsilon=eps)
        testing.test_abs(np.asarray(it.eval(x)), f, 5e-8)

    def test_tps_matches_scipy(self):
        # scipy's RBFInterpolator thin_plate_spline solves the identical
        # augmented system; values must agree to the 1e-8 target
        # (BASELINE.md RBF accuracy row) at off-site points.
        x, f = _sites(60, 2, 1)
        ours = rbf.RbfInterp(x, f, kernel="thin_plate", standardize=False)
        ref = RBFInterpolator(x, f, kernel="thin_plate_spline")
        rng = np.random.default_rng(2)
        q = rng.uniform(-0.9, 0.9, size=(200, 2))
        testing.test_abs(np.asarray(ours.eval(q)), ref(q), 1e-8)

    def test_cubic_matches_scipy(self):
        x, f = _sites(50, 2, 3)
        ours = rbf.RbfInterp(x, f, kernel="cubic", standardize=False)
        ref = RBFInterpolator(x, f, kernel="cubic")
        q = np.random.default_rng(4).uniform(-0.9, 0.9, size=(100, 2))
        testing.test_abs(np.asarray(ours.eval(q)), ref(q), 1e-8)

    def test_smooth_ridge(self):
        x, f = _sites(60, 2, 5)
        noisy = f + 0.2 * np.random.default_rng(6).normal(size=f.shape)
        exact = rbf.RbfInterp(x, noisy, kernel="gaussian", epsilon=3.0)
        smooth = rbf.RbfInterp(
            x, noisy, kernel="gaussian", epsilon=3.0, smooth=1e-2
        )
        r_exact = float(exact.residual())
        r_smooth = float(smooth.residual())
        assert r_exact < 1e-6
        assert r_smooth > 1e-3  # no longer interpolating the noise

    def test_gradient_autodiff(self):
        x, f = _sites(60, 2, 7)
        it = rbf.RbfInterp(x, f, kernel="gaussian", epsilon=2.0)
        q = np.array([[0.2, -0.1]])
        g = np.asarray(it.eval_deriv(q))[0]
        eps = 1e-6
        for ax in range(2):
            dq = np.zeros(2)
            dq[ax] = eps
            num = (float(it.eval(q + dq)[0]) - float(it.eval(q - dq)[0])) / (
                2 * eps
            )
            assert abs(g[ax] - num) < 1e-5

    def test_1d_and_3d(self):
        for d in (1, 3):
            x, f = _sites(40, d, 8 + d)
            it = rbf.RbfInterp(x, f, kernel="thin_plate")
            testing.test_abs(np.asarray(it.eval(x)), f, 1e-7)


class TestCG:
    def test_matches_direct_wendland(self):
        # CG is the large-N path for COMPACTLY supported kernels, whose
        # conditioning is support-controlled (cond ~ 1e5 at eps=6 here vs
        # ~1e11 for a global IMQ kernel, where plain CG cannot converge —
        # that regime needs the planned partition-of-unity acceleration).
        x, f = _sites(500, 2, 11)
        direct = rbf.RbfInterp(x, f, kernel="wendland_c2", epsilon=6.0)
        cg = rbf.RbfInterp(
            x,
            f,
            kernel="wendland_c2",
            epsilon=6.0,
            solver="cg",
            cg_tol=1e-12,
            cg_maxiter=2000,
            block=128,
        )
        q = np.random.default_rng(10).uniform(-0.9, 0.9, size=(100, 2))
        testing.test_abs(
            np.asarray(cg.eval(q)), np.asarray(direct.eval(q)), 1e-8
        )

    def test_wendland_compact_cg(self):
        # Compactly supported kernel: strictly PD; CG is the intended
        # large-N path (north-star config 4).
        x, f = _sites(500, 2, 11)
        it = rbf.RbfInterp(
            x,
            f,
            kernel="wendland_c2",
            epsilon=6.0,
            solver="cg",
            cg_maxiter=2000,
            block=256,
        )
        testing.test_abs(np.asarray(it.eval(x)), f, 1e-6)

    def test_projected_cg_tps_matches_direct(self):
        # Conditionally-PD kernels go through null-space projected CG.
        x, f = _sites(400, 2, 12)
        direct = rbf.RbfInterp(x, f, kernel="thin_plate")
        cg = rbf.RbfInterp(
            x,
            f,
            kernel="thin_plate",
            solver="cg",
            cg_tol=1e-12,
            cg_maxiter=4000,
            block=128,
        )
        q = np.random.default_rng(13).uniform(-0.9, 0.9, size=(150, 2))
        testing.test_abs(
            np.asarray(cg.eval(q)), np.asarray(direct.eval(q)), 1e-7
        )
        # Polynomial-tail coefficients agree too.
        np.testing.assert_allclose(
            np.asarray(cg.poly_coef), np.asarray(direct.poly_coef), atol=1e-6
        )


class TestApi:
    def test_unknown_kernel(self):
        with pytest.raises(errors.InvalidArgumentError):
            rbf.RbfInterp(np.zeros((5, 2)), np.zeros(5), kernel="cauchy")

    def test_duplicate_sites_singular(self):
        x = np.array([[0.0, 0.0], [0.0, 0.0], [1.0, 1.0], [0.0, 1.0]])
        with pytest.raises(errors.SingularError):
            rbf.RbfInterp(x, np.arange(4.0), kernel="thin_plate")


class TestProjectedPcg:
    """Local-Lagrange preconditioned projected CG (the at-scale TPS path)."""

    def test_pcg_matches_direct_tps(self):
        rng = np.random.default_rng(7)
        sites = rng.uniform(-1, 1, size=(1500, 2))
        vals = np.sin(3 * sites[:, 0]) * np.cos(2 * sites[:, 1])
        direct = rbf.RbfInterp(sites, vals, kernel="thin_plate",
                               solver="direct")
        m = rbf.RbfInterp(sites, vals, kernel="thin_plate", solver="pcg",
                          cg_tol=1e-12, cg_maxiter=500)
        # north-star accuracy: 1e-8 weights vs the f64 direct oracle
        scale = float(jnp.max(jnp.abs(direct.lam)))
        err = float(jnp.max(jnp.abs(m.lam - direct.lam))) / scale
        assert err < 1e-8, err
        np.testing.assert_allclose(
            np.asarray(m.poly_coef), np.asarray(direct.poly_coef),
            rtol=1e-6, atol=1e-9,
        )
        # convergence must be preconditioned-fast, not plain-CG-slow
        assert m.solve_info["iters"] < 150, m.solve_info

    def test_pcg_interpolates(self):
        rng = np.random.default_rng(8)
        sites = rng.uniform(0, 10, size=(800, 2))
        vals = sites[:, 0] ** 2 - sites[:, 1]
        m = rbf.RbfInterp(sites, vals, kernel="thin_plate", solver="pcg",
                          cg_tol=1e-12, cg_maxiter=500)
        at = np.asarray(m.eval(sites))
        np.testing.assert_allclose(at, vals, atol=1e-6)
