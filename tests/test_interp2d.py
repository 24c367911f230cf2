"""2D interpolation family tests (bilinear/bicubic, test2d.c style)."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.interpolate import RegularGridInterpolator

from gsl_scattered_interpolation_tpu.models import interp2d as i2
from gsl_scattered_interpolation_tpu.utils import errors, testing


def _grid(nx=6, ny=7, seed=0):
    rng = np.random.default_rng(seed)
    x = np.sort(rng.uniform(0, 4, nx))
    y = np.sort(rng.uniform(0, 5, ny))
    z = np.sin(x)[:, None] * np.cos(y)[None, :]
    return x, y, z


class TestBilinear:
    def test_matches_scipy(self):
        x, y, z = _grid()
        it = i2.interp2d(x, y, z, "bilinear")
        r = RegularGridInterpolator((x, y), z, method="linear")
        rng = np.random.default_rng(1)
        q = rng.uniform([x[0], y[0]], [x[-1], y[-1]], size=(200, 2))
        ours = np.asarray(it.eval(jnp.asarray(q[:, 0]), jnp.asarray(q[:, 1])))
        testing.test_abs(ours, r(q), 1e-12)

    def test_symmetric_case(self):
        # test2d.c's symmetric bilinear case: z = x + y on the unit square.
        x = np.array([0.0, 1.0])
        y = np.array([0.0, 1.0])
        z = x[:, None] + y[None, :]
        it = i2.interp2d(x, y, z, "bilinear")
        q = np.random.default_rng(2).uniform(0, 1, size=(50, 2))
        testing.test_abs(
            np.asarray(it.eval(jnp.asarray(q[:, 0]), jnp.asarray(q[:, 1]))),
            q.sum(1),
            1e-14,
        )

    def test_derivs(self):
        x, y, z = _grid()
        it = i2.interp2d(x, y, z, "bilinear")
        xq, yq = jnp.asarray([1.3]), jnp.asarray([2.1])
        eps = 1e-6
        d_num = (it.eval(xq + eps, yq) - it.eval(xq - eps, yq)) / (2 * eps)
        testing.test_abs(
            np.asarray(it.eval_deriv_x(xq, yq)), np.asarray(d_num), 1e-6
        )
        assert float(it.eval_deriv_xx(xq, yq)[0]) == 0.0
        assert float(it.eval_deriv_yy(xq, yq)[0]) == 0.0


class TestBicubic:
    def test_reproduces_nodes(self):
        x, y, z = _grid()
        it = i2.interp2d(x, y, z, "bicubic")
        gx, gy = np.meshgrid(x, y, indexing="ij")
        ours = np.asarray(
            it.eval(jnp.asarray(gx.ravel()), jnp.asarray(gy.ravel()))
        ).reshape(z.shape)
        testing.test_abs(ours, z, 1e-12)

    def test_linear_exactness(self):
        # test2d.c bicubic linear case: exactly reproduces affine surfaces.
        x = np.linspace(0, 3, 5)
        y = np.linspace(0, 2, 4)
        z = 2 * x[:, None] + 3 * y[None, :] + 1
        it = i2.interp2d(x, y, z, "bicubic")
        rng = np.random.default_rng(3)
        q = rng.uniform([0, 0], [3, 2], size=(100, 2))
        testing.test_rel(
            np.asarray(it.eval(jnp.asarray(q[:, 0]), jnp.asarray(q[:, 1]))),
            2 * q[:, 0] + 3 * q[:, 1] + 1,
            1e-12,
        )
        testing.test_abs(
            np.asarray(
                it.eval_deriv_x(jnp.asarray(q[:, 0]), jnp.asarray(q[:, 1]))
            ),
            np.full(100, 2.0),
            1e-11,
        )

    def test_c1_continuity_across_cells(self):
        x, y, z = _grid(8, 8, 5)
        it = i2.interp2d(x, y, z, "bicubic")
        eps = 1e-9
        for xi in x[2:-2]:
            yq = jnp.asarray([y[3] + 0.01])
            l = float(it.eval(jnp.asarray([xi - eps]), yq)[0])
            r = float(it.eval(jnp.asarray([xi + eps]), yq)[0])
            assert abs(l - r) < 1e-6
            dl = float(it.eval_deriv_x(jnp.asarray([xi - eps]), yq)[0])
            dr = float(it.eval_deriv_x(jnp.asarray([xi + eps]), yq)[0])
            assert abs(dl - dr) < 1e-5

    def test_smooth_function_accuracy(self):
        # Dense grid on a smooth function: bicubic error ~ h^2-ish for the
        # derivative construction; just require much better than bilinear.
        x = np.linspace(0, np.pi, 20)
        y = np.linspace(0, np.pi, 20)
        z = np.sin(x)[:, None] * np.sin(y)[None, :]
        bic = i2.interp2d(x, y, z, "bicubic")
        bil = i2.interp2d(x, y, z, "bilinear")
        rng = np.random.default_rng(4)
        q = rng.uniform([0.3, 0.3], [np.pi - 0.3, np.pi - 0.3], size=(300, 2))
        truth = np.sin(q[:, 0]) * np.sin(q[:, 1])
        e_bic = np.abs(
            np.asarray(bic.eval(jnp.asarray(q[:, 0]), jnp.asarray(q[:, 1])))
            - truth
        ).max()
        e_bil = np.abs(
            np.asarray(bil.eval(jnp.asarray(q[:, 0]), jnp.asarray(q[:, 1])))
            - truth
        ).max()
        assert e_bic < e_bil / 50
        assert e_bic < 1e-5

    def test_extrap_vs_domain(self):
        x, y, z = _grid()
        it = i2.interp2d(x, y, z, "bicubic")
        out = it.eval(jnp.asarray([x[-1] + 1.0]), jnp.asarray([y[0]]))
        assert np.isnan(np.asarray(out)[0])
        ext = it.eval_extrap(jnp.asarray([x[-1] + 1.0]), jnp.asarray([y[0]]))
        assert np.isfinite(np.asarray(ext)[0])
        v, s = it.eval_e(jnp.asarray([x[0], x[-1] + 1]), jnp.asarray([y[0], y[0]]))
        np.testing.assert_array_equal(np.asarray(s), [errors.SUCCESS, errors.EDOM])


class TestApi:
    def test_shape_validation(self):
        with pytest.raises(errors.InvalidArgumentError):
            i2.interp2d(np.arange(4.0), np.arange(5.0), np.zeros((5, 4)))

    def test_min_size(self):
        with pytest.raises(errors.InvalidArgumentError):
            i2.interp2d(
                np.arange(3.0), np.arange(3.0), np.zeros((3, 3)), "bicubic"
            )

    def test_flat_layout_helpers(self):
        zf = jnp.arange(12.0)  # xsize=3, ysize=4
        assert i2.idx(2, 1, 3) == 5
        assert float(i2.zget(zf, 2, 1, 3)) == 5.0
        zf2 = i2.zset(zf, 0, 0, 3, 99.0)
        assert float(zf2[0]) == 99.0

    def test_spline2d_facade(self):
        x, y, z = _grid()
        sp = i2.spline2d(x, y, z, "bilinear")
        assert sp.name == "bilinear"
        assert float(sp.xmin) == x[0] and float(sp.ymax) == y[-1]
