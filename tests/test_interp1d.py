"""1D interpolation family: golden values vs scipy + analytic oracles.

Mirrors the reference's table-driven test style (interpolation/test.c:
gsl_test_abs at 1e-10) using scipy as the independent oracle where the
algorithms coincide, and analytic reproduction properties elsewhere.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.interpolate import Akima1DInterpolator, CubicSpline

from gsl_scattered_interpolation_tpu.models import interp1d as i1
from gsl_scattered_interpolation_tpu.utils import errors, testing

RNG = np.random.default_rng(0)


def _data(n=12, seed=1):
    rng = np.random.default_rng(seed)
    x = np.sort(rng.uniform(0, 10, n))
    y = np.sin(x) + 0.1 * rng.normal(size=n)
    return x, y


class TestBsearch:
    def test_gsl_semantics(self):
        # gsl_interp.h:157-194 boundary behavior.
        x = jnp.asarray([0.0, 1.0, 2.0, 3.0])
        q = jnp.asarray([-5.0, 0.0, 0.5, 1.0, 2.9, 3.0, 99.0])
        got = np.asarray(i1.bsearch(x, q))
        np.testing.assert_array_equal(got, [0, 0, 0, 1, 2, 2, 2])


class TestLinear:
    def test_exact_on_nodes_and_midpoints(self):
        x, y = _data()
        it = i1.interp(x, y, "linear")
        testing.test_abs(np.asarray(it.eval(jnp.asarray(x))), y, 1e-14)
        mid = (x[:-1] + x[1:]) / 2
        expect = (y[:-1] + y[1:]) / 2
        testing.test_abs(np.asarray(it.eval(jnp.asarray(mid))), expect, 1e-13)

    def test_integ(self):
        x = np.array([0.0, 1.0, 2.0, 3.0])
        y = np.array([0.0, 1.0, 2.0, 3.0])
        it = i1.interp(x, y, "linear")
        testing.test_rel(float(it.eval_integ(0.0, 3.0)), 4.5, 1e-13)
        testing.test_rel(float(it.eval_integ(0.5, 2.5)), 3.0, 1e-13)

    def test_deriv(self):
        x, y = _data()
        it = i1.interp(x, y, "linear")
        q = (x[:-1] + x[1:]) / 2
        m = np.diff(y) / np.diff(x)
        testing.test_rel(np.asarray(it.eval_deriv(jnp.asarray(q))), m, 1e-12)


class TestCspline:
    def test_matches_scipy_natural(self):
        x, y = _data(15, 2)
        it = i1.interp(x, y, "cspline")
        cs = CubicSpline(x, y, bc_type="natural")
        q = np.linspace(x[0], x[-1], 301)
        testing.test_abs(np.asarray(it.eval(jnp.asarray(q))), cs(q), 1e-10)
        testing.test_abs(
            np.asarray(it.eval_deriv(jnp.asarray(q))), cs(q, 1), 1e-9
        )
        testing.test_abs(
            np.asarray(it.eval_deriv2(jnp.asarray(q))), cs(q, 2), 1e-8
        )
        a, b = x[2], x[-3]
        testing.test_rel(
            float(it.eval_integ(a, b)), float(cs.integrate(a, b)), 1e-10
        )

    def test_min_system_n3(self):
        x = np.array([0.0, 1.0, 3.0])
        y = np.array([0.0, 2.0, 1.0])
        it = i1.interp(x, y, "cspline")
        cs = CubicSpline(x, y, bc_type="natural")
        q = np.linspace(0, 3, 31)
        testing.test_abs(np.asarray(it.eval(jnp.asarray(q))), cs(q), 1e-12)

    def test_periodic_matches_scipy(self):
        x = np.linspace(0, 2 * np.pi, 11)
        y = np.sin(x)
        y[-1] = y[0]
        it = i1.interp(x, y, "cspline_periodic")
        cs = CubicSpline(x, y, bc_type="periodic")
        q = np.linspace(0, 2 * np.pi, 201)
        testing.test_abs(np.asarray(it.eval(jnp.asarray(q))), cs(q), 1e-10)

    def test_out_of_range_nan_and_status(self):
        x, y = _data()
        it = i1.interp(x, y, "cspline")
        q = jnp.asarray([x[0] - 1.0, x[3], x[-1] + 1.0])
        v, s = it.eval_e(q)
        assert np.isnan(v[0]) and np.isnan(v[2]) and np.isfinite(v[1])
        np.testing.assert_array_equal(
            np.asarray(s), [errors.EDOM, errors.SUCCESS, errors.EDOM]
        )
        with pytest.raises(errors.DomainError):
            it.eval(q, strict=True)


class TestPolynomial:
    def test_reproduces_polynomial(self):
        # Divided differences on exactly-cubic data reproduce it everywhere.
        x = np.array([0.0, 1.0, 2.0, 4.0, 5.0])
        poly = lambda t: 2 * t**3 - 3 * t**2 + t - 7  # noqa: E731
        y = poly(x)
        it = i1.interp(x, y, "polynomial")
        q = np.linspace(0, 5, 41)
        testing.test_rel(np.asarray(it.eval(jnp.asarray(q))), poly(q), 1e-11)
        dp = lambda t: 6 * t**2 - 6 * t + 1  # noqa: E731
        testing.test_rel(
            np.asarray(it.eval_deriv(jnp.asarray(q))), dp(q), 1e-10
        )
        testing.test_abs(
            np.asarray(it.eval_deriv2(jnp.asarray(q))), 12 * q - 6, 1e-9
        )
        # integral of the cubic over [0,4]
        F = lambda t: 0.5 * t**4 - t**3 + 0.5 * t**2 - 7 * t  # noqa: E731
        testing.test_rel(float(it.eval_integ(0.0, 4.0)), F(4.0) - F(0.0), 1e-11)


class TestAkima:
    def test_matches_scipy_interior(self):
        # scipy's Akima1DInterpolator implements the same interior slope
        # rule but different boundary handling; compare well inside.
        x, y = _data(20, 3)
        it = i1.interp(x, y, "akima")
        ak = Akima1DInterpolator(x, y)
        q = np.linspace(x[4], x[-5], 101)
        testing.test_abs(np.asarray(it.eval(jnp.asarray(q))), ak(q), 1e-10)

    def test_reproduces_nodes(self):
        x, y = _data(9, 4)
        for kind in ("akima", "akima_periodic"):
            yy = y.copy()
            if kind == "akima_periodic":
                yy[-1] = yy[0]
            it = i1.interp(x, yy, kind)
            testing.test_abs(np.asarray(it.eval(jnp.asarray(x))), yy, 1e-12)

    def test_linear_data_stays_linear(self):
        x = np.linspace(0, 5, 8)
        y = 3 * x + 1
        it = i1.interp(x, y, "akima")
        q = np.linspace(0, 5, 50)
        testing.test_rel(np.asarray(it.eval(jnp.asarray(q))), 3 * q + 1, 1e-12)


class TestSteffen:
    def test_monotonicity_preserved(self):
        # The defining property (steffen.c header comment): no new extrema.
        x = np.arange(8.0)
        y = np.array([0.0, 0.0, 1.0, 5.0, 5.1, 9.0, 9.0, 9.0])
        it = i1.interp(x, y, "steffen")
        q = np.linspace(0, 7, 701)
        v = np.asarray(it.eval(jnp.asarray(q)))
        assert np.all(np.diff(v) >= -1e-12)
        assert v.min() >= y.min() - 1e-12 and v.max() <= y.max() + 1e-12

    def test_reproduces_nodes_and_c1(self):
        x, y = _data(10, 5)
        it = i1.interp(x, y, "steffen")
        testing.test_abs(np.asarray(it.eval(jnp.asarray(x))), y, 1e-12)
        # C1 continuity at interior knots: left/right derivative agree.
        eps = 1e-7
        for xi in x[1:-1]:
            dl = float(it.eval_deriv(jnp.asarray(xi - eps)))
            dr = float(it.eval_deriv(jnp.asarray(xi + eps)))
            assert abs(dl - dr) < 1e-4


class TestApi:
    def test_min_size_enforced(self):
        # gsl_interp_alloc enforces min_size (interp.c:35-39).
        with pytest.raises(errors.InvalidArgumentError):
            i1.interp([0.0, 1.0], [0.0, 1.0], "cspline")
        with pytest.raises(errors.InvalidArgumentError):
            i1.interp(np.arange(4.0), np.arange(4.0), "akima")

    def test_non_monotone_rejected(self):
        with pytest.raises(errors.InvalidArgumentError):
            i1.interp([0.0, 2.0, 1.0], [0.0, 1.0, 2.0], "linear")

    def test_unknown_kind(self):
        with pytest.raises(errors.InvalidArgumentError):
            i1.interp([0.0, 1.0], [0.0, 1.0], "quintic")

    def test_registry_names(self):
        assert set(i1.TYPES) == {
            "linear",
            "polynomial",
            "cspline",
            "cspline_periodic",
            "akima",
            "akima_periodic",
            "steffen",
        }

    def test_jit_eval(self):
        x, y = _data()
        it = i1.interp(x, y, "cspline")
        f = jax.jit(it.eval)
        q = jnp.linspace(float(x[0]), float(x[-1]), 64)
        np.testing.assert_allclose(
            np.asarray(f(q)), np.asarray(it.eval(q)), atol=1e-14
        )

    def test_spline_facade(self):
        x, y = _data()
        sp = i1.spline(x, y, "akima")
        assert sp.name == "akima" and sp.min_size == 5
        assert np.isfinite(float(sp.eval(jnp.asarray(x[0] + 0.1))))


class TestPeriodicContinuity:
    def test_periodic_wrap_continuity(self):
        # The reference's discontinuity detector for periodic splines
        # (test_disc.c:103-121): eval at knots +- eps must agree, including
        # across the period boundary.
        x = np.linspace(0, 2 * np.pi, 9)
        y = np.sin(x)
        y[-1] = y[0]
        for kind in ("cspline_periodic", "akima_periodic"):
            it = i1.interp(x, y, kind)
            eps = 1e-9
            for xi in x[1:-1]:
                l = float(it.eval(jnp.asarray(xi - eps)))
                r = float(it.eval(jnp.asarray(xi + eps)))
                assert abs(l - r) < 1e-7, (kind, xi)
                dl = float(it.eval_deriv(jnp.asarray(xi - eps)))
                dr = float(it.eval_deriv(jnp.asarray(xi + eps)))
                assert abs(dl - dr) < 1e-5, (kind, xi)
                if kind == "cspline_periodic":
                    # C2 kernel: second derivative is continuous too
                    # (test_disc.c iterates DERIV_ORDERS through deriv2;
                    # akima is C1 only, so deriv2 jumps by design).
                    d2l = float(it.eval_deriv2(jnp.asarray(xi - eps)))
                    d2r = float(it.eval_deriv2(jnp.asarray(xi + eps)))
                    assert abs(d2l - d2r) < 1e-3, (kind, xi)
            # Periodic closure: derivative at both ends matches.
            d0 = float(it.eval_deriv(jnp.asarray(x[0] + eps)))
            dn = float(it.eval_deriv(jnp.asarray(x[-1] - eps)))
            assert abs(d0 - dn) < 1e-5, kind


class TestStatusAndStrict:
    def test_integ_reversed_limits_edom(self):
        # gsl_interp_eval_integ_e rejects a > b as EDOM (interp.c
        # semantics): NaN value + EDOM status, never a signed integral.
        x, y = _data()
        it = i1.interp(x, y, "cspline")
        a = jnp.asarray([float(x[2])])
        b = jnp.asarray([float(x[1])])
        vals, status = it.eval_integ_e(a, b)
        assert np.isnan(np.asarray(vals)).all()
        assert (np.asarray(status) == errors.EDOM).all()
        with np.testing.assert_raises(errors.DomainError):
            it.eval_integ(a, b, strict=True)

    def test_deriv_e_variants(self):
        x, y = _data()
        it = i1.interp(x, y, "cspline")
        q = jnp.asarray([float(x[1]), float(x[-1]) + 1.0])
        for fn in (it.eval_deriv_e, it.eval_deriv2_e):
            vals, status = fn(q)
            assert np.asarray(status).tolist() == [
                errors.SUCCESS,
                errors.EDOM,
            ]
            assert np.isnan(np.asarray(vals)[1])

    def test_strict_is_jit_safe(self):
        # strict=True must not force a host sync under jit: tracing
        # succeeds and out-of-domain entries surface as NaN.
        x, y = _data()
        it = i1.interp(x, y, "linear")
        f = jax.jit(lambda q: it.eval(q, strict=True))
        out = np.asarray(f(jnp.asarray([float(x[0]), float(x[-1]) + 5.0])))
        assert np.isfinite(out[0]) and np.isnan(out[1])
