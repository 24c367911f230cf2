"""Ordinary kriging: exactness, variance semantics, variogram fitting."""

import numpy as np
import pytest

from gsl_scattered_interpolation_tpu.models import kriging
from gsl_scattered_interpolation_tpu.utils import datasets, errors, testing


def _field(n=120, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.uniform(0, 10, size=(n, 2))
    f = np.sin(x[:, 0] * 0.8) + 0.5 * np.cos(x[:, 1] * 1.1)
    return x, f


class TestVariogram:
    def test_models_shape(self):
        h = np.linspace(0, 5, 50)
        for m in kriging.VARIOGRAM_MODELS:
            v = kriging.Variogram(m, nugget=0.1, sill=2.0, range_=2.0)
            g = np.asarray(v(h))
            assert g[0] == 0.0  # gamma(0) = 0 by definition
            assert np.all(np.diff(g) > -1e-9)  # monotone increasing
            # approaches nugget+sill at large h
            assert abs(g[-1] - 2.1) < 0.2

    def test_fit_recovers_parameters(self):
        # Synthetic empirical variogram from a known model.
        truth = kriging.Variogram("spherical", nugget=0.2, sill=1.5, range_=0.4)
        h = np.linspace(0.01, 0.8, 20)
        g = np.asarray(truth(h))
        w = np.full(20, 100.0)
        fit = kriging.fit_variogram(h, g, w, model="spherical")
        assert abs(fit.nugget - 0.2) < 0.05
        assert abs(fit.sill - 1.5) < 0.1
        assert abs(fit.range_ - 0.4) < 0.1

    def test_empirical_on_smooth_field(self):
        x, f = _field()
        xs = (x - x.mean(0)) / (x.max(0) - x.min(0))
        c, g, w = kriging.empirical_variogram(xs, f)
        g = np.asarray(g)
        c = np.asarray(c)
        # Smooth field: variogram small at short lags, larger at long lags.
        assert g[0] < g[np.asarray(w) > 0].max() / 2

    def test_unknown_model(self):
        with pytest.raises(errors.InvalidArgumentError):
            kriging.fit_variogram(np.arange(5.0), np.arange(5.0), np.ones(5), "cubic")


class TestOrdinaryKriging:
    def test_exact_at_sites_without_nugget(self):
        x, f = _field(80, 1)
        vg = kriging.Variogram("exponential", nugget=0.0, sill=1.0, range_=0.5)
        ok = kriging.OrdinaryKriging(x, f, variogram=vg)
        mean, var = ok.predict(x)
        testing.test_abs(np.asarray(mean), f, 1e-6)
        assert np.all(np.asarray(var) < 1e-6)

    def test_variance_grows_with_distance(self):
        x, f = _field(60, 2)
        ok = kriging.OrdinaryKriging(x, f)
        near = x[0] + 0.01
        far = np.array([50.0, 50.0])
        _, v_near = ok.predict(near[None, :])
        _, v_far = ok.predict(far[None, :])
        assert float(v_far[0]) > float(v_near[0]) * 10

    def test_weights_sum_to_one(self):
        # Ordinary kriging is an exact average: constant fields reproduce.
        x, _ = _field(50, 3)
        const = np.full(50, 7.25)
        ok = kriging.OrdinaryKriging(x, const)
        q = np.random.default_rng(4).uniform(0, 10, size=(40, 2))
        mean, _ = ok.predict(q)
        testing.test_rel(np.asarray(mean), np.full(40, 7.25), 1e-8)

    def test_weather_end_to_end(self):
        sites, temps = datasets.weather()
        ok = kriging.OrdinaryKriging(sites, temps)
        mean, var = ok.predict(np.array([[-88.0, 41.5], [-88.5, 42.0]]))
        assert np.all(np.isfinite(np.asarray(mean)))
        assert np.all(np.asarray(var) >= 0)
        assert 260 < float(mean[0]) < 300
        # auto-fitted variogram is sane
        vg = ok.variogram
        assert vg.range_ > 0 and vg.sill > 0 and vg.nugget >= 0


class TestLocalKriging:
    """Local-neighborhood OK: the at-scale error-estimates path."""

    def test_matches_dense_when_k_covers_all(self):
        x, f = _field(48, 3)
        vg = kriging.Variogram(
            "exponential", nugget=0.0, sill=1.0, range_=0.5
        )
        dense = kriging.OrdinaryKriging(x, f, variogram=vg)
        local = kriging.LocalKriging(
            x, f, variogram=vg, k_neighbors=48, target_per_cell=200.0
        )
        rng = np.random.default_rng(4)
        q = rng.uniform(1, 9, size=(200, 2))
        m_d, v_d = dense.predict(q)
        m_l, v_l = local.predict(q)
        testing.test_abs(np.asarray(m_l), np.asarray(m_d), 1e-7)
        testing.test_abs(np.asarray(v_l), np.asarray(v_d), 1e-7)

    def test_exact_at_sites_and_variance_grows(self):
        x, f = _field(5000, 5)
        vg = kriging.Variogram(
            "exponential", nugget=0.0, sill=1.0, range_=0.2
        )
        local = kriging.LocalKriging(x, f, variogram=vg, k_neighbors=24)
        mean, var = local.predict(x[:500])
        np.testing.assert_allclose(np.asarray(mean), f[:500], atol=1e-5)
        assert np.all(np.asarray(var) < 1e-5)
        # far from every site: variance approaches sill
        far = np.asarray([[50.0, 50.0]])
        _, v_far = local.predict(far)
        assert float(v_far[0]) > 0.5

    def test_at_scale_runs(self):
        # 50k sites: the dense path cannot build this (O(n^2) memory);
        # the local path streams it.
        rng = np.random.default_rng(6)
        x = rng.uniform(0, 10, size=(50_000, 2))
        f = np.sin(x[:, 0] * 0.8) + 0.5 * np.cos(x[:, 1] * 1.1)
        local = kriging.LocalKriging(x, f, k_neighbors=16)
        q = rng.uniform(0.5, 9.5, size=(2_000, 2))
        mean, var = local.predict(q)
        ref = np.sin(q[:, 0] * 0.8) + 0.5 * np.cos(q[:, 1] * 1.1)
        # dense local field: interpolation error well under the signal
        assert np.max(np.abs(np.asarray(mean) - ref)) < 0.05
        assert np.all(np.asarray(var) >= 0)

    def test_3d_matches_dense_when_k_covers_all(self):
        # d > 2 (VERDICT r3 item 8: lift the 2D restriction): the 3^d
        # cell neighborhood + local saddle solves must reproduce the
        # dense OK predictor when k covers every site.
        rng = np.random.default_rng(9)
        x = rng.uniform(0, 10, size=(40, 3))
        f = np.sin(x[:, 0] * 0.5) + 0.3 * x[:, 1] - 0.2 * x[:, 2]
        vg = kriging.Variogram(
            "exponential", nugget=0.0, sill=1.0, range_=0.5
        )
        dense = kriging.OrdinaryKriging(x, f, variogram=vg)
        local = kriging.LocalKriging(
            x, f, variogram=vg, k_neighbors=40, target_per_cell=200.0
        )
        q = rng.uniform(1, 9, size=(150, 3))
        m_d, v_d = dense.predict(q)
        m_l, v_l = local.predict(q)
        testing.test_abs(np.asarray(m_l), np.asarray(m_d), 1e-7)
        testing.test_abs(np.asarray(v_l), np.asarray(v_d), 1e-7)

    def test_refit_does_not_recompile(self):
        # the fitted variogram floats are traced operands: two models
        # with different parameters (same structure) must share ONE
        # compiled predict program (VERDICT r3 item 8).
        rng = np.random.default_rng(11)
        x = rng.uniform(0, 10, size=(400, 2))
        f = np.sin(x[:, 0]) + np.cos(x[:, 1])
        vg1 = kriging.Variogram(
            "spherical", nugget=0.01, sill=1.0, range_=0.4
        )
        vg2 = kriging.Variogram(
            "spherical", nugget=0.05, sill=2.0, range_=0.7
        )
        q = rng.uniform(1, 9, size=(100, 2))
        m1 = kriging.LocalKriging(
            x, f, variogram=vg1, k_neighbors=12, target_per_cell=4.0
        )
        n0 = kriging._local_predict._cache_size()
        m1.predict(q)
        n1 = kriging._local_predict._cache_size()
        m2 = kriging.LocalKriging(
            x, f + 0.5, variogram=vg2, k_neighbors=12,
            target_per_cell=4.0,
        )
        out2 = m2.predict(q)
        n2 = kriging._local_predict._cache_size()
        assert n1 == n0 + 1
        assert n2 == n1, "refit with new variogram floats recompiled"
        assert np.all(np.isfinite(np.asarray(out2[0])))
