"""ScatteredInterp facade + serialization round-trip."""

import jax.numpy as jnp
import numpy as np
import pytest

from gsl_scattered_interpolation_tpu import ScatteredInterp
from gsl_scattered_interpolation_tpu.utils import datasets, errors, serialize


@pytest.fixture(scope="module", params=["device", "host"])
def weather_interp(request):
    sites, temps = datasets.weather()
    return (
        ScatteredInterp(sites, temps, key=0, engine=request.param),
        sites,
        temps,
    )


class TestFacade:
    def test_engines_agree(self):
        sites, temps = datasets.weather()
        si_d = ScatteredInterp(sites, temps, key=0, engine="device")
        si_h = ScatteredInterp(sites, temps, key=0, engine="host")
        rng = np.random.default_rng(0)
        Q = rng.uniform([-89.0, 41.2], [-87.0, 42.8], size=(300, 2))
        vd = np.asarray(si_d.eval(Q))
        vh = np.asarray(si_h.eval(Q))
        # identical shuffles => identical triangulations up to ties
        assert np.mean(np.abs(vd - vh) < 1e-8) > 0.97

    def test_reproduces_sites(self, weather_interp):
        si, sites, temps = weather_interp
        np.testing.assert_allclose(
            np.asarray(si.eval(sites)), temps, atol=1e-7
        )

    def test_eval_e_and_strict(self, weather_interp):
        si, sites, temps = weather_interp
        q = np.array([[-88.0, 41.5], [1e7, 1e7]])
        v, s = si.eval_e(q)
        assert s[0] == errors.SUCCESS and s[1] == errors.EDOM
        assert float(v[1]) == 0.0
        with pytest.raises(errors.DomainError):
            si.eval(q, strict=True)

    def test_gradient(self, weather_interp):
        si, sites, temps = weather_interp
        q = np.array([[-88.0, 41.9]])
        g = np.asarray(si.eval_deriv(q))
        eps = 1e-5
        for ax in range(2):
            dq = np.zeros(2)
            dq[ax] = eps
            num = (
                float(si.eval(q + dq)[0]) - float(si.eval(q - dq)[0])
            ) / (2 * eps)
            assert abs(g[0, ax] - num) < 1e-4 * max(1, abs(num))

    def test_3d_auto_cavity(self):
        rng = np.random.default_rng(1)
        sites = rng.uniform(-0.5, 0.5, size=(40, 3))
        vals = sites @ np.array([1.0, -2.0, 0.5])
        si = ScatteredInterp(sites, vals, engine="auto")
        assert si.engine == "cavity"  # device Bowyer-Watson for d == 3
        q = rng.uniform(-0.3, 0.3, size=(50, 3))
        # Linear function is reproduced exactly inside the hull wherever the
        # containing simplex is all-data.
        got = np.asarray(si.eval(q))
        expect = q @ np.array([1.0, -2.0, 0.5])
        leafs = si.tri.tri_verts[
            __import__(
                "gsl_scattered_interpolation_tpu.models.device_tri",
                fromlist=["locate"],
            ).locate(si.tri, jnp.asarray(q))[0]
        ]
        all_data = np.asarray(leafs > 3).all(axis=1)
        np.testing.assert_allclose(got[all_data], expect[all_data], atol=1e-9)

    def test_4d_auto_host(self):
        rng = np.random.default_rng(2)
        sites = rng.uniform(-0.5, 0.5, size=(25, 4))
        vals = sites.sum(axis=1)
        si = ScatteredInterp(sites, vals, engine="auto")
        assert si.engine == "host"
        got = np.asarray(si.eval(sites))
        np.testing.assert_allclose(got, vals, atol=1e-9)

    def test_validation(self):
        with pytest.raises(errors.InvalidArgumentError):
            ScatteredInterp(np.zeros((5, 2, 1)), np.zeros(5))
        with pytest.raises(errors.InvalidArgumentError):
            ScatteredInterp(np.zeros((5, 2)), np.zeros(4))
        with pytest.raises(errors.InvalidArgumentError):
            ScatteredInterp(np.zeros((5, 2)), np.zeros(5), engine="gpu")


class TestFacadeAtScale:
    def test_lazy_cell_index_path(self, monkeypatch):
        # Past the brute-force crossover the facade lazily builds and
        # caches a cell-candidate index (r5); force the crossover low so
        # a small build exercises the path, and check value agreement
        # with the dense oracle on all three eval surfaces.
        from gsl_scattered_interpolation_tpu.models import (
            device_tri as dt,
        )

        rng = np.random.default_rng(3)
        sites = rng.uniform(-0.5, 0.5, size=(600, 2))
        vals = np.sin(3 * sites[:, 0]) + sites[:, 1]
        si = ScatteredInterp(sites, vals, key=0)
        monkeypatch.setattr(dt, "DENSE_LOCATE_MAX_TRIS", 8)
        q = jnp.asarray(rng.uniform(-0.45, 0.45, size=(500, 2)))
        out = np.asarray(si.eval(q))
        assert si._cells is not None  # the lazy index was built+cached
        ref = np.asarray(
            dt.interp(si.tri, si.response, q, method="dense")
        )
        np.testing.assert_allclose(out, ref, atol=1e-9)
        v_e, status = si.eval_e(q)
        np.testing.assert_allclose(np.asarray(v_e), ref, atol=1e-9)
        assert int(np.asarray(status).max()) == 0
        g = np.asarray(si.eval_deriv(q))
        assert np.isfinite(g).all()


class TestSerialize:
    def test_round_trip(self, tmp_path, weather_interp):
        si, sites, temps = weather_interp
        p = tmp_path / "tri.npz"
        serialize.save(p, si.tri, si.response)
        tri2, resp2 = serialize.load(p)
        from gsl_scattered_interpolation_tpu.models import device_tri as dt

        rng = np.random.default_rng(2)
        Q = jnp.asarray(rng.uniform([-89.0, 41.2], [-87.0, 42.8], size=(100, 2)))
        np.testing.assert_array_equal(
            np.asarray(dt.interp(tri2, resp2, Q)),
            np.asarray(dt.interp(si.tri, si.response, Q)),
        )
