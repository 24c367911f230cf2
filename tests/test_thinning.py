"""Data thinning: error-bounded greedy decimation (README:29)."""

import numpy as np

from gsl_scattered_interpolation_tpu.models import (
    device_tri as dt,
    thinning,
)


def _smooth_problem(n, seed=0):
    rng = np.random.default_rng(seed)
    sites = rng.uniform(0.0, 4.0, size=(n, 2))
    vals = np.sin(sites[:, 0]) + 0.3 * np.cos(2 * sites[:, 1])
    return sites, vals


class TestThin:
    def test_error_bound_holds(self):
        sites, vals = _smooth_problem(1200)
        tol = 0.02
        res = thinning.thin(sites, vals, tol=tol, key=1, builder="qhull")
        assert res.max_error <= tol
        # Substantial compression on a smooth field.
        assert res.keep.size < 0.55 * len(sites), res.keep.size
        # Independent re-check of the contract: every dropped site is
        # reproduced within tol by the kept triangulation.
        drop = np.setdiff1d(np.arange(len(sites)), res.keep)
        resp = dt.response_for_build(res.shuffle, vals[res.keep])
        est = np.asarray(dt.interp(res.tri, resp, sites[drop]))
        assert np.abs(est - vals[drop]).max() <= tol + 1e-12

    def test_linear_field_collapses(self):
        # A plane is reproduced exactly by any covering triangulation:
        # thinning should keep roughly only the seed set.
        rng = np.random.default_rng(3)
        sites = rng.uniform(-1, 1, size=(800, 2))
        vals = 2.0 * sites[:, 0] - sites[:, 1] + 0.25
        res = thinning.thin(sites, vals, tol=1e-8, key=2, builder="qhull")
        assert res.max_error <= 1e-8
        assert res.keep.size <= 0.1 * len(sites)

    def test_tight_tol_keeps_more(self):
        sites, vals = _smooth_problem(600, seed=5)
        loose = thinning.thin(sites, vals, tol=0.05, key=3, builder="qhull")
        tight = thinning.thin(sites, vals, tol=0.002, key=3, builder="qhull")
        assert tight.keep.size > loose.keep.size
        assert tight.max_error <= 0.002


    def test_3d_error_bound_holds(self):
        # Any-d thinning (the reference plans thinning with no dimension
        # restriction, README:28-29): d=3 routes to the qhull builder.
        rng = np.random.default_rng(7)
        sites = rng.uniform(0.0, 2.0, size=(1500, 3))
        vals = (
            np.sin(sites[:, 0])
            + 0.3 * np.cos(2 * sites[:, 1])
            + 0.2 * sites[:, 2]
        )
        tol = 0.05
        res = thinning.thin(sites, vals, tol=tol, key=6)
        assert res.max_error <= tol
        assert res.keep.size < len(sites)
        drop = np.setdiff1d(np.arange(len(sites)), res.keep)
        resp = dt.response_for_build(res.shuffle, vals[res.keep], d=3)
        est = np.asarray(dt.interp(res.tri, resp, sites[drop]))
        assert np.abs(est - vals[drop]).max() <= tol + 1e-12

    def test_device_builder_small(self):
        # The native-device builder path, kept small (one compile/size).
        sites, vals = _smooth_problem(300, seed=9)
        res = thinning.thin(
            sites, vals, tol=0.05, key=4, seed_frac=1 / 8.0
        )
        assert res.max_error <= 0.05
        assert res.keep.size < len(sites)
