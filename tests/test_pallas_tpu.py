"""On-hardware Pallas locate equivalence at the VMEM-cap boundary.

VERDICT r2 weak #6: the Pallas dense-locate kernel claims validity up to
T ~ 100k triangles (ops/pallas_locate.py header) but was only exercised in
interpret mode at toy T.  This opt-in test runs the real kernel on the TPU
against the XLA dense locate over a ~100k-triangle Qhull-imported
triangulation — guarding the tile/padding arithmetic and the VMEM budget
at the claimed scale.

Run with:  GSI_TEST_TPU=1 python -m pytest tests/test_pallas_tpu.py -q
(the default suite pins the CPU backend; this module self-skips there.)
"""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")

if os.environ.get("GSI_TEST_TPU") != "1":
    pytest.skip(
        "on-hardware test: set GSI_TEST_TPU=1 and run on the TPU chip",
        allow_module_level=True,
    )
if jax.devices()[0].platform != "tpu":
    pytest.skip("no TPU available", allow_module_level=True)

import jax.numpy as jnp  # noqa: E402


def test_pallas_vs_dense_at_t_boundary():
    from scipy.spatial import Delaunay as ScipyDelaunay

    from gsl_scattered_interpolation_tpu.models import (
        device_tri as dt,
        geometry_extras as gx,
    )

    rng = np.random.default_rng(42)
    n_sites = 50_500  # ~2n triangles: just above the ~100k-tri claim
    sites = rng.uniform(-0.5, 0.5, size=(n_sites, 2))
    tri = gx.from_scipy_delaunay(ScipyDelaunay(sites), sites)
    tri32 = tri.cast(jnp.float32)
    assert tri32.n_tris >= 100_000, tri32.n_tris

    from gsl_scattered_interpolation_tpu.ops import pallas_locate as plx

    q = jnp.asarray(
        rng.uniform(-0.45, 0.45, size=(200_000, 2)), jnp.float32
    )
    idx_p = np.asarray(plx.locate_dense_pallas(tri32, q))
    idx_d = np.asarray(dt.locate_dense(tri32, q)[0])

    # Index ties on shared edges are legitimate (identical min-weight to
    # f32 noise); require value-level equivalence of the implied
    # interpolant instead of bitwise index equality.
    vals = np.sin(3 * sites[:, 0]) * np.cos(2 * sites[:, 1])
    resp = jnp.concatenate(
        [jnp.zeros(3, jnp.float32), jnp.asarray(vals, jnp.float32)]
    )
    resp_tri = dt.vertex_responses(tri32, resp)
    wp = np.asarray(dt._weights(tri32, jnp.asarray(idx_p), q))
    wd = np.asarray(dt._weights(tri32, jnp.asarray(idx_d), q))
    rt = np.asarray(resp_tri)
    out_p = (rt[idx_p] * wp).sum(-1)
    out_d = (rt[idx_d] * wd).sum(-1)
    mism = idx_p != idx_d
    assert mism.mean() < 0.01, f"index mismatch rate {mism.mean():.3%}"
    diff = np.max(np.abs(out_p - out_d))
    assert diff < 1e-3, f"pallas vs dense interp diff {diff:.2e}"
