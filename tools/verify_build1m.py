"""Verify + profile the seeded 1M 2D build on the real chip (f32).

Drives the package surface end to end: triangulate (Qhull-seeded,
chunked) twice (first/steady), then walk-evals a 20k query sample
against scipy's LinearNDInterpolator as the correctness gate.

PYTHONPATH=/root/repo:/root/.axon_site python tools/verify_build1m.py [N]
"""

import logging
import sys
import time

import numpy as np

logging.basicConfig(
    level=logging.INFO, format="%(asctime)s %(message)s", stream=sys.stderr
)

import jax
import jax.numpy as jnp

from gsl_scattered_interpolation_tpu.utils import config

config.enable_compile_cache()

from gsl_scattered_interpolation_tpu.models import (
    device_delaunay as dd,
    device_tri as dt,
    host_tree as ht,
)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
import json as _json
import os as _os

BUILD_OPTS = _json.loads(_os.environ.get("GSI_VERIFY_OPTS", "{}"))
rng = np.random.default_rng(7)
sites = rng.uniform(-0.5, 0.5, size=(N, 2))
values = np.sin(6 * sites[:, 0]) * np.cos(6 * sites[:, 1])

tri = shuf = None
for label in ("first", "steady"):
    t0 = time.perf_counter()
    tri, shuf = dd.triangulate(
        sites,
        flags=ht.NOSTANDARDIZE,
        dtype=jnp.float32,
        chunk_threshold=400_000,
        grid_res=512,
        build_opts=BUILD_OPTS,
    )
    jax.block_until_ready(tri.tri_verts)
    print(f"== {label}: {time.perf_counter() - t0:.2f}s", flush=True)

# Correctness gate: walk-eval vs scipy on a 20k sample.
resp = dt.response_for_build(shuf, values).astype(jnp.float32)
tri32 = tri.cast(jnp.float32)
q = rng.uniform(-0.45, 0.45, size=(20_000, 2))
out = np.asarray(
    dt.interp(tri32, resp, jnp.asarray(q, jnp.float32), method="walk")
)
from scipy.interpolate import LinearNDInterpolator

ref = LinearNDInterpolator(sites, values)(q)
ok = np.isfinite(ref)
err = np.abs(out[ok] - ref[ok])
print(
    f"== eval vs scipy: max {err.max():.3e} p999 "
    f"{np.quantile(err, 0.999):.3e} n>1e-3 {(err > 1e-3).sum()}",
    flush=True,
)
assert err.max() < 1e-3, "seeded build eval gate FAILED"
print("== verify OK", flush=True)
