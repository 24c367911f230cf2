"""3D cavity build phase breakdown + s_cap scaling + 100k demo.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/prof3d_phase.py \
           [n_sites] [s_cap] [reps]
"""

import logging
import sys
import time

import numpy as np

logging.basicConfig(level=logging.INFO)

import jax
import jax.numpy as jnp

from gsl_scattered_interpolation_tpu.utils import config

config.enable_compile_cache()
config.log.setLevel(logging.INFO)

from gsl_scattered_interpolation_tpu.models import (
    device_cavity as dc,
    device_tri as dt,
    host_tree as ht,
)

n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
s_cap = int(sys.argv[2]) if len(sys.argv) > 2 else 512
reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2

rng = np.random.default_rng(13)
sites = rng.uniform(-0.5, 0.5, size=(n, 3))

# Phase-instrumented single run via monkey timing of from_arrays/build.
import gsl_scattered_interpolation_tpu.models.device_tri as dtm

_orig_from_arrays = dtm.from_arrays


def timed_from_arrays(*a, **k):
    t0 = time.perf_counter()
    out = _orig_from_arrays(*a, **k)
    jax.block_until_ready(out.affine)
    print(f"-- freeze (from_arrays): {time.perf_counter()-t0:.2f}s",
          flush=True)
    return out


dtm.from_arrays = timed_from_arrays

for rep in range(reps):
    t0 = time.perf_counter()
    tri, shuf = dc.triangulate(
        sites, flags=ht.NOSTANDARDIZE, dtype=jnp.float32, s_cap=s_cap
    )
    jax.block_until_ready(tri.tri_verts)
    print(
        f"== 3d n={n} s_cap={s_cap} rep{rep}: "
        f"{time.perf_counter()-t0:.2f}s ntris={int(tri.n_tris)}",
        flush=True,
    )

# quick accuracy gate on the last build
vals = np.sin(3 * sites[:, 0]) * np.cos(2 * sites[:, 1]) + sites[:, 2]
resp = dt.response_for_build(shuf, vals, d=3).astype(jnp.float32)
q = rng.uniform(-0.45, 0.45, size=(50_000, 3))
out = np.asarray(
    dt.interp(tri.cast(jnp.float32), resp, jnp.asarray(q, jnp.float32),
              method="walk")
)
from scipy.interpolate import LinearNDInterpolator

ref = LinearNDInterpolator(sites, vals)(q)
ok = np.isfinite(ref)
err = np.abs(out[ok] - ref[ok])
print(
    f"== 3d err: max {err.max():.3e} p999 {np.quantile(err, 0.999):.3e}",
    flush=True,
)
