"""Verify new 3D defaults: 10k steady + accuracy gate vs scipy."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from scipy.interpolate import LinearNDInterpolator

from gsl_scattered_interpolation_tpu.models import (
    device_cavity as dc,
    device_tri as dt,
    host_tree as ht,
)

print(jax.devices(), flush=True)
N = 10_000
rng = np.random.default_rng(13)
sites = rng.uniform(-0.5, 0.5, size=(N, 3))
vals = np.sin(3 * sites[:, 0]) * np.cos(2 * sites[:, 1]) + sites[:, 2]
ts = []
for rep in range(2):
    t0 = time.perf_counter()
    tri, shuf = dc.triangulate(
        sites + (1e-9 if rep else 0.0),
        flags=ht.NOSTANDARDIZE, dtype=jnp.float32,
    )
    jax.block_until_ready(tri.tri_verts)
    ts.append(time.perf_counter() - t0)
print(f"10k defaults: first {ts[0]:.1f}s steady {ts[1]:.2f}s", flush=True)
resp = dt.response_for_build(shuf, vals, d=3).astype(jnp.float32)
q = rng.uniform(-0.45, 0.45, size=(20_000, 3))
out = np.asarray(
    dt.interp(tri.cast(jnp.float32), resp, jnp.asarray(q, jnp.float32),
              method="walk")
)
ref = LinearNDInterpolator(sites + 1e-9, vals)(q)
ok = np.isfinite(ref)
err = np.abs(out[ok] - ref[ok])
print(
    f"err max {err.max():.2e} p999 {np.quantile(err, 0.999):.2e} "
    f"n>1e-4 {(err > 1e-4).sum()}",
    flush=True,
)
