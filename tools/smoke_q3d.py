"""TPU smoke for the fixed 3D cells-locate at the bench's exact shapes.

Imports a Qhull triangulation (skipping the 95s cavity build) so the
query-path program compiled here is shape-identical to bench.py's
queries_3d config: 10k sites -> ~67k tets, B=2M f32 queries.
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from gsl_scattered_interpolation_tpu.models import (
    device_tri as dt,
    geometry_extras as ge,
)
from gsl_scattered_interpolation_tpu.utils import config

config.enable_compile_cache()

N = 10_000
rng = np.random.default_rng(13)
sites = rng.uniform(-0.5, 0.5, size=(N, 3))
vals = np.sin(3 * sites[:, 0]) * np.cos(2 * sites[:, 1]) + sites[:, 2]

from scipy.spatial import Delaunay
from scipy.interpolate import LinearNDInterpolator

sd = Delaunay(sites)
tri = ge.from_scipy_delaunay(sd, sites).cast(jnp.float32)
print(f"T = {tri.n_tris}", flush=True)
resp = jnp.concatenate(
    [jnp.zeros(4), jnp.asarray(vals)]
).astype(jnp.float32)

t0 = time.perf_counter()
cells = dt.build_cell_index(tri)
jax.block_until_ready(cells.table)
t_index = time.perf_counter() - t0
packed = cells.rows is None
print(
    f"index: G={cells.res} K={cells.k} packed={packed} "
    f"table={cells.table.size * 4 / 1e6:.0f}MB build {t_index:.1f}s",
    flush=True,
)

resp_tri = dt.vertex_responses(tri, resp)
chunk = 2_000_000
f = jax.jit(
    lambda t, rt, q, c: dt.interp(
        t, None, q, method="cells", cells=c, resp_tri=rt
    )
)
rng2 = np.random.default_rng(14)
Q = jnp.asarray(rng2.uniform(-0.45, 0.45, size=(chunk, 3)), jnp.float32)
t0 = time.perf_counter()
out0 = f(tri, resp_tri, Q, cells)
jax.block_until_ready(out0)
print(f"first call (compile+exec): {time.perf_counter()-t0:.1f}s", flush=True)

sub = np.asarray(Q[:20_000], np.float64)
ref = LinearNDInterpolator(sites, vals)(sub)
ok = np.isfinite(ref)
gate = np.max(np.abs(np.asarray(out0[:20_000])[ok] - ref[ok]))
print(f"gate vs scipy: {gate:.3e}", flush=True)

# salted timing: advance the query set each call so axon can't reuse
n_chunks = 10
t0 = time.perf_counter()
for i in range(n_chunks):
    out = f(tri, resp_tri, Q + jnp.float32(i * 1e-9), cells)
jax.block_until_ready(out)
dt_s = time.perf_counter() - t0
print(
    f"queries_3d: {n_chunks * chunk / dt_s / 1e6:.2f} Mq/s "
    f"({dt_s:.2f}s for {n_chunks * chunk / 1e6:.0f}M)",
    flush=True,
)
