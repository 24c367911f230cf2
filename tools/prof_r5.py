"""Round-5 profile: bench-shaped 1M build + device cell index at scale.

Reproduces bench.py's build_1m config exactly (rng seed 7, f32,
chunk_threshold 400k, grid_res 512), with INFO phase logs, then times
the NEW device cell-index build + a 25M-query throughput sample.

PYTHONPATH=/root/repo:/root/.axon_site python tools/prof_r5.py
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

from gsl_scattered_interpolation_tpu.models import (
    device_delaunay as dd,
    device_tri as dt,
    host_tree as ht,
)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
rng = np.random.default_rng(7)
sites = rng.uniform(-0.5, 0.5, size=(N, 2))
values = np.sin(6 * sites[:, 0]) * np.cos(6 * sites[:, 1])

tri = None
for label in ("first", "steady", "steady2"):
    t0 = time.perf_counter()
    tri, shuf = dd.triangulate(
        sites,
        flags=ht.NOSTANDARDIZE,
        dtype=jnp.float32,
        chunk_threshold=400_000,
        grid_res=512,
    )
    jax.block_until_ready(tri.tri_verts)
    print(f"== {label}: {time.perf_counter() - t0:.2f}s", flush=True)

tri32 = tri.cast(jnp.float32)
for label in ("index#1", "index#2"):
    t0 = time.perf_counter()
    cells = dt.build_cell_index(tri32)
    jax.block_until_ready(cells.table)
    print(
        f"== {label}: {time.perf_counter() - t0:.2f}s "
        f"complete={cells.complete} G={cells.res} K={cells.k}",
        flush=True,
    )

resp = dt.response_for_build(shuf, values).astype(jnp.float32)
resp_tri = dt.vertex_responses(tri32, resp)
chunk = 5_000_000
f = jax.jit(
    lambda t, rt, q, c: dt.interp(
        t, None, q, method="cells", cells=c, resp_tri=rt
    )
)
Q = jnp.asarray(rng.uniform(-0.45, 0.45, size=(chunk, 2)), jnp.float32)
jax.block_until_ready(f(tri32, resp_tri, Q, cells))
t0 = time.perf_counter()
for i in range(5):
    out = f(tri32, resp_tri, Q + jnp.float32(i * 1e-9), cells)
jax.block_until_ready(out)
_ = float(out[0])
dt_s = time.perf_counter() - t0
print(f"== queries: {5*chunk/dt_s/1e6:.1f} Mq/s ({dt_s:.2f}s)", flush=True)

# value gate vs host index on a small sample
hostc = dt.build_cell_index(tri32, method="host")
o_h = np.asarray(f(tri32, resp_tri, Q[:200_000], hostc))
o_d = np.asarray(f(tri32, resp_tri, Q[:200_000], cells))
print(f"== gate dev-vs-host diff {np.max(np.abs(o_h - o_d)):.2e}", flush=True)
