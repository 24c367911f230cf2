"""Query-throughput decomposition at 1M-site scale.

dev index (incomplete) vs host index (complete): fastpath-only vs full
fallback timing + nbad counts, 5M-query chunks.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from gsl_scattered_interpolation_tpu.models import (
    device_delaunay as dd,
    device_tri as dt,
    host_tree as ht,
)

print(jax.devices(), flush=True)
N = 1_000_000
rng = np.random.default_rng(7)
sites = rng.uniform(-0.5, 0.5, size=(N, 2))
tri, shuf = dd.triangulate(
    sites, flags=ht.NOSTANDARDIZE, dtype=jnp.float32,
    chunk_threshold=400_000, grid_res=512,
)
tri32 = tri.cast(jnp.float32)
t0 = time.perf_counter()
cells = dt.build_cell_index(tri32)
jax.block_until_ready(cells.table)
print(f"dev index {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
hostc = dt.build_cell_index(tri32, method="host")
jax.block_until_ready(hostc.table)
print(f"host index {time.perf_counter()-t0:.1f}s", flush=True)

chunk = 5_000_000
Q = jnp.asarray(rng.uniform(-0.45, 0.45, size=(chunk, 2)), jnp.float32)

fn = jax.jit(
    lambda t, qq, c: dt.locate_cells(t, c, qq, fallback="none")[2]
)
ff = jax.jit(lambda t, qq, c: dt.locate_cells(t, c, qq)[0])

for name, c in (("dev", cells), ("host", hostc)):
    ind = fn(tri32, Q, c)
    nmiss = int(jnp.sum(~ind))
    t0 = time.perf_counter()
    for i in range(4):
        out = fn(tri32, Q + jnp.float32(i * 1e-9), c)
    _ = int(out[0])
    t_nofb = time.perf_counter() - t0
    out = ff(tri32, Q, c)
    _ = int(out[0])
    t0 = time.perf_counter()
    for i in range(4):
        out = ff(tri32, Q + jnp.float32(i * 1e-9), c)
    _ = int(out[0])
    t_full = time.perf_counter() - t0
    print(
        f"{name}: miss {nmiss} ({nmiss/chunk:.2%}), "
        f"nofb {4*chunk/t_nofb/1e6:.1f} Mq/s, "
        f"full {4*chunk/t_full/1e6:.1f} Mq/s, "
        f"overflow cells {int(jnp.sum(c.overflow))}",
        flush=True,
    )
