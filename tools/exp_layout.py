"""Isolate the dev-index query slowdown: fallback vs table layout.

Times locate_cells with fallback='none' for dev/host tables, then
re-times the dev table after forcing a canonical layout via an
explicit scatter copy.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from scipy.spatial import Delaunay as ScipyDelaunay

from gsl_scattered_interpolation_tpu.models import (
    device_tri as dt,
    geometry_extras as gx,
)

print(jax.devices(), flush=True)
rng = np.random.default_rng(0)
N = 300_000
sites = rng.uniform(-0.5, 0.5, size=(N, 2))
tri = gx.from_scipy_delaunay(ScipyDelaunay(sites), sites).cast(jnp.float32)
cells = dt.build_cell_index(tri)
hostc = dt.build_cell_index(tri, method="host")
q = jnp.asarray(rng.uniform(-0.45, 0.45, size=(1_000_000, 2)), jnp.float32)

f = jax.jit(
    lambda t, qq, c: dt.locate_cells(t, c, qq, fallback="none")[0]
)


def bench(name, c):
    out = f(tri, q, c)
    _ = int(out[0])
    t0 = time.perf_counter()
    for i in range(5):
        out = f(tri, q + jnp.float32(i * 1e-9), c)
    _ = int(out[0])
    dt_s = time.perf_counter() - t0
    print(f"{name}: {5*1_000_000/dt_s/1e6:.1f} Mq/s (nofb)", flush=True)


bench("dev ", cells)
bench("host", hostc)

# canonical-layout copy of the dev table: round-trip through a scatter
tbl = cells.table


@jax.jit
def canon(t):
    return jnp.zeros_like(t).at[:, :].set(t)


cells_c = cells._replace(table=canon(tbl))
jax.block_until_ready(cells_c.table)
bench("dev-canon", cells_c)

# same via host round-trip (definitely canonical)
cells_h = cells._replace(table=jnp.asarray(np.asarray(tbl)))
bench("dev-hostrt", cells_h)
