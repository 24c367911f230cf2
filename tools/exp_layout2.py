"""Part 2: full locate_cells (fallback on) across index variants."""
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

f = jax.jit(lambda t, qq, c: dt.locate_cells(t, c, qq)[0])


@jax.jit
def canon(t):
    return jnp.zeros_like(t).at[:, :].set(t)


def bench(name, c):
    out = f(tri, q, c)
    _ = int(out[0])
    t0 = time.perf_counter()
    for i in range(5):
        out = f(tri, q + jnp.float32(i * 1e-9), c)
    _ = int(out[0])
    dt_s = time.perf_counter() - t0
    print(f"{name}: {5*1_000_000/dt_s/1e6:.1f} Mq/s (full)", flush=True)


cells_canon = cells._replace(table=canon(cells.table))
jax.block_until_ready(cells_canon.table)
cells_ct = cells_canon._replace(complete=True)
bench("dev          ", cells)
bench("dev-canon    ", cells_canon)
bench("dev-canon+cmp", cells_ct)
bench("host         ", hostc)
# and hint quality: hostc hints into dev
bench("dev-hosthint ", cells_canon._replace(hint=hostc.hint))
