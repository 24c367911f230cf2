"""Diagnose queries_3d: dev vs host 3D index miss volume + throughput."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from gsl_scattered_interpolation_tpu.models import (
    device_cavity as dc,
    device_tri as dt,
    host_tree as ht,
)

print(jax.devices(), flush=True)
N = 10_000
rng = np.random.default_rng(13)
sites = rng.uniform(-0.5, 0.5, size=(N, 3))
tri, shuf = dc.triangulate(sites, flags=ht.NOSTANDARDIZE, dtype=jnp.float32)
tri32 = tri.cast(jnp.float32)
print(f"T={tri32.n_tris}", flush=True)

devc = dt.build_cell_index(tri32)
hostc = dt.build_cell_index(tri32, method="host")
print(
    f"dev G={devc.res} K={devc.k} complete={devc.complete} "
    f"packed={devc.rows is None} | host G={hostc.res} K={hostc.k}",
    flush=True,
)
B = 2_000_000
Q = jnp.asarray(rng.uniform(-0.45, 0.45, size=(B, 3)), jnp.float32)
fn = jax.jit(lambda t, qq, c: dt.locate_cells(t, c, qq, fallback="none")[2])
ff = jax.jit(lambda t, qq, c: dt.locate_cells(t, c, qq)[0])
for name, c in (("dev ", devc), ("host", hostc)):
    ind = fn(tri32, Q, c)
    nmiss = int(jnp.sum(~ind))
    ovf = int(jnp.sum(c.overflow))
    t0 = time.perf_counter()
    for i in range(3):
        out = fn(tri32, Q + jnp.float32(i * 1e-9), c)
    _ = int(out[0])
    t_nofb = time.perf_counter() - t0
    out = ff(tri32, Q, c)
    _ = int(out[0])
    t0 = time.perf_counter()
    for i in range(3):
        out = ff(tri32, Q + jnp.float32(i * 1e-9), c)
    _ = int(out[0])
    t_full = time.perf_counter() - t0
    print(
        f"{name}: miss {nmiss} ({nmiss/B:.2%}) ovf-cells {ovf} "
        f"nofb {3*B/t_nofb/1e6:.1f} full {3*B/t_full/1e6:.1f} Mq/s",
        flush=True,
    )
