"""Drive the device cell-index build on the real chip (verify flow).

Qhull-imports a 300k-site triangulation (~600k tris -> device path),
builds the index on device, times it (steady = second build, salted),
and gates exactness against the dense... walk locate on a 200k-query
sample plus interp agreement.
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
vals = np.sin(6 * sites[:, 0]) * np.cos(6 * sites[:, 1])
t0 = time.perf_counter()
sd = ScipyDelaunay(sites)
tri = gx.from_scipy_delaunay(sd, sites).cast(jnp.float32)
print(f"import+freeze {time.perf_counter()-t0:.1f}s T={tri.n_tris}",
      flush=True)

t0 = time.perf_counter()
cells = dt.build_cell_index(tri)  # auto -> device
print(
    f"device index build #1 {time.perf_counter()-t0:.1f}s "
    f"complete={cells.complete} res={cells.res} k={cells.k}", flush=True
)
t0 = time.perf_counter()
cells = dt.build_cell_index(tri)
print(f"device index build #2 {time.perf_counter()-t0:.1f}s", flush=True)

t0 = time.perf_counter()
hostc = dt.build_cell_index(tri, method="host")
print(f"host index build {time.perf_counter()-t0:.1f}s", flush=True)

q = jnp.asarray(rng.uniform(-0.45, 0.45, size=(200_000, 2)), jnp.float32)
resp = jnp.concatenate(
    [jnp.zeros(3, jnp.float32), jnp.asarray(vals, jnp.float32)]
)
resp_tri = dt.vertex_responses(tri, resp)
f = jax.jit(
    lambda t, rt, qq, c: dt.interp(
        t, None, qq, method="cells", cells=c, resp_tri=rt
    )
)
out_d = np.asarray(f(tri, resp_tri, q, cells))
out_h = np.asarray(f(tri, resp_tri, q, hostc))
diff = np.max(np.abs(out_d - out_h))
print(f"device vs host interp diff {diff:.2e}", flush=True)
assert diff < 1e-5, diff

# fast-path hit rate (diagnoses fallback-volume slowdowns)
for name, c in (("dev", cells), ("host", hostc)):
    _, _, ind = dt.locate_cells(tri, c, q, fallback="none")
    print(f"{name} fastpath in_domain {float(ind.mean()):.5f}", flush=True)

# throughput with each index (salted)
for name, c in (("dev", cells), ("host", hostc)):
    jax.block_until_ready(f(tri, resp_tri, q, c))
    t0 = time.perf_counter()
    for i in range(5):
        out = f(tri, resp_tri, q + jnp.float32(i * 1e-9), c)
    jax.block_until_ready(out)
    # force a true sync with a readback
    _ = float(out[0])
    dt_s = time.perf_counter() - t0
    print(f"{name} index: {5*200_000/dt_s/1e6:.1f} Mq/s", flush=True)
print("OK", flush=True)
