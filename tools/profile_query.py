"""Phase timing for the at-scale query path (config 2): 1M-site tri."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from gsl_scattered_interpolation_tpu.models import (
    device_delaunay as dd, device_tri as dt, host_tree as ht,
)
from gsl_scattered_interpolation_tpu.ops import geometry

N = 1_000_000
rng = np.random.default_rng(7)
sites = rng.uniform(-0.5, 0.5, size=(N, 2))
values = np.sin(6 * sites[:, 0]) * np.cos(6 * sites[:, 1])

t0 = time.perf_counter()
tri, shuf = dd.triangulate(sites, flags=ht.NOSTANDARDIZE, dtype=jnp.float32,
                           chunk_threshold=400_000, grid_res=512)
print(f"build {time.perf_counter()-t0:.1f}s", flush=True)
resp = dt.response_for_build(shuf, values).astype(jnp.float32)
t0 = time.perf_counter()
cells = dt.build_cell_index(tri.cast(jnp.float32))
print(f"cell index {time.perf_counter()-t0:.1f}s  G={cells.res} K={cells.k} "
      f"overflow={float(jnp.mean(cells.overflow.astype(jnp.float32))):.4f}",
      flush=True)
tri32 = tri.cast(jnp.float32)

B = 5_000_000
Q = jnp.asarray(rng.uniform(-0.45, 0.45, size=(B, 2)), jnp.float32)
salt = [0]

def timeit(name, fn, reps=4):
    fn(Q)
    ts = []
    for _ in range(reps):
        salt[0] += 1
        q = Q.at[0, 0].add(1e-9 * salt[0])
        t0 = time.perf_counter()
        out = fn(q)
        jax.block_until_ready(out[0] if isinstance(out, tuple) else out)
        ts.append(time.perf_counter() - t0)
    mq = B / min(ts) / 1e6
    print(f"{name:34s} {min(ts)*1e3:8.1f} ms  {mq:6.1f} Mq/s  (" +
          " ".join(f"{t*1e3:.0f}" for t in ts) + ")", flush=True)

# big arrays must ride as jit ARGUMENTS (axon remote-compile 413)
G, K = cells.res, cells.k
@jax.jit
def _gather_only(tbl, sh, sc, q):
    q_std = geometry.standardize(q, sh, sc)
    cell = jnp.clip(jnp.floor((q_std + 0.5) * G).astype(jnp.int32), 0, G - 1)
    cid = cell[:, 0] * G + cell[:, 1]
    return jnp.sum(tbl[cid], axis=-1)

gather_only = lambda q: _gather_only(cells.table, tri32.shift, tri32.scale, q)
_ln = jax.jit(lambda t, c, q: dt.locate_cells(t, c, q, fallback="none"))
loc_none = lambda q: _ln(tri32, cells, q)
_lf = jax.jit(lambda t, c, q: dt.locate_cells(t, c, q))
loc_full = lambda q: _lf(tri32, cells, q)
_fi = jax.jit(lambda t, r, q, c: dt.interp(t, r, q, method="cells", cells=c))
f_int = lambda q: _fi(tri32, resp, Q if q is None else q, cells)
# 5. walk only (for reference, smaller B)
timeit("table gather only", gather_only)
timeit("locate_cells fallback=none", loc_none)
timeit("locate_cells full", loc_full)
timeit("interp cells", f_int)

# how many fallbacks actually trigger?
q = Q
q_std = geometry.standardize(q, tri32.shift, tri32.scale)
cell = jnp.clip(jnp.floor((q_std + 0.5) * G).astype(jnp.int32), 0, G - 1)
cid = cell[:, 0] * G + cell[:, 1]
leaf, w, in_dom = loc_none(q)
print("fallback-eligible frac:",
      float(jnp.mean((~in_dom | cells.overflow[cid]).astype(jnp.float32))),
      flush=True)
