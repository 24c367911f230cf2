"""Headline-config experiment: pallas vs cells locate at 2k sites (TPU).

Salted timings (fresh offset operand per call) per the axon result-reuse
trap; prints per-method Mq/s at two batch sizes.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from gsl_scattered_interpolation_tpu.models import device_tri as dt, host_tree as ht

rng = np.random.default_rng(0)
n_sites = 2000
sites = rng.uniform(-0.5, 0.5, size=(n_sites, 2))
values = np.sin(6 * sites[:, 0]) * np.cos(6 * sites[:, 1])

tree = ht.build(sites, flags=ht.NOSTANDARDIZE)
tri = dt.freeze(tree, grid_res=128).cast(jnp.float32)
resp = dt.reindex_response(tree, values).astype(jnp.float32)
cells = dt.build_cell_index(tri)
resp_tri = dt.vertex_responses(tri, resp)
print(f"T={tri.n_tris} cell grid res={cells.res} K={cells.k}", flush=True)


def bench(method, B, n_reps=8):
    if method == "cells":
        f = jax.jit(
            lambda q, s, t, rt, c: dt.interp(
                t, None, q + s, method="cells", cells=c, resp_tri=rt
            )
        )
        args = (tri, resp_tri, cells)
    else:
        f = jax.jit(
            lambda q, s, t, r: dt.interp(t, r, q + s, method=method)
        )
        args = (tri, resp)
    Q = jnp.asarray(rng.uniform(-0.45, 0.45, size=(B, 2)), jnp.float32)
    out0 = f(Q, jnp.float32(0.0), *args)
    jax.block_until_ready(out0)
    # Cross-method agreement gate (advisor finding): a broken path must
    # not report a plausible throughput number.  Both methods locate
    # exactly, so interpolated values agree to f32 weight noise.
    ref = np.asarray(
        dt.interp(tri, resp, Q[:100_000], method="dense")
    )
    diff = float(np.max(np.abs(np.asarray(out0[:100_000]) - ref)))
    assert diff < 1e-3, f"{method} disagrees with dense locate: {diff}"
    t0 = time.perf_counter()
    outs = []
    for i in range(n_reps):
        outs.append(f(Q, jnp.float32(1e-6 * (i + 1)), *args))
    jax.block_until_ready(outs[-1])
    dt_s = time.perf_counter() - t0
    print(
        f"{method:7s} B={B:>8d}: {n_reps*B/dt_s/1e6:8.1f} Mq/s "
        f"({dt_s:.3f}s/{n_reps})",
        flush=True,
    )


for B in (1_000_000, 4_000_000):
    for method in ("pallas", "cells"):
        bench(method, B)
