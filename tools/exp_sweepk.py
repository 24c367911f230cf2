"""Sweep dispatch-depth probe: k=1 vs k=8 per-round cost (same program).

If single-round dispatches are much cheaper per round, the while_loop
carry is paying per-iteration copies.
"""
import logging
import sys
import time

import numpy as np

logging.basicConfig(level=logging.INFO, stream=sys.stderr)

import jax
import jax.numpy as jnp

from gsl_scattered_interpolation_tpu.models import (
    device_delaunay as dd,
    host_tree as ht,
)

print(jax.devices(), flush=True)
N = 1_000_000
rng = np.random.default_rng(7)
sites = rng.uniform(-0.5, 0.5, size=(N, 2))

for name, opts in (
    ("warm", {}),
    ("k8-default", {}),
    ("k1-pinned", {"sweep_rounds": 1, "sweep_adaptive": False}),
    ("k2-pinned", {"sweep_rounds": 2, "sweep_adaptive": False}),
):
    t0 = time.perf_counter()
    tri, shuf = dd.triangulate(
        sites, flags=ht.NOSTANDARDIZE, dtype=jnp.float32,
        chunk_threshold=400_000, grid_res=512, build_opts=opts,
    )
    jax.block_until_ready(tri.tri_verts)
    print(f"== {name}: {time.perf_counter()-t0:.2f}s", flush=True)
