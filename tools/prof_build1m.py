"""Profile the 1M-site 2D build: phase breakdown at INFO logging.

Runs triangulate twice (first + steady-state) with the build's own
per-dispatch logs visible, and wraps the major phases (build_2d_chunked
vs from_arrays/freeze) with timers.

PYTHONPATH=/root/repo python tools/prof_build1m.py [N]
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

from gsl_scattered_interpolation_tpu.utils import config

config.enable_compile_cache()

from gsl_scattered_interpolation_tpu.models import (
    device_delaunay as dd,
    host_tree as ht,
)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
rng = np.random.default_rng(7)
sites = rng.uniform(-0.5, 0.5, size=(N, 2))

for label in ("first", "steady"):
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
