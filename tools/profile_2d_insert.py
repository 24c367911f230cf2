"""Per-iteration timing of the 2D 1M insert phase (k_batch=1).

Same compiled program as production (k is a traced operand); each
dispatch runs ONE iteration (4 splits + flip sweep), so the log shows
where the insert phase's seconds go.

PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_2d_insert.py
"""

import logging
import time

import numpy as np
import jax
import jax.numpy as jnp

logging.basicConfig(level=logging.INFO)

from gsl_scattered_interpolation_tpu.utils import config

config.enable_compile_cache()
config.log.setLevel(logging.INFO)

from gsl_scattered_interpolation_tpu.models import (
    device_delaunay as dd, host_tree as ht,
)
from gsl_scattered_interpolation_tpu.ops import geometry
from gsl_scattered_interpolation_tpu.utils import machine

N = 1_000_000
rng = np.random.default_rng(7)
sites = rng.uniform(-0.5, 0.5, size=(N, 2))
jit_mag = 8.0 * machine.eps(jnp.float32)
prng = np.random.default_rng(12345)
sites_build = sites + jit_mag * prng.uniform(-1, 1, sites.shape)
n_pad = dd.bucket_size(N)
sp = np.zeros((n_pad, 2))
sp[:N] = sites_build
cage_raw = geometry.cage_vertices(2, np.zeros(2), np.ones(2), np.float32)

for rep in range(2):
    t0 = time.perf_counter()
    tri_v, tri_n, alive, _ = dd.build_2d_chunked(
        jnp.asarray(sp, jnp.float32),
        jnp.asarray(cage_raw, jnp.float32),
        n_real=N,
        k_batch=1,
    )
    jax.block_until_ready(tri_v)
    print(f"== chunked k_batch=1 rep{rep}: {time.perf_counter()-t0:.2f}s",
          flush=True)
