"""Sequential 1M 2D build experiments in ONE process (one lottery).

Usage:  PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_build_seq.py \
            "splits,flips[,sweep_rf_div]" ...

Each spec runs twice (first pays compiles; second is steady).
"""

import logging
import sys
import time

import numpy as np

logging.basicConfig(level=logging.INFO)

import jax
import jax.numpy as jnp

from gsl_scattered_interpolation_tpu.utils import config

config.enable_compile_cache()
config.log.setLevel(logging.INFO)

from gsl_scattered_interpolation_tpu.models import device_delaunay as dd
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
sp_dev = jnp.asarray(sp, jnp.float32)
cage_dev = jnp.asarray(cage_raw, jnp.float32)

for spec in sys.argv[1:]:
    v = [int(x) for x in spec.split(",")]
    splits, flips = v[0], v[1]
    rf = v[2] if len(v) > 2 else 4
    for rep in range(2):
        t0 = time.perf_counter()
        tri_v, tri_n, alive, _ = dd.build_2d_chunked(
            sp_dev, cage_dev, n_real=N,
            splits_per_round=splits, flips_per_round=flips,
            sweep_rf_div=rf,
        )
        jax.block_until_ready(tri_v)
        n_alive = int(jnp.sum(alive))
        print(
            f"== build s={splits} f={flips} rf={rf} rep{rep}: "
            f"{time.perf_counter()-t0:.2f}s alive={n_alive}",
            flush=True,
        )
