"""Instrumented 3D cavity build at 10k sites (TPU): where does time go?"""

import os
import time

os.environ["GSI_TPU_VERBOSE"] = "1"

import numpy as np
import jax.numpy as jnp

from gsl_scattered_interpolation_tpu.models import device_cavity as dc, host_tree as ht
from gsl_scattered_interpolation_tpu.utils import config

config.env_setup()

N = 10_000
rng = np.random.default_rng(13)
sites = rng.uniform(-0.5, 0.5, size=(N, 3))
t0 = time.perf_counter()
tri, shuf = dc.triangulate(sites, flags=ht.NOSTANDARDIZE, dtype=jnp.float32)
print(f"total {time.perf_counter()-t0:.1f}s  T={tri.n_tris}", flush=True)
