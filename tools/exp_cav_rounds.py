"""3D cavity build round-rate curve: n_left + time per k_batch dispatch."""
import logging
import sys
import time

import numpy as np

logging.basicConfig(level=logging.INFO)

import jax
import jax.numpy as jnp

from gsl_scattered_interpolation_tpu.models import device_cavity as dc
from gsl_scattered_interpolation_tpu.models import host_tree as ht

print(jax.devices(), flush=True)
n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
kb = int(sys.argv[2]) if len(sys.argv) > 2 else 8
rng = np.random.default_rng(13)
sites = rng.uniform(-0.5, 0.5, size=(n, 3))

import gsl_scattered_interpolation_tpu.models.device_cavity as dcm

_orig_build = dcm.build


def build_logged(*a, **k):
    k["k_batch"] = kb
    return _orig_build(*a, **k)


dcm.build = build_logged

# per-dispatch timing: wrap _aot's returned callable? simpler: patch
# build()'s loop via monkey log already prints per-dispatch rounds
for rep in range(2):
    t0 = time.perf_counter()
    tri, shuf = dc.triangulate(
        sites, flags=ht.NOSTANDARDIZE, dtype=jnp.float32
    )
    jax.block_until_ready(tri.tri_verts)
    print(f"== rep{rep}: {time.perf_counter()-t0:.2f}s", flush=True)
