"""What does the FIRST device sync of a process cost, and why?

Times: (1) backend init, (2) a tiny op's first readback, (3) an
init_all-sized program's first readback, (4) the same again.

PYTHONPATH=/root/repo:/root/.axon_site python tools/first_sync_probe.py [nocache]
"""

import sys
import time

import numpy as np

t_imp = time.perf_counter()
import jax
import jax.numpy as jnp

from gsl_scattered_interpolation_tpu.utils import config

if "nocache" not in sys.argv:
    config.enable_compile_cache()

print(f"import {time.perf_counter()-t_imp:.1f}s", flush=True)

t0 = time.perf_counter()
d = jax.devices()
print(f"devices {time.perf_counter()-t0:.1f}s: {d[0].platform}", flush=True)

t0 = time.perf_counter()
x = jnp.ones((128, 128), jnp.float32)
y = jnp.sum(x @ x)
print(f"tiny enqueue {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
v = float(y)
print(f"tiny first sync {time.perf_counter()-t0:.1f}s (v={v})", flush=True)

# medium: 1M-row arrays, a couple of scatters (init_all-ish)
t0 = time.perf_counter()
a = jnp.asarray(np.random.default_rng(0).uniform(size=(1_000_000, 2)),
                jnp.float32)
b = jnp.full((2_097_155, 3), -1, jnp.int32).at[0].set(
    jnp.arange(3, dtype=jnp.int32)
)
s = jnp.sum(b) + jnp.sum(a).astype(jnp.int32)
v = int(s)
print(f"medium first sync {time.perf_counter()-t0:.1f}s (v={v})", flush=True)

t0 = time.perf_counter()
s2 = jnp.sum(b * 2) + jnp.sum(a * 2).astype(jnp.int32)
v = int(s2)
print(f"medium second sync {time.perf_counter()-t0:.1f}s", flush=True)
