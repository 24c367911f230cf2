"""3D cavity sweep #2: probe C (cavity cap), waves, and smaller S."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from gsl_scattered_interpolation_tpu.models import (
    device_cavity as dc,
    host_tree as ht,
)

print(jax.devices(), flush=True)
n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
rng = np.random.default_rng(13)
sites = rng.uniform(-0.5, 0.5, size=(n, 3))

# (s_cap, s_div, waves, cavity_cap)
configs = [
    (512, 32, 1, 64),
    (512, 32, 2, 64),
    (512, 32, 4, 32),
    (512, 64, 4, 64),
    (1024, 16, 4, 64),
]
for s_cap, s_div, waves, C in configs:
    ts = []
    try:
        for rep in range(2):
            t0 = time.perf_counter()
            tri, shuf = dc.triangulate(
                sites, flags=ht.NOSTANDARDIZE, dtype=jnp.float32,
                s_cap=s_cap, s_div=s_div, waves=waves, cavity_cap=C,
            )
            jax.block_until_ready(tri.tri_verts)
            ts.append(time.perf_counter() - t0)
        print(
            f"s_cap={s_cap} s_div={s_div} waves={waves} C={C}: "
            f"first {ts[0]:.1f}s steady {ts[1]:.2f}s ntris={tri.n_tris}",
            flush=True,
        )
    except Exception as e:
        print(f"s_cap={s_cap} s_div={s_div} waves={waves} C={C}: "
              f"FAILED {e!r}", flush=True)
