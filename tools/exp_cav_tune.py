"""3D cavity knob sweep at 10k sites: (s_cap, s_div, waves) -> steady s.

Each config compiles its own k_rounds program once (cached thereafter);
steady = second build per config.
"""
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

configs = [
    (512, 32, 4),    # current default (baseline)
    (2048, 8, 4),
    (2048, 8, 6),
    (4096, 4, 6),
]
for s_cap, s_div, waves in configs:
    ts = []
    for rep in range(2):
        t0 = time.perf_counter()
        tri, shuf = dc.triangulate(
            sites, flags=ht.NOSTANDARDIZE, dtype=jnp.float32,
            s_cap=s_cap, s_div=s_div, waves=waves,
        )
        jax.block_until_ready(tri.tri_verts)
        ts.append(time.perf_counter() - t0)
    print(
        f"s_cap={s_cap} s_div={s_div} waves={waves}: "
        f"first {ts[0]:.1f}s steady {ts[1]:.2f}s ntris={tri.n_tris}",
        flush=True,
    )
