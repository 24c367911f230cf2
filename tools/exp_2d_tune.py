"""2D 1M build tuning: tail floor + flip/split schedule variants."""
import time

import numpy as np
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

variants = [
    ("default", {}),
    ("tail64k", {"tail_floor": 65536}),
    ("fpr3", {"flips_per_round": 3}),
]
for name, opts in variants:
    ts = []
    for rep in range(3):
        t0 = time.perf_counter()
        tri, shuf = dd.triangulate(
            sites, flags=ht.NOSTANDARDIZE, dtype=jnp.float32,
            chunk_threshold=400_000, grid_res=512, build_opts=opts,
        )
        jax.block_until_ready(tri.tri_verts)
        ts.append(time.perf_counter() - t0)
    print(
        f"{name}: first {ts[0]:.1f}s steadies "
        f"{' '.join(f'{t:.2f}' for t in ts[1:])}",
        flush=True,
    )
