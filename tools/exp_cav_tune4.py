"""3D cavity sweep #4: fractional seed + the 100k config."""
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
rng = np.random.default_rng(13)
sites = rng.uniform(-0.5, 0.5, size=(10_000, 3))

for sdiv in (1.5, 1.25):
    ts = []
    for rep in range(2):
        t0 = time.perf_counter()
        tri, shuf = dc.triangulate(
            sites, flags=ht.NOSTANDARDIZE, dtype=jnp.float32,
            seed_frac_div=sdiv, waves=2,
        )
        jax.block_until_ready(tri.tri_verts)
        ts.append(time.perf_counter() - t0)
    print(
        f"10k seed=n/{sdiv}: first {ts[0]:.1f}s steady {ts[1]:.2f}s",
        flush=True,
    )

# 100k with the n/2 seed (steady recorded, VERDICT r4 item 2)
rng3 = np.random.default_rng(17)
sites2 = rng3.uniform(-0.5, 0.5, size=(100_000, 3))
ts = []
for rep in range(2):
    t0 = time.perf_counter()
    tri2, shuf2 = dc.triangulate(
        sites2, flags=ht.NOSTANDARDIZE, dtype=jnp.float32,
        seed_frac_div=2, waves=2,
    )
    jax.block_until_ready(tri2.tri_verts)
    ts.append(time.perf_counter() - t0)
print(
    f"100k seed=n/2: first {ts[0]:.1f}s steady {ts[1]:.2f}s "
    f"ntets={tri2.n_tris}",
    flush=True,
)
