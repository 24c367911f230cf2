"""3D cavity sweep #3: seed fraction x (C, waves) at 10k sites."""
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

# (seed_frac_div, s_div, waves, C)
configs = [
    (4, 32, 2, 64),
    (2, 32, 2, 64),
    (2, 32, 2, 32),
]
for sdiv_seed, s_div, waves, C in configs:
    ts = []
    try:
        for rep in range(2):
            t0 = time.perf_counter()
            tri, shuf = dc.triangulate(
                sites, flags=ht.NOSTANDARDIZE, dtype=jnp.float32,
                seed_frac_div=sdiv_seed, s_div=s_div, waves=waves,
                cavity_cap=C,
            )
            jax.block_until_ready(tri.tri_verts)
            ts.append(time.perf_counter() - t0)
        print(
            f"seed=n/{sdiv_seed} s_div={s_div} waves={waves} C={C}: "
            f"first {ts[0]:.1f}s steady {ts[1]:.2f}s ntris={tri.n_tris}",
            flush=True,
        )
    except Exception as e:
        print(f"seed=n/{sdiv_seed} waves={waves} C={C}: FAILED {e!r}",
              flush=True)
