"""Phase-time LocalKriging fit at 100k sites (bench config)."""
import time

import numpy as np
import jax
import jax.numpy as jnp

print(jax.devices(), flush=True)

from gsl_scattered_interpolation_tpu.models import kriging, rbf_compact

N = 100_000
rng = np.random.default_rng(23)
x = rng.uniform(0.0, 10.0, size=(N, 2))
noise_sd = 0.05
f_true = np.sin(x[:, 0] * 0.8) + 0.5 * np.cos(x[:, 1] * 1.1)
f = f_true + noise_sd * rng.standard_normal(N)

t0 = time.perf_counter()
m = kriging.LocalKriging(x, f, k_neighbors=24, dtype=jnp.float32)
print(f"total fit #1: {time.perf_counter()-t0:.2f}s", flush=True)
t0 = time.perf_counter()
m = kriging.LocalKriging(x + 1e-9, f, k_neighbors=24, dtype=jnp.float32)
print(f"total fit #2: {time.perf_counter()-t0:.2f}s", flush=True)

# phase replication
sites = np.asarray(x, np.float64)
lo, hi = sites.min(0), sites.max(0)
shift = (lo + hi) / 2.0
scale = 1.0 / (hi - lo)
xs_std = scale * (sites - shift)
t0 = time.perf_counter()
c, g, w = kriging.empirical_variogram(jnp.asarray(xs_std), jnp.asarray(f))
vg = kriging.fit_variogram(c, g, w)
print(f"variogram: {time.perf_counter()-t0:.2f}s {vg}", flush=True)
t0 = time.perf_counter()
rho = float((4.0 / N) ** 0.5)
grid = rbf_compact.build_cell_grid(xs_std, rho)
print(f"cell grid: {time.perf_counter()-t0:.2f}s cap={grid.xs_pad.shape}",
      flush=True)
t0 = time.perf_counter()
grid2 = grid._replace(xs_pad=grid.xs_pad.astype(jnp.float32))
v_pad = rbf_compact.pack_values(grid2, jnp.asarray(f, jnp.float32))
jax.block_until_ready(v_pad)
print(f"pack values: {time.perf_counter()-t0:.2f}s", flush=True)
