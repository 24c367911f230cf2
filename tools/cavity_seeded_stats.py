"""Per-round candidate-fate stats for the QHULL-SEEDED 3D cavity build
(CPU f64 backend; same _round structure as TPU).

Answers two tuning questions:
  1. bulk: what s_eff divisor maximizes winners/round?
  2. tail: what stops the last ~600 sites — overflow, ownership, manifold?

  python tools/cavity_seeded_stats.py [n] [cavity_cap] [div] [seed_frac_div]
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import functools
import time

import numpy as np
import jax.numpy as jnp

from gsl_scattered_interpolation_tpu.models import device_cavity as dc
from gsl_scattered_interpolation_tpu.ops import geometry
from gsl_scattered_interpolation_tpu.utils import machine

n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
C = int(sys.argv[2]) if len(sys.argv) > 2 else 32
DIV = int(sys.argv[3]) if len(sys.argv) > 3 else 16
SEED_DIV = int(sys.argv[4]) if len(sys.argv) > 4 else 4
S = 2048
d = 3

rng = np.random.default_rng(13)
sites = rng.uniform(-0.5, 0.5, size=(n, d))
# deterministic f64 jitter as in triangulate()
jit_mag = float(1 << 16) * machine.eps(jnp.float64)
prng = np.random.default_rng(12345)
sites = sites + jit_mag * prng.uniform(-1, 1, sites.shape)

shift = np.zeros(d)
scale = np.ones(d)
cage = geometry.cage_vertices(d, shift, scale, np.float64)
pts = jnp.asarray(np.concatenate([cage, sites]))
M = int(9.0 * n) + 64

# qhull seed: boundary shell + prefix fill (SHELL=1), or plain prefix
from scipy.spatial import Delaunay as SciDelaunay

m = min(n, max(2048, n // SEED_DIV))
if os.environ.get("SHELL_SEED") == "1":
    delta = float(os.environ.get("SHELL_DELTA", "0.75")) * n ** (-1.0 / d)
    dist = np.minimum(sites + 0.5, 0.5 - sites).min(axis=1)
    in_seed = dist < delta
    fill = np.nonzero(~in_seed)[0]
    need = max(0, m - int(in_seed.sum()))
    in_seed[fill[:need]] = True
    seed_ids = np.nonzero(in_seed)[0]
    print(f"shell seed: {int((dist < delta).sum())} shell + fill -> "
          f"{len(seed_ids)}")
else:
    seed_ids = np.arange(m)
    in_seed = np.zeros(n, bool)
    in_seed[:m] = True
rest_ids = np.nonzero(~in_seed)[0]
sd = SciDelaunay(np.concatenate([cage, sites[seed_ids]]))
# remap local point ids (0..d cage, d+1+i = seed_ids[i]) to global
# point ids (d+1+site_id); simplex ids are positional, no remap needed
lmap = np.concatenate([np.arange(d + 1), seed_ids + d + 1]).astype(np.int32)
tets0 = lmap[np.asarray(sd.simplices, np.int64)]
nbrs0 = np.asarray(sd.neighbors, np.int32)
loc = np.asarray(sd.find_simplex(sites[rest_ids]), np.int64)
miss = loc < 0
if miss.any():
    loc[miss] = sd.find_simplex(sites[rest_ids][miss], bruteforce=True)
site_tri0 = np.full(n, -1, np.int32)
site_tri0[rest_ids] = loc.astype(np.int32)
st = dc.init_state_seeded(
    pts, n, M, tets0, nbrs0, site_tri0, len(rest_ids)
)
print(f"seed m={len(seed_ids)} tets={tets0.shape[0]} left={len(rest_ids)} "
      f"div={DIV} C={C}", flush=True)


@functools.partial(jax.jit, static_argnums=(2, 3, 4), donate_argnums=(1,))
def round_stats(pts, st, S, C, div):
    # replicate _round but with the s_eff divisor as a static knob
    import gsl_scattered_interpolation_tpu.models.device_cavity as dcm
    return dcm._round(pts, st, S, C, want_stats=True, s_div=div)


n_left = n - m
t0 = time.perf_counter()
r = 0
while n_left > 0 and r < 400:
    st, n_w, stats = round_stats(pts, st, S, C, DIV)
    stats = np.asarray(stats)
    n_left = int(st.n_left)
    r += 1
    (cand, ov, face_ov, mani, own, win, sum_cav, sum_face) = stats
    if r <= 10 or r % 10 == 0 or n_left < 700:
        print(
            f"r{r:3d} left={n_left:5d} cand={cand:4d} win={win:4d} "
            f"ov={ov:4d} own={own:4d} mani={mani:3d} fov={face_ov:3d} "
            f"cav/c={sum_cav/max(cand,1):.1f}",
            flush=True,
        )
    if n_w == 0:
        print(f"STRANDED at round {r}, C={C} -> escalating")
        C *= 2
        if C > 1024:
            break
print(f"total rounds={r} time={time.perf_counter()-t0:.1f}s "
      f"(CPU; structure only)")
