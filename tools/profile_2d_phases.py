"""Salted per-phase timings of the 1M 2D build at the bulge state (TPU).

Measures, with real state advancing between calls (no result reuse):
  * split round (R_s = 262144)
  * flip sweep round (R = 524288), insert-phase (with relocation)
  * flip sweep round, cleanup-phase (no relocation)
  * device freeze

PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_2d_phases.py
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from gsl_scattered_interpolation_tpu.utils import config

config.enable_compile_cache()

from gsl_scattered_interpolation_tpu.models.device_delaunay import (
    BuildState, _flip_sweep_compact, _init_state, _split_round_compact,
    bucket_size,
)
from gsl_scattered_interpolation_tpu.ops import geometry
from gsl_scattered_interpolation_tpu.utils import machine

N = 1_000_000
R = 524_288
R_S = 262_144
RSITE = 1 << 21
DTYPE = jnp.float32

rng = np.random.default_rng(7)
sites = rng.uniform(-0.5, 0.5, size=(N, 2))
cage_raw = geometry.cage_vertices(2, np.zeros(2), np.ones(2), np.float32)
jit_mag = 8.0 * machine.eps(DTYPE)
prng = np.random.default_rng(12345)
sites_build = sites + jit_mag * prng.uniform(-1, 1, sites.shape)
n_pad = bucket_size(N)
sp = np.zeros((n_pad, 2))
sp[:N] = sites_build
full_m = 2 * n_pad + 3


@functools.partial(jax.jit, static_argnums=(2, 4))
def init_all(s, cage, Np, n_real, cap):
    p = jnp.concatenate([cage.astype(s.dtype), s])
    return p, _init_state(p, Np, n_real, cap=cap), jnp.zeros(cap, bool)


@functools.partial(jax.jit, static_argnums=(3, 4), donate_argnums=(1, 2))
def split_only(pts, st, dirty, R_s, rsite):
    st, dirty, n_new = _split_round_compact(pts, st, dirty, R_s, rsite)
    return st, dirty, n_new


@functools.partial(jax.jit, static_argnums=(3, 4), donate_argnums=(1, 2))
def sweep1_reloc(pts, st, dirty, R_, rsite):
    tri_v, tri_n, cc, dirty, used, nd, site_tri, _nf, _nc = _flip_sweep_compact(
        pts, st.tri_v, st.tri_n, st.cc, dirty, R_, jnp.int32(1),
        site_tri=st.site_tri, r_site=rsite,
    )
    return (
        BuildState(tri_v, tri_n, cc, st.n_tris, site_tri, st.n_left),
        dirty, nd,
    )


@functools.partial(jax.jit, static_argnums=(3,), donate_argnums=(1, 2))
def sweep1_clean(pts, st, dirty, R_):
    tri_v, tri_n, cc, dirty, used, nd, _, _nf, _nc = _flip_sweep_compact(
        pts, st.tri_v, st.tri_n, st.cc, dirty, R_, jnp.int32(1),
    )
    return (
        BuildState(tri_v, tri_n, cc, st.n_tris, st.site_tri, st.n_left),
        dirty, nd,
    )


pts, st, dirty = init_all(
    jnp.asarray(sp, DTYPE), jnp.asarray(cage_raw, DTYPE), n_pad,
    jnp.int32(N), full_m,
)

# ramp to the bulge: alternate 1 split + 1 sweep until ~40% inserted
t0 = time.perf_counter()
rounds = 0
while int(st.n_left) > 600_000:
    st, dirty, n_new = split_only(pts, st, dirty, R_S, RSITE)
    st, dirty, nd = sweep1_reloc(pts, st, dirty, R, RSITE)
    rounds += 1
print(f"bulge after {rounds} rounds: left={int(st.n_left)} "
      f"tris={int(st.n_tris)} dirty={int(nd)} "
      f"({time.perf_counter()-t0:.1f}s incl compile)", flush=True)

# -- salted measurements (state advances every call) -----------------------
for name, n_rep in (("split", 6), ("sweep_reloc", 6)):
    t0 = time.perf_counter()
    for _ in range(n_rep):
        if name == "split":
            st, dirty, n_new = split_only(pts, st, dirty, R_S, RSITE)
        else:
            st, dirty, nd = sweep1_reloc(pts, st, dirty, R, RSITE)
    jax.block_until_ready(st.site_tri)
    print(f"{name}: {(time.perf_counter()-t0)/n_rep*1e3:.0f} ms/round",
          flush=True)

# finish inserting, then time cleanup sweeps
while int(st.n_left) > 0:
    st, dirty, _ = split_only(pts, st, dirty, R_S, RSITE)
    st, dirty, nd = sweep1_reloc(pts, st, dirty, R, RSITE)
print(f"inserted all; dirty={int(nd)}", flush=True)

t0 = time.perf_counter()
n_rep = 6
for _ in range(n_rep):
    st, dirty, nd = sweep1_clean(pts, st, dirty, R)
jax.block_until_ready(st.tri_v)
print(f"sweep_clean: {(time.perf_counter()-t0)/n_rep*1e3:.0f} ms/round "
      f"(dirty now {int(nd)})", flush=True)

# freeze timing
from gsl_scattered_interpolation_tpu.models import device_tri as dt

alive = st.tri_v[:, 0] >= 0
t0 = time.perf_counter()
raw = np.zeros((n_pad + 3, 2))
raw[:3] = cage_raw
raw[3:] = sp
tri = dt.from_arrays(
    raw, np.zeros(2), np.ones(2), st.tri_v, st.tri_n, alive, grid_res=512
)
jax.block_until_ready(tri.affine)
print(f"freeze(first): {time.perf_counter()-t0:.2f}s", flush=True)
t0 = time.perf_counter()
tri = dt.from_arrays(
    raw, np.zeros(2), np.ones(2), st.tri_v, st.tri_n, alive, grid_res=512
)
jax.block_until_ready(tri.affine)
print(f"freeze(steady): {time.perf_counter()-t0:.2f}s", flush=True)
