"""Honest phase timing of the chunked-build round bodies at mid-bulge state.

Times each phase as its own jitted program on REAL build state (donated,
advancing each call so axon cannot reuse results).  Run on the TPU:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_build.py
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from gsl_scattered_interpolation_tpu.models.device_delaunay import (
    BuildState,
    _flip_sweep_compact,
    _init_state,
    _split_round_compact,
    bucket_size,
)
from gsl_scattered_interpolation_tpu.ops import geometry
from gsl_scattered_interpolation_tpu.models import host_tree as ht
from gsl_scattered_interpolation_tpu.utils import machine

N = 1_000_000
R = 524_288
R_S = 262_144
RSITE = 1 << 21
DTYPE = jnp.float32

rng = np.random.default_rng(7)
sites = rng.uniform(-0.5, 0.5, size=(N, 2))
d = 2
shift = np.zeros(d)
scale = np.ones(d)
cage_raw = geometry.cage_vertices(d, shift, scale, np.float32)
jit_mag = 8.0 * machine.eps(DTYPE)
prng = np.random.default_rng(12345)
sites_build = sites + jit_mag * prng.uniform(-1, 1, sites.shape)
n_pad = bucket_size(N)
sp = np.zeros((n_pad, 2)); sp[:N] = sites_build
cage_std = jnp.asarray(cage_raw, DTYPE)
full_m = 2 * n_pad + 3


@functools.partial(jax.jit, static_argnums=(2, 4))
def init_all(s, cage, Np, n_real, cap):
    p = jnp.concatenate([cage.astype(s.dtype), s])
    return p, _init_state(p, Np, n_real, cap=cap), jnp.zeros(cap, bool)


pts, st, dirty = init_all(jnp.asarray(sp, DTYPE), cage_std, n_pad,
                          jnp.int32(N), full_m)

# --- advance to mid-bulge with the production round body -------------------
@functools.partial(jax.jit, static_argnums=(3, 4), donate_argnums=(1, 2))
def one_round(pts, st, dirty, R_s, rsite):
    n_new = jnp.int32(0)
    for _ in range(2):
        st, dirty, n_i = _split_round_compact(pts, st, dirty, R_s, rsite)
        n_new += n_i
    tri_v, tri_n, cc, dirty, _, _, site_tri = _flip_sweep_compact(
        pts, st.tri_v, st.tri_n, st.cc, dirty, R, jnp.int32(2),
        site_tri=st.site_tri, r_site=rsite)
    return BuildState(tri_v, tri_n, cc, st.n_tris, site_tri, st.n_left), dirty

t0 = time.perf_counter()
while int(st.n_left) > 600_000:
    st, dirty = one_round(pts, st, dirty, R_S, RSITE)
    print(f"advance: n_left={int(st.n_left)} n_tris={int(st.n_tris)} "
          f"t={time.perf_counter()-t0:.1f}s", flush=True)

# --- timed phase variants ---------------------------------------------------
def timeit(name, fn, state, reps=4):
    # advance real state each call (salted); block once per call
    s = state
    fn(*s)  # compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*s)
        jax.block_until_ready(out[0] if isinstance(out, tuple) else out)
        ts.append(time.perf_counter() - t0)
    print(f"{name:34s} {min(ts)*1e3:8.1f} ms  (runs: "
          + " ".join(f"{t*1e3:.0f}" for t in ts) + ")", flush=True)

# NOTE: no donation here -- every timed call starts from the SAME state, but
# claims content differs per call? No: same state => same program+inputs can
# be result-reused by axon. Salt by bumping one pad site's coordinate.
saltv = jnp.zeros_like(pts)

def salted(f):
    # touch one never-claimed pad row so inputs differ per call
    i = [0]
    def g(pts_, *rest):
        i[0] += 1
        p2 = pts_.at[3 + N + 1, 0].add(1e-7 * i[0])
        return f(p2, *rest)
    return g

split_full = jax.jit(lambda p, s, d2: _split_round_compact(p, s, d2, R_S, RSITE))
flip_full = jax.jit(lambda p, s, d2: _flip_sweep_compact(
    p, s.tri_v, s.tri_n, s.cc, d2, R, jnp.int32(1),
    site_tri=s.site_tri, r_site=RSITE))
flip_norelo = jax.jit(lambda p, s, d2: _flip_sweep_compact(
    p, s.tri_v, s.tri_n, s.cc, d2, R, jnp.int32(1)))

timeit("split round (full)", salted(split_full), (pts, st, dirty))
timeit("flip round cap=1 (full)", salted(flip_full), (pts, st, dirty))
timeit("flip round cap=1 (no relocation)", salted(flip_norelo), (pts, st, dirty))
