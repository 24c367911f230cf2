"""Bisect: verbatim production k_rounds (progress carry) vs the bare loop."""
import functools, time
import numpy as np
import jax
import jax.numpy as jnp

from gsl_scattered_interpolation_tpu.models.device_delaunay import (
    BuildState, _flip_sweep_compact, _init_state, _split_round_compact,
    bucket_size,
)
from gsl_scattered_interpolation_tpu.ops import geometry
from gsl_scattered_interpolation_tpu.utils import machine

N = 1_000_000
R = 524_288
RSITE = 1 << 20
DTYPE = jnp.float32
rng = np.random.default_rng(7)
sites = rng.uniform(-0.5, 0.5, size=(N, 2))
cage_raw = geometry.cage_vertices(2, np.zeros(2), np.ones(2), np.float32)
prng = np.random.default_rng(12345)
sites_build = sites + 8.0 * machine.eps(DTYPE) * prng.uniform(-1, 1, sites.shape)
n_pad = bucket_size(N)
sp = np.zeros((n_pad, 2)); sp[:N] = sites_build
full_m = 2 * n_pad + 3

@functools.partial(jax.jit, static_argnums=(2, 4))
def init_all(s, cage, Np, n_real, cap):
    p = jnp.concatenate([cage.astype(s.dtype), s])
    return p, _init_state(p, Np, n_real, cap=cap), jnp.zeros(cap, bool)

@functools.partial(jax.jit, static_argnums=(3, 4), donate_argnums=(1, 2))
def one_round(pts, st, dirty, R_, rsite):
    R_s = max(min(R_ // 2, st.tri_v.shape[0] // 4), 1)
    for _ in range(2):
        st, dirty, _ = _split_round_compact(pts, st, dirty, R_s, rsite)
    tri_v, tri_n, cc, dirty, _, _, site_tri = _flip_sweep_compact(
        pts, st.tri_v, st.tri_n, st.cc, dirty, R_, jnp.int32(2),
        site_tri=st.site_tri, r_site=rsite)
    return BuildState(tri_v, tri_n, cc, st.n_tris, site_tri, st.n_left), dirty

def fresh_bulge():
    pts, st, dirty = init_all(jnp.asarray(sp, DTYPE),
                              jnp.asarray(cage_raw, DTYPE),
                              n_pad, jnp.int32(N), full_m)
    while int(st.n_left) > 976_193:
        st, dirty = one_round(pts, st, dirty, 32768, RSITE)
    return pts, st, dirty

# V1: verbatim production body (progress carry + n_new sum)
@functools.partial(jax.jit, static_argnums=(4, 5), donate_argnums=(1, 2))
def k_rounds_prod(pts, st, dirty, k, R_, rsite):
    M = st.tri_v.shape[0]
    def cond(c):
        st, dirty, it, progress = c
        return (st.n_left > 0) & (it < k) & progress
    def body(c):
        st, dirty, it, _progress = c
        R_s = max(min(R_ // 2, M // 4), 1)
        n_new = jnp.int32(0)
        for _ in range(2):
            st, dirty, n_new_i = _split_round_compact(pts, st, dirty, R_s, rsite)
            n_new = n_new + n_new_i
        tri_v, tri_n, cc, dirty, _, _, site_tri = _flip_sweep_compact(
            pts, st.tri_v, st.tri_n, st.cc, dirty, R_, jnp.int32(2),
            site_tri=st.site_tri, r_site=rsite)
        st = BuildState(tri_v, tri_n, cc, st.n_tris, site_tri, st.n_left)
        return st, dirty, it + 1, n_new > 0
    st, dirty, _, _ = jax.lax.while_loop(cond, body, (st, dirty, jnp.int32(0), True))
    return st, dirty

# V2: bare loop (no progress carry)
@functools.partial(jax.jit, static_argnums=(4, 5), donate_argnums=(1, 2))
def k_rounds_bare(pts, st, dirty, k, R_, rsite):
    M = st.tri_v.shape[0]
    def cond(c):
        st, dirty, it = c
        return (st.n_left > 0) & (it < k)
    def body(c):
        st, dirty, it = c
        R_s = max(min(R_ // 2, M // 4), 1)
        for _ in range(2):
            st, dirty, _ = _split_round_compact(pts, st, dirty, R_s, rsite)
        tri_v, tri_n, cc, dirty, _, _, site_tri = _flip_sweep_compact(
            pts, st.tri_v, st.tri_n, st.cc, dirty, R_, jnp.int32(2),
            site_tri=st.site_tri, r_site=rsite)
        st = BuildState(tri_v, tri_n, cc, st.n_tris, site_tri, st.n_left)
        return st, dirty, it + 1
    st, dirty, _ = jax.lax.while_loop(cond, body, (st, dirty, jnp.int32(0)))
    return st, dirty

for name, fn in (("prod", k_rounds_prod), ("bare", k_rounds_bare)):
    pts, st, dirty = fresh_bulge()
    t0 = time.perf_counter()
    st, dirty = fn(pts, st, dirty, jnp.int32(1), R, RSITE)
    jax.block_until_ready(st.site_tri)
    print(f"{name} k=1 (compile+run) {time.perf_counter()-t0:.2f}s "
          f"n_left={int(st.n_left)}", flush=True)
    t0 = time.perf_counter()
    st, dirty = fn(pts, st, dirty, jnp.int32(4), R, RSITE)
    jax.block_until_ready(st.site_tri)
    print(f"{name} k=4 {time.perf_counter()-t0:.2f}s n_left={int(st.n_left)}",
          flush=True)
