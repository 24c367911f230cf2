"""Bisect the while_loop slowdown: wrap round-body variants in the
production-style outer while_loop and measure marginal per-round cost."""
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
R_S = 262_144
RSITE = 1 << 20
DTYPE = jnp.float32

rng = np.random.default_rng(7)
sites = rng.uniform(-0.5, 0.5, size=(N, 2))
cage_raw = geometry.cage_vertices(2, np.zeros(2), np.ones(2), np.float32)
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

@functools.partial(jax.jit, static_argnums=(3, 4), donate_argnums=(1, 2))
def one_round(pts, st, dirty, R_s, rsite):
    for _ in range(2):
        st, dirty, _ = _split_round_compact(pts, st, dirty, R_s, rsite)
    tri_v, tri_n, cc, dirty, _, _, site_tri = _flip_sweep_compact(
        pts, st.tri_v, st.tri_n, st.cc, dirty, R, jnp.int32(2),
        site_tri=st.site_tri, r_site=rsite)
    return BuildState(tri_v, tri_n, cc, st.n_tris, site_tri, st.n_left), dirty

while int(st.n_left) > 600_000:
    st, dirty = one_round(pts, st, dirty, R_S, RSITE)
print(f"advanced: n_left={int(st.n_left)} n_tris={int(st.n_tris)}", flush=True)

# production-style outer while_loop wrapper (traced k)
@functools.partial(jax.jit, static_argnums=(4, 5), donate_argnums=(1, 2))
def k_rounds(pts, st, dirty, k, R_, rsite):
    def cond(c):
        st, dirty, it = c
        return (st.n_left > 0) & (it < k)
    def body(c):
        st, dirty, it = c
        R_s = max(min(R_ // 2, st.tri_v.shape[0] // 4), 1)
        for _ in range(2):
            st, dirty, _ = _split_round_compact(pts, st, dirty, R_s, rsite)
        tri_v, tri_n, cc, dirty, _, _, site_tri = _flip_sweep_compact(
            pts, st.tri_v, st.tri_n, st.cc, dirty, R_, jnp.int32(2),
            site_tri=st.site_tri, r_site=rsite)
        return (BuildState(tri_v, tri_n, cc, st.n_tris, site_tri,
                           st.n_left), dirty, it + 1)
    st, dirty, _ = jax.lax.while_loop(cond, body, (st, dirty, jnp.int32(0)))
    return st, dirty

def run(k, label):
    global st, dirty
    t0 = time.perf_counter()
    st, dirty = k_rounds(pts, st, dirty, jnp.int32(k), R, RSITE)
    jax.block_until_ready(st.site_tri)
    print(f"{label}: k={k} {time.perf_counter()-t0:.2f}s "
          f"n_left={int(st.n_left)}", flush=True)

run(1, "warmup/compile")
run(1, "loop k=1")
run(1, "loop k=1")
run(3, "loop k=3")
run(3, "loop k=3")
