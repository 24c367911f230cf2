"""Per-round wall times over the FULL production trajectory (k=1 dispatches)."""
import functools, math, time
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

pts, st, dirty = init_all(jnp.asarray(sp, DTYPE), jnp.asarray(cage_raw, DTYPE),
                          n_pad, jnp.int32(N), full_m)

@functools.partial(jax.jit, static_argnums=(3, 4), donate_argnums=(1, 2))
def one_round(pts, st, dirty, R_, rsite):
    R_s = max(min(R_ // 2, st.tri_v.shape[0] // 4), 1)
    for _ in range(2):
        st, dirty, _ = _split_round_compact(pts, st, dirty, R_s, rsite)
    tri_v, tri_n, cc, dirty, _, _, site_tri = _flip_sweep_compact(
        pts, st.tri_v, st.tri_n, st.cc, dirty, R_, jnp.int32(2),
        site_tri=st.site_tri, r_site=rsite)
    return BuildState(tri_v, tri_n, cc, st.n_tris, site_tri, st.n_left), dirty

r_compact, r_tail, r_site = 524288, 262144, 262144
rnd = 0
t_all = time.perf_counter()
while int(st.n_left) > 0:
    n_left = int(st.n_left)
    n_tris = 1 + 2 * (N - n_left)
    small = max(r_tail // 8, 4096)
    target = min(n_left, n_tris)
    r_round = min(small if target <= small else r_compact, full_m)
    rsite = 1 << 16 if n_left <= (1 << 16) else min(
        max(r_site, 1 << (max(n_left - 1, 1)).bit_length()), 1 << 21)
    t0 = time.perf_counter()
    st, dirty = one_round(pts, st, dirty, r_round, rsite)
    nl = int(st.n_left)
    rnd += 1
    print(f"round {rnd:3d} R={r_round} rs={rsite} {time.perf_counter()-t0:6.2f}s"
          f"  n_left {n_left}->{nl}", flush=True)
print(f"total {time.perf_counter()-t_all:.1f}s over {rnd} rounds", flush=True)
