"""Where does the per-jit-instance overhead go? trace/lower vs compile(cache
hit) vs first execution, for the production k_rounds shape."""
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
n_pad = bucket_size(N)
full_m = 2 * n_pad + 3
rng = np.random.default_rng(7)
sites = rng.uniform(-0.5, 0.5, size=(N, 2))
cage_raw = geometry.cage_vertices(2, np.zeros(2), np.ones(2), np.float32)
sp = np.zeros((n_pad, 2)); sp[:N] = sites

@functools.partial(jax.jit, static_argnums=(2, 4))
def init_all(s, cage, Np, n_real, cap):
    p = jnp.concatenate([cage.astype(s.dtype), s])
    return p, _init_state(p, Np, n_real, cap=cap), jnp.zeros(cap, bool)

t0 = time.perf_counter()
pts, st, dirty = init_all(jnp.asarray(sp, DTYPE), jnp.asarray(cage_raw, DTYPE),
                          n_pad, jnp.int32(N), full_m)
jax.block_until_ready(st.site_tri)
print(f"init_all total {time.perf_counter()-t0:.2f}s", flush=True)

def make_k_rounds():
    # fresh instance each call, like build_2d_chunked does
    @functools.partial(jax.jit, static_argnums=(4, 5), donate_argnums=(1, 2))
    def k_rounds(pts, st, dirty, k, R_, rsite):
        M = st.tri_v.shape[0]
        def cond(c):
            st, dirty, it, progress = c
            return (st.n_left > 0) & (it < k) & progress
        def body(c):
            st, dirty, it, _progress = c
            R_s = max(min(R_ // 2, M // 4), 1)
            n_new = jnp.int32(0)
            for _ in range(2):
                st, dirty, n_i = _split_round_compact(pts, st, dirty, R_s, rsite)
                n_new = n_new + n_i
            tri_v, tri_n, cc, dirty, _, _, site_tri = _flip_sweep_compact(
                pts, st.tri_v, st.tri_n, st.cc, dirty, R_, jnp.int32(2),
                site_tri=st.site_tri, r_site=rsite)
            st = BuildState(tri_v, tri_n, cc, st.n_tris, site_tri, st.n_left)
            return st, dirty, it + 1, n_new > 0
        st, dirty, _, _ = jax.lax.while_loop(
            cond, body, (st, dirty, jnp.int32(0), True))
        return st, dirty
    return k_rounds

f = make_k_rounds()
t0 = time.perf_counter()
lowered = f.trace(pts, st, dirty, jnp.int32(1), R, RSITE)
print(f"trace {time.perf_counter()-t0:.2f}s", flush=True)
t0 = time.perf_counter()
low = lowered.lower()
print(f"lower {time.perf_counter()-t0:.2f}s", flush=True)
t0 = time.perf_counter()
comp = low.compile()
print(f"compile (cache?) {time.perf_counter()-t0:.2f}s", flush=True)
t0 = time.perf_counter()
st2, dirty2 = comp(pts, st, dirty, jnp.int32(1))
jax.block_until_ready(st2.site_tri)
print(f"exec1 {time.perf_counter()-t0:.2f}s n_left={int(st2.n_left)}", flush=True)

# a SECOND fresh instance (simulating the next build call in-process)
g = make_k_rounds()
t0 = time.perf_counter()
st3, dirty3 = g(pts, st2, dirty2, jnp.int32(1), R, RSITE)
jax.block_until_ready(st3.site_tri)
print(f"fresh-instance call total {time.perf_counter()-t0:.2f}s "
      f"n_left={int(st3.n_left)}", flush=True)
t0 = time.perf_counter()
st4, dirty4 = g(pts, st3, dirty3, jnp.int32(1), R, RSITE)
jax.block_until_ready(st4.site_tri)
print(f"same-instance call {time.perf_counter()-t0:.2f}s", flush=True)
