"""Sub-phase timing of the split round + flip round bodies at bulge state."""
import functools, time
import numpy as np
import jax
import jax.numpy as jnp

from gsl_scattered_interpolation_tpu.models.device_delaunay import (
    BuildState, INT_MAX, _assign_split_child, _cc_update,
    _edge_candidates, _match_and_flip, _repair_rows,
    _flip_sweep_compact, _init_state, _relocate_sites_chunked,
    _split_round_compact, bucket_size,
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
print(f"advanced: n_left={int(st.n_left)} n_tris={int(st.n_tris)} "
      f"t={time.perf_counter()-t0:.1f}s", flush=True)

# ---- staged split round ----------------------------------------------------
def split_staged(pts, st, dirty, R, r_site, upto):
    M = st.tri_v.shape[0]
    Ns = st.site_tri.shape[0]
    site_ids = jnp.arange(Ns, dtype=jnp.int32)
    tri_v, tri_n, cc, n_tris, site_tri, n_left = st
    tgt = jnp.where(site_tri >= 0, site_tri, M)
    claim = jnp.full(M + 1, INT_MAX, jnp.int32).at[tgt].min(site_ids)[:M]
    has = claim != INT_MAX
    rank = jnp.cumsum(has.astype(jnp.int32)) - 1
    has = has & (n_tris + 2 * (rank + 1) <= M) & (rank < R)
    prow = jnp.full(R + 1, -1, jnp.int32).at[
        jnp.where(has, rank, R)].set(jnp.arange(M, dtype=jnp.int32),
                                     mode="drop")[:R]
    if upto == 1:
        return prow, claim
    pvalid = prow >= 0
    ps = jnp.where(pvalid, prow, 0)
    i_r = jnp.arange(R, dtype=jnp.int32)
    ca = jnp.where(pvalid, n_tris + 2 * i_r, -1)
    cb = jnp.where(pvalid, n_tris + 2 * i_r + 1, -1)
    s_pid = (claim[ps] + 3).astype(jnp.int32)
    tvr = geometry.take_rows(tri_v, ps)
    tnr = geometry.take_rows(tri_n, ps)
    v0, v1, v2 = tvr[:, 0], tvr[:, 1], tvr[:, 2]
    n0, n1, n2 = tnr[:, 0], tnr[:, 1], tnr[:, 2]
    rows9 = jnp.where(jnp.concatenate([pvalid] * 3),
                      jnp.concatenate([ps, ca, cb]), M + 1)
    tri_v = tri_v.at[rows9].set(jnp.concatenate([
        jnp.stack([s_pid, v1, v2], -1),
        jnp.stack([s_pid, v2, v0], -1),
        jnp.stack([s_pid, v0, v1], -1)]), mode="drop")
    tri_n = tri_n.at[rows9].set(jnp.concatenate([
        jnp.stack([n0, ca, cb], -1),
        jnp.stack([n1, cb, ps], -1),
        jnp.stack([n2, ps, ca], -1)]), mode="drop")
    n_new = jnp.sum(pvalid.astype(jnp.int32))
    n_tris = (n_tris + 2 * n_new).astype(jnp.int32)
    if upto == 2:
        return tri_v, tri_n
    rows_p = jnp.where(pvalid, prow, M + 1)
    cAB_map = jnp.full((M, 2), -1, jnp.int32).at[rows_p].set(
        jnp.stack([ca, cb], -1), mode="drop")
    split_flag = cAB_map[:, 0] >= 0
    srec = jnp.full((M, 4), -1, jnp.int32).at[rows_p].set(
        jnp.stack([v0, v1, ca, cb], -1), mode="drop")
    rep = jnp.concatenate([ps, ca, cb, n0, n1, n2])
    repv = jnp.concatenate([pvalid] * 6) & (rep >= 0)
    rs = jnp.where(repv, rep, 0)
    tvr6 = geometry.take_rows(tri_v, rs)
    tnr6 = geometry.take_rows(tri_n, rs)
    rec = geometry.take_rows(srec, jnp.where(tnr6 >= 0, tnr6, 0))
    stale = repv[:, None] & (tnr6 >= 0) & (rec[..., 2] >= 0)
    a = jnp.roll(tvr6, -1, axis=1)
    b = jnp.roll(tvr6, -2, axis=1)
    rv0, rv1 = rec[..., 0], rec[..., 1]
    owner = jnp.where((a != rv0) & (b != rv0), tnr6,
                      jnp.where((a != rv1) & (b != rv1),
                                rec[..., 2], rec[..., 3]))
    out = jnp.where(stale, owner, tnr6)
    tri_n = tri_n.at[jnp.where(repv, rep, M + 1)].set(out, mode="drop")
    if upto == 3:
        return tri_v, tri_n
    rows3 = jnp.concatenate([ps, ca, cb])
    cc = _cc_update(cc, pts, tri_v, rows3, jnp.concatenate([pvalid] * 3), M)
    if upto == 4:
        return tri_v, tri_n, cc
    t_of = jnp.where(site_tri >= 0, site_tri, 0)
    needs = (site_tri >= 0) & split_flag[t_of]
    site_tri = _relocate_sites_chunked(
        pts, site_tri, needs,
        lambda t, q: _assign_split_child(pts, tri_v, cAB_map, t, q), r_site)
    claimed = needs & (claim[t_of] == site_ids)
    site_tri = jnp.where(claimed, -1, site_tri)
    n_left = (n_left - jnp.sum(claimed.astype(jnp.int32))).astype(jnp.int32)
    dirty = dirty.at[jnp.where(repv, rep, M + 1)].set(True, mode="drop")
    return BuildState(tri_v, tri_n, cc, n_tris, site_tri, n_left), dirty

# ---- staged single flip round ---------------------------------------------
def flip_staged(pts, tri_v, tri_n, cc, dirty, site_tri, R, r_site, upto):
    M = tri_v.shape[0]
    arange_m = jnp.arange(M, dtype=jnp.int32)
    didx = jnp.cumsum(dirty.astype(jnp.int32)) - 1
    sel = dirty & (didx < R)
    rows = jnp.full(R + 1, -1, jnp.int32).at[
        jnp.where(sel, didx, R)].set(arange_m, mode="drop")[:R]
    rvalid = rows >= 0
    if upto == 1:
        return rows, rvalid
    tv, tn, cand_ok = _edge_candidates(pts, tri_v, tri_n, cc, rows, rvalid)
    if upto == 2:
        return cand_ok, tv
    tri_v, tri_n, cc, flip_info, rep, repv, any_flip = _match_and_flip(
        pts, tri_v, tri_n, cc, rows, rvalid, tv, tn, cand_ok)
    if upto == 3:
        return tri_v, tri_n, cc, flip_info
    tri_n = _repair_rows(tri_v, tri_n, flip_info, rep, repv)
    if upto == 4:
        return tri_v, tri_n
    dirty = dirty.at[jnp.where(rvalid, rows, M + 1)].set(
        jnp.any(cand_ok, axis=-1), mode="drop")
    dirty = dirty.at[jnp.where(repv, rep, M + 1)].set(True, mode="drop")
    t_of = jnp.where(site_tri >= 0, site_tri, 0)
    affected = (site_tri >= 0) & (
        geometry.take_rows(flip_info, t_of)[:, 0] >= 0)
    tv_now = tri_v
    site_tri = _relocate_sites_chunked(
        pts, site_tri, affected,
        lambda t, q: _assign_flip_side(pts, tv_now, flip_info, t, q), r_site)
    return tri_v, tri_n, cc, dirty, site_tri

from gsl_scattered_interpolation_tpu.models.device_delaunay import (
    _assign_flip_side,
)

def timeit(name, fn, args, reps=4):
    fn(*args)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out[0] if isinstance(out, tuple) else out)
        ts.append(time.perf_counter() - t0)
    print(f"{name:30s} {min(ts)*1e3:8.1f} ms  (" +
          " ".join(f"{t*1e3:.0f}" for t in ts) + ")", flush=True)

kj = [0]
def salted(f):
    def g(pts_, *rest):
        kj[0] += 1
        return f(pts_.at[3 + N + 1, 0].add(1e-7 * kj[0]), *rest)
    return g

for u in (1, 2, 3, 4, 5):
    f = jax.jit(functools.partial(
        lambda p, s, d2, upto: split_staged(p, s, d2, R_S, RSITE, upto),
        upto=u), static_argnames=())
    fj = jax.jit(lambda p, s, d2, _u=u: split_staged(p, s, d2, R_S, RSITE, _u))
    timeit(f"split upto={u}", salted(fj), (pts, st, dirty))

for u in (1, 2, 3, 4, 5):
    fj = jax.jit(lambda p, tv, tn, c, d2, s_t, _u=u: flip_staged(
        p, tv, tn, c, d2, s_t, R, RSITE, _u))
    timeit(f"flip upto={u}", salted(fj),
           (pts, st.tri_v, st.tri_n, st.cc, dirty, st.site_tri))
