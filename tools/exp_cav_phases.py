"""Phase breakdown of one 3D cavity round on a REAL mid-build state.

Captures the state at the first _k_rounds dispatch of a seeded 10k
build, then times: full round | cavity growth | claims+growth, all via
fori_loop iteration batches with one readback (axon discipline).
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

import gsl_scattered_interpolation_tpu.models.device_cavity as dcm
from gsl_scattered_interpolation_tpu.models import host_tree as ht
from gsl_scattered_interpolation_tpu.ops import geometry

print(jax.devices(), flush=True)
n = 10_000
rng = np.random.default_rng(13)
sites = rng.uniform(-0.5, 0.5, size=(n, 3))

captured = {}
_orig_init = dcm.init_state_seeded


def spy(pts, N, M, tv0, tn0, site_tri0, n_left0, n_real=None):
    st = _orig_init(pts, N, M, tv0, tn0, site_tri0, n_left0, n_real)
    if "pts" not in captured:
        # deep-copy: build() donates st's buffers to its first dispatch
        captured.update(
            pts=jnp.copy(pts), st=jax.tree.map(jnp.copy, st)
        )
    return st


dcm.init_state_seeded = spy

t0 = time.perf_counter()
tri, shuf = dcm.triangulate(sites, flags=ht.NOSTANDARDIZE, dtype=jnp.float32)
print(f"full build: {time.perf_counter()-t0:.1f}s", flush=True)

pts, st = captured["pts"], captured["st"]
S, C, s_div = 512, 64, 32
print(f"S={S} C={C} s_div={s_div} M={st.tri_v.shape[0]}", flush=True)
ITERS = 10
INT_MAX = np.iinfo(np.int32).max


@jax.jit
def t_full(pts, st):
    def body(i, carry):
        st, acc = carry
        # advance the REAL state: loop-invariant bodies would be
        # hoisted out of the loop by XLA (LICM) and time one round
        st2, nwin = dcm._round(pts, st, S, C, s_div=s_div)
        return st2, acc + nwin

    _, acc = jax.lax.fori_loop(0, ITERS, body, (st, jnp.int32(0)))
    return acc


@jax.jit
def t_claims_grow(pts, st):
    def body(i, acc):
        M, dp1 = st.tri_v.shape
        d = dp1 - 1
        N = st.site_tri.shape[0]
        site_ids = jnp.arange(N, dtype=jnp.int32)
        tri_v, tri_n, n_tris, site_tri, n_left = st
        tgt = jnp.where(site_tri >= 0, site_tri, M)
        claim = jnp.full(M + 1, INT_MAX, jnp.int32).at[tgt].min(
            site_ids
        )[:M]
        has = claim != INT_MAX
        rank = jnp.cumsum(has.astype(jnp.int32)) - 1
        n_claims = jnp.maximum(jnp.sum(has.astype(jnp.int32)), 1)
        s_eff = jnp.clip(n_tris // s_div, 4, S)
        stride = jnp.maximum((n_claims + s_eff - 1) // s_eff, 1)
        picked = has & (rank % stride == 0)
        slot = jnp.where(picked, rank // stride, S + 1)
        t_all = jnp.arange(M, dtype=jnp.int32)
        cand_tri = jnp.full(S, -1, jnp.int32).at[slot].set(
            t_all, mode="drop"
        )
        cand_site = jnp.full(S, -1, jnp.int32).at[slot].set(
            claim, mode="drop"
        )
        active = cand_site >= 0
        spid = jnp.where(active, cand_site + d + 1, 0)
        # non-foldable salt (1e-12 of the box: timing-neutral)
        q = geometry.take_rows(pts, spid) + (
            i.astype(jnp.float32) * jnp.float32(1e-12)
        )
        cav, n_cav, overflow = dcm._grow_cavities(
            pts, st, q, cand_tri, active, C
        )
        return acc + jnp.sum(n_cav) + cav[0, 0]

    return jax.lax.fori_loop(0, ITERS, body, jnp.int32(0))


def timed(f, label):
    out = int(f(pts, st))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = int(f(pts, st))
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {best/ITERS*1e3:.1f} ms/round", flush=True)


timed(t_full, "full round      ")
timed(t_claims_grow, "claims + growth ")
