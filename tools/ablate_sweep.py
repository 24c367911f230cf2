"""Ablate one 2D flip-sweep round into its cost components (TPU f32).

Times, with salted inputs (fresh scalar operand per rep — axon reuses
results for identical inputs), at the 1M-build shapes:

  * math      — _edge_candidates_math on pre-gathered [R, 3] quads
  * gathers   — the gather section of _edge_candidates alone
  * full_cand — _edge_candidates end to end
  * compact   — dirty-set cumsum + row compaction
  * match     — _match_and_flip on a realistic-density candidate mask

PYTHONPATH=/root/repo:/root/.axon_site python tools/ablate_sweep.py
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from gsl_scattered_interpolation_tpu.utils import config

config.enable_compile_cache()

from gsl_scattered_interpolation_tpu.models import device_delaunay as dd
from gsl_scattered_interpolation_tpu.ops import geometry

R = 524_288
M = 2_100_000 // 8 * 8
N = 1_050_000
DTYPE = jnp.float32

rng = np.random.default_rng(3)
pts_np = rng.uniform(-0.5, 0.5, size=(N, 2)).astype(np.float32)
tri_v_np = rng.integers(0, N, size=(M, 3)).astype(np.int32)
tri_n_np = rng.integers(-1, M, size=(M, 3)).astype(np.int32)
cc_np = np.stack(
    [np.ones(M, np.float32),
     tri_v_np.sum(1).astype(np.float32)], -1
)
dirty_np = rng.random(M) < 0.4

pts = jnp.asarray(pts_np)
tri_v = jnp.asarray(tri_v_np)
tri_n = jnp.asarray(tri_n_np)
cc = jnp.asarray(cc_np)
dirty = jnp.asarray(dirty_np)
rows_np = rng.choice(M, R, replace=False).astype(np.int32)
rows = jnp.asarray(rows_np)
rvalid = jnp.ones(R, bool)

apex3 = jnp.asarray(rng.uniform(-0.5, 0.5, (R, 3, 2)), DTYPE)
fq3 = jnp.asarray(rng.uniform(-0.5, 0.5, (R, 3, 2)), DTYPE)
tvr = jnp.asarray(rng.integers(0, N, (R, 3)), jnp.int32)
p1r = jnp.roll(tvr, -1, axis=1)
p2r = jnp.roll(tvr, -2, axis=1)
farr = jnp.asarray(rng.integers(0, N, (R, 3)), jnp.int32)
valid3 = jnp.ones((R, 3), bool)
cokr = jnp.ones(R, bool)
degen_u = jnp.zeros((R, 3), bool)


@jax.jit
def math_only(apex3, fq3, salt):
    return dd._edge_candidates_math(
        apex3 + salt, fq3 + salt, tvr, p1r, farr, p2r, valid3, cokr,
        degen_u,
    )


@jax.jit
def gathers_only(pts, tri_v, tri_n, cc, rows, salt):
    rs = rows
    tv = geometry.take_rows(tri_v, rs)
    tn = geometry.take_rows(tri_n, rs)
    cok = geometry.take_rows(cc, rs)[:, 0] > 0.5
    u3 = tn
    valid3 = (u3 >= 0)
    uu3 = jnp.where(valid3, u3, 0)
    ccu = geometry.take_rows(cc, uu3)
    p1_id = jnp.roll(tv, -1, axis=1)
    p2_id = jnp.roll(tv, -2, axis=1)
    far3 = ccu[..., 1].astype(jnp.int32) - p1_id - p2_id
    far3 = jnp.clip(far3, 0, pts.shape[0] - 1)
    p6 = geometry.take_rows(pts + salt, jnp.concatenate([tv, far3], 1))
    return p6.sum(), tv.sum(), cok.sum()


@jax.jit
def full_cand(pts, tri_v, tri_n, cc, rows, salt):
    tv, tn, cand = dd._edge_candidates(
        pts + salt, tri_v, tri_n, cc, rows, rvalid
    )
    return cand


@jax.jit
def compact_only(dirty, salt):
    didx = jnp.cumsum(dirty.astype(jnp.int32)) - 1
    sel = dirty & (didx < R) & (salt > -1.0)
    rows = jnp.full(R + 1, -1, jnp.int32).at[
        jnp.where(sel, didx, R)
    ].set(jnp.arange(M, dtype=jnp.int32), mode="drop")[:R]
    return rows


@jax.jit
def match_only(pts, tri_v, tri_n, cc, rows, cand, salt):
    tv = geometry.take_rows(tri_v, rows)
    tn = geometry.take_rows(tri_n, rows)
    out = dd._match_and_flip(
        pts + salt, tri_v, tri_n, cc, rows, rvalid, tv, tn, cand,
        want_frec=False,
    )
    return out[0].sum(), out[1].sum()


cand_mask = jnp.asarray(rng.random((R, 3)) < 0.05)

CASES = [
    ("math", lambda s: math_only(apex3, fq3, s)),
    ("gathers", lambda s: gathers_only(pts, tri_v, tri_n, cc, rows, s)),
    ("full_cand", lambda s: full_cand(pts, tri_v, tri_n, cc, rows, s)),
    ("compact", lambda s: compact_only(dirty, s)),
    ("match", lambda s: match_only(pts, tri_v, tri_n, cc, rows,
                                   cand_mask, s)),
]

for name, fn in CASES:
    out = fn(jnp.float32(0.0))
    jax.block_until_ready(out)
    reps = 8
    t0 = time.perf_counter()
    for r in range(1, reps + 1):
        out = fn(jnp.float32(r * 1e-7))
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name}: {dt*1e3:.1f} ms", flush=True)
