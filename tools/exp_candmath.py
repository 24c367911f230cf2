"""Measure the Pallas-fused candidate math vs the XLA path at R=524k.

Synthetic (but size-realistic) state: timing only — gathers and
elementwise structure match the production sweep round's candidate
pass.  fori_loop of ITERS salted iterations + one scalar readback
(axon async-timing discipline).
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from gsl_scattered_interpolation_tpu.models import device_delaunay as dd
from gsl_scattered_interpolation_tpu.ops import geometry, pallas_candmath as pcm

print(jax.devices(), flush=True)
ITERS = 10
N = 1_048_576
M = 2 * N + 3
R = 524_288
rng = np.random.default_rng(0)
pts = jnp.asarray(rng.uniform(-0.5, 0.5, (N + 3, 2)), jnp.float32)
tri_v = jnp.asarray(rng.integers(0, N, (M, 3)), jnp.int32)
tri_n = jnp.asarray(rng.integers(-1, M, (M, 3)), jnp.int32)
cc = jnp.asarray(
    np.stack([np.ones(M), rng.integers(0, 3 * N, M)], -1), jnp.float32
)
rows = jnp.asarray(rng.integers(0, M, R), jnp.int32)
rvalid = jnp.ones(R, bool)


@jax.jit
def xla_path(pts, tri_v, tri_n, cc, rows):
    def body(i, acc):
        tv, tn, cand = dd._edge_candidates(
            pts, tri_v, tri_n, cc, rows + i, rvalid
        )
        return acc + jnp.sum(cand.astype(jnp.int32))

    return jax.lax.fori_loop(0, ITERS, body, jnp.int32(0))


@jax.jit
def pallas_path(pts, tri_v, tri_n, cc, rows):
    def body(i, acc):
        rs = rows + i
        tv = geometry.take_rows(tri_v, rs)
        tn = geometry.take_rows(tri_n, rs)
        alive = rvalid & (tv[:, 0] >= 0)
        cok = geometry.take_rows(cc, rs)[:, 0] > 0.5
        valid3 = alive[:, None] & (tn >= 0)
        uu3 = jnp.where(valid3, tn, 0)
        ccu = geometry.take_rows(cc, uu3)
        degen_u = ~(ccu[..., 0] > 0.5)
        p1_id = jnp.roll(tv, -1, axis=1)
        p2_id = jnp.roll(tv, -2, axis=1)
        far3 = ccu[..., 1].astype(jnp.int32) - p1_id - p2_id
        far3 = jnp.clip(far3, 0, pts.shape[0] - 1)
        p6 = geometry.take_rows(pts, jnp.concatenate([tv, far3], axis=1))
        cand = pcm.candidates_math_pallas(
            p6[:, :3], p6[:, 3:], tv, p1_id, far3, p2_id, valid3, cok,
            degen_u,
        )
        return acc + jnp.sum(cand.astype(jnp.int32))

    return jax.lax.fori_loop(0, ITERS, body, jnp.int32(0))


def timed(f):
    out = int(f(pts, tri_v, tri_n, cc, rows))
    best = 1e9
    for k in range(3):
        t0 = time.perf_counter()
        out = int(f(pts, tri_v, tri_n, cc, rows + k))
        best = min(best, time.perf_counter() - t0)
    return best / ITERS


t_x = timed(xla_path)
print(f"xla candidate pass:    {t_x*1e3:.1f} ms/round", flush=True)
t_p = timed(pallas_path)
print(f"pallas candidate pass: {t_p*1e3:.1f} ms/round", flush=True)
