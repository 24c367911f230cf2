"""Per-phase timing of one sweep round at production shapes (synthetic).

Phases: dirty compaction | candidate pass | match+flip.  Synthetic
arrays sized like the 1M build (M=2N+3, R=524k); timing-valid since
gather/scatter volume, not values, sets the cost.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from gsl_scattered_interpolation_tpu.models import device_delaunay as dd

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
dirty = jnp.asarray(rng.random(M) < 0.5)
rows = jnp.asarray(rng.integers(0, M, R), jnp.int32)
rvalid = jnp.ones(R, bool)
# ~20% candidate density, like an early sweep round
cand0 = jnp.asarray(rng.random((R, 3)) < 0.07)
arange_m = jnp.arange(M, dtype=jnp.int32)


def timed(f, *args):
    g = jax.jit(f)
    out = int(g(*args))
    best = 1e9
    for k in range(3):
        t0 = time.perf_counter()
        out = int(g(*args))
        best = min(best, time.perf_counter() - t0)
    return best / ITERS


def f_compact(dirty):
    def body(i, acc):
        d = dirty if False else jnp.roll(dirty, i)
        didx = jnp.cumsum(d.astype(jnp.int32)) - 1
        sel = d & (didx < R)
        rr = jnp.full(R + 1, -1, jnp.int32).at[
            jnp.where(sel, didx, R)
        ].set(arange_m, mode="drop")[:R]
        return acc + rr[0] + rr[R - 1]

    return jax.lax.fori_loop(0, ITERS, body, jnp.int32(0))


def f_match(pts, tri_v, tri_n, cc, rows, cand0):
    def body(i, acc):
        rs = rows + i
        from gsl_scattered_interpolation_tpu.ops import geometry

        tv = geometry.take_rows(tri_v, rs)
        tn = geometry.take_rows(tri_n, rs)
        out = dd._match_and_flip(
            pts, tri_v, tri_n, cc, rs, rvalid, tv, tn, cand0,
            want_frec=False, rf_div=2,
        )
        return acc + out[7]

    return jax.lax.fori_loop(0, ITERS, body, jnp.int32(0))


print(f"compact: {timed(f_compact, dirty)*1e3:6.1f} ms", flush=True)
print(
    f"match+flip(7% cand, incl tv/tn gathers): "
    f"{timed(f_match, pts, tri_v, tri_n, cc, rows, cand0)*1e3:6.1f} ms",
    flush=True,
)
