"""Time one full sweep-round body and ablations (TPU f32, salted).

Variants at production shapes (M=2.1M, R=524k, rf_div=2):
  full        — the exact _flip_sweep_compact body (one round, no loop)
  no_repair   — full minus _repair_rows
  no_dirty    — full minus the two dirty scatters
  cand_match  — candidates + match only (no repair, no dirty)
  in_loop     — the same body inside a 4-iteration while_loop (donated),
                per-round time (exposes loop-carried-buffer copy cost)

PYTHONPATH=/root/repo:/root/.axon_site python tools/ablate_round.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from gsl_scattered_interpolation_tpu.utils import config

config.enable_compile_cache()

from gsl_scattered_interpolation_tpu.models import device_delaunay as dd

N = 1_048_576
M = 2 * N + 3
R = 524_288
RFDIV = 2
DT = jnp.float32

rng = np.random.default_rng(3)
pts = jnp.asarray(rng.uniform(-0.5, 0.5, (N + 3, 2)), DT)
tri_v = jnp.asarray(rng.integers(0, N, (M, 3)), jnp.int32)
tri_n = jnp.asarray(rng.integers(-1, M, (M, 3)), jnp.int32)
cc = jnp.stack(
    [jnp.ones(M, DT), jnp.asarray(tri_v.sum(1), DT)], -1
)
dirty = jnp.asarray(rng.random(M) < 0.4)
arange_m = jnp.arange(M, dtype=jnp.int32)


def body(pts, tri_v, tri_n, cc, dirty, with_repair, with_dirty):
    didx = jnp.cumsum(dirty.astype(jnp.int32)) - 1
    sel = dirty & (didx < R)
    rows = jnp.full(R + 1, -1, jnp.int32).at[
        jnp.where(sel, didx, R)
    ].set(arange_m, mode="drop")[:R]
    rvalid = rows >= 0
    tv, tn, cand_ok = dd._edge_candidates(pts, tri_v, tri_n, cc, rows, rvalid)
    out = dd._match_and_flip(
        pts, tri_v, tri_n, cc, rows, rvalid, tv, tn, cand_ok,
        want_frec=False, rf_div=RFDIV,
    )
    tri_v, tri_n, cc, flip_info, rep, repv, any_flip, n_exec = out[:8]
    # repair is now integrated into _match_and_flip; with_repair is
    # vestigial (kept so the case list still runs)
    del with_repair
    if with_dirty:
        dirty = dirty.at[jnp.where(rvalid, rows, M + 1)].set(
            jnp.any(cand_ok, axis=-1), mode="drop"
        )
        dirty = dirty.at[
            jnp.where(repv, rep, M + 1)
        ].set(True, mode="drop")
    return tri_v, tri_n, cc, dirty, n_exec


@jax.jit
def v_full(pts, tri_v, tri_n, cc, dirty, salt):
    return body(pts + salt, tri_v, tri_n, cc, dirty, True, True)


@jax.jit
def v_no_repair(pts, tri_v, tri_n, cc, dirty, salt):
    return body(pts + salt, tri_v, tri_n, cc, dirty, False, True)


@jax.jit
def v_no_dirty(pts, tri_v, tri_n, cc, dirty, salt):
    return body(pts + salt, tri_v, tri_n, cc, dirty, True, False)


@jax.jit
def v_cand_match(pts, tri_v, tri_n, cc, dirty, salt):
    return body(pts + salt, tri_v, tri_n, cc, dirty, False, False)


@jax.jit
def v_in_loop(pts, tri_v, tri_n, cc, dirty, salt):
    def b(c):
        tri_v, tri_n, cc, dirty, it, acc = c
        tri_v, tri_n, cc, dirty, n_exec = body(
            pts + salt + it.astype(DT) * DT(1e-9), tri_v, tri_n, cc,
            dirty, True, True,
        )
        return tri_v, tri_n, cc, dirty, it + 1, acc + n_exec

    out = jax.lax.while_loop(
        lambda c: c[4] < 4, b,
        (tri_v, tri_n, cc, dirty, jnp.int32(0), jnp.int32(0)),
    )
    return out[0], out[5]


CASES = [
    ("full", v_full, 1),
    ("no_repair", v_no_repair, 1),
    ("no_dirty", v_no_dirty, 1),
    ("cand_match", v_cand_match, 1),
    ("in_loop(4)", v_in_loop, 4),
]

for name, fn, per in CASES:
    out = fn(pts, tri_v, tri_n, cc, dirty, DT(0.0))
    jax.block_until_ready(out)
    reps = 6
    t0 = time.perf_counter()
    for r in range(1, reps + 1):
        out = fn(pts, tri_v, tri_n, cc, dirty, DT(r * 1e-7))
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / reps / per * 1e3
    print(f"{name}: {ms:.1f} ms/round", flush=True)
