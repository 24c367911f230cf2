"""Pallas TPU kernel for dense point location (2D).

The pure-XLA dense locate (models.device_tri.locate_dense) materializes a
[B, 3T] score matrix in HBM — measured ~106 GB/s effective, bandwidth-bound
at ~2.2 Mq/s for T=4001 on a v5e.  This kernel keeps everything on-chip:

* the per-triangle affine score tables (two [2, T] weight-gradient rows +
  two [1, T] biases) live in VMEM for the whole grid — a few hundred KB
  up to T ~ 100k;
* each grid step processes a lane-aligned tile of queries, sweeping the
  triangle axis in VMEM-sized column chunks with a running
  (best score, best index) accumulator;
* scores are plain VPU broadcast-FMA (the contraction dim is d=2 — there
  is nothing for the MXU here), so HBM traffic is just Q in + indices out.

Weights use the query-centered form c_k(q) = g_k . (q - c0) + b_k with the
third weight implied (1 - c0 - c1), matching locate_dense's numerics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_B = 1024   # queries per inner row (lane-dim multiple of 128)
GROUP = 8       # query rows per grid step (TPU sublane block divisibility)
TILE_T = 1024   # triangle columns per VMEM chunk


def _kernel(qt_ref, g_ref, b_ref, best_ref, *, n_t_tiles, t_total):
    # qt_ref: [2, GROUP*TILE_B] query coords (centered).  g_ref: [4, Tpad]
    # rows = (g0x, g0y, g1x, g1y).  b_ref: [2, Tpad] rows = (b0, b1).
    # best_ref: [GROUP, TILE_B].
    def row(j, _):
        q0 = qt_ref[0, pl.ds(j * TILE_B, TILE_B)][:, None]  # [TILE_B, 1]
        q1 = qt_ref[1, pl.ds(j * TILE_B, TILE_B)][:, None]

        def body(i, carry):
            best_val, best_idx = carry
            off = i * TILE_T
            g = g_ref[:, pl.ds(off, TILE_T)]
            b = b_ref[:, pl.ds(off, TILE_T)]
            c0 = (
                q0 * g[0, :][None, :]
                + q1 * g[1, :][None, :]
                + b[0, :][None, :]
            )
            c1 = (
                q0 * g[2, :][None, :]
                + q1 * g[3, :][None, :]
                + b[1, :][None, :]
            )
            minw = jnp.minimum(jnp.minimum(c0, c1), 1.0 - c0 - c1)
            # Poison padded columns so they never win.
            col = jax.lax.broadcasted_iota(jnp.int32, minw.shape, 1) + off
            minw = jnp.where(col < t_total, minw, -jnp.inf)
            m = jnp.max(minw, axis=-1)          # [TILE_B]
            a = jnp.argmax(minw, axis=-1).astype(jnp.int32) + off
            upd = m > best_val
            return jnp.where(upd, m, best_val), jnp.where(upd, a, best_idx)

        init = (
            jnp.full((TILE_B,), -jnp.inf, jnp.float32),
            jnp.zeros((TILE_B,), jnp.int32),
        )
        _, best_idx = jax.lax.fori_loop(0, n_t_tiles, body, init)
        best_ref[pl.ds(j, 1), :] = best_idx[None, :]
        return 0

    jax.lax.fori_loop(0, GROUP, row, 0)


@functools.partial(jax.jit, static_argnames=("t_total",))
def _run(qt_pad, g_pack, b_pack, t_total):
    n_groups = qt_pad.shape[1] // (GROUP * TILE_B)
    t_pad = g_pack.shape[1]
    n_t_tiles = t_pad // TILE_T
    out = pl.pallas_call(
        functools.partial(_kernel, n_t_tiles=n_t_tiles, t_total=t_total),
        out_shape=jax.ShapeDtypeStruct((n_groups * GROUP, TILE_B), jnp.int32),
        grid=(n_groups,),
        in_specs=[
            pl.BlockSpec(
                (2, GROUP * TILE_B), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (4, t_pad), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (2, t_pad), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (GROUP, TILE_B), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
    )(qt_pad, g_pack, b_pack)
    return out.reshape(-1)


def locate_dense_pallas(tri, q_raw, interpret: bool = False):
    """Brute-force locate via the Pallas kernel; returns best simplex [B].

    Builds the query-centered score tables from ``tri.affine`` (float32),
    pads B and T to tile multiples, and sweeps.  Use
    models.device_tri._weights on the result for exact weights.
    """
    d = tri.dim
    assert d == 2, "pallas dense locate is 2D"
    T = tri.n_tris
    A = tri.affine[:, : d * d].reshape(T, d, d).astype(jnp.float32)
    anchor = tri.affine[:, d * d : d * d + d].astype(jnp.float32)
    w0 = tri.affine[:, d * d + d :].astype(jnp.float32)
    c0 = tri.shift.astype(jnp.float32)
    # c_k(q) = A[k,:] . (q - c0) + (w0[k] + A[k,:] . (c0 - anchor))
    # (elementwise, not einsum: TPU f32 matmuls run bf16 — CLAUDE.md trap)
    bias = w0 + jnp.sum(A * (c0 - anchor)[:, None, :], axis=-1)  # [T, 2]
    g_pack = jnp.concatenate(
        [A[:, 0, :].T, A[:, 1, :].T], axis=0
    )  # [4, T]: rows g0x g0y g1x g1y
    b_pack = bias.T  # [2, T]

    t_pad = -(-T // TILE_T) * TILE_T
    g_pack = jnp.pad(g_pack, ((0, 0), (0, t_pad - T)))
    b_pack = jnp.pad(b_pack, ((0, 0), (0, t_pad - T)))

    q = jnp.asarray(q_raw, jnp.float32)
    B = q.shape[0]
    b_pad = -(-B // (GROUP * TILE_B)) * (GROUP * TILE_B)
    qt = jnp.pad((q - c0).T, ((0, 0), (0, b_pad - B)))

    if interpret:
        # Interpreter mode for CPU testing.
        n_groups = b_pad // (GROUP * TILE_B)
        n_t_tiles = t_pad // TILE_T
        out = pl.pallas_call(
            functools.partial(
                _kernel, n_t_tiles=n_t_tiles, t_total=T
            ),
            out_shape=jax.ShapeDtypeStruct(
                (n_groups * GROUP, TILE_B), jnp.int32
            ),
            grid=(n_groups,),
            in_specs=[
                pl.BlockSpec((2, GROUP * TILE_B), lambda i: (0, i)),
                pl.BlockSpec((4, t_pad), lambda i: (0, 0)),
                pl.BlockSpec((2, t_pad), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((GROUP, TILE_B), lambda i: (i, 0)),
            interpret=True,
        )(qt, g_pack, b_pack).reshape(-1)
        return out[:B]
    return _run(qt, g_pack, b_pack, T)[:B]
