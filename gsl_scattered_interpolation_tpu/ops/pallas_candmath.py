"""Pallas-fused flip-candidate verdicts for the 2D build's sweep rounds.

The HLO census of one sweep round body at R=524k (tools/hlo_census.py,
r5) counts ~130 kernels, ~55 of them kLoop elementwise fusions — XLA
splits the compensated-predicate chains of
``device_delaunay._edge_candidates_math`` into dozens of R-sized HBM
passes, and at the measured ~7 ns/element such passes ARE the round's
cost (~0.26 s at R=524k).  Random gathers cannot move into Pallas
profitably (XLA's gather engine streams ~150 Mrow/s; per-row DMA is
~100x slower — measured dead end, see CLAUDE.md), but everything
BETWEEN the gathers is contiguous elementwise math: this kernel
evaluates the full candidate verdict — convexity orients, the 5-step
sorting network, the canonical compensated incircle, tie/degeneracy
rules — in ONE VMEM-tiled pass.

Numerics: identical formula sequence to ``_edge_candidates_math`` +
``ops.robust`` (the robust helpers are called directly inside the
kernel body — they are pure jnp elementwise code).  Verdicts stay
canonical per quad because every sweep round routes through this one
kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import robust

LANE = 128
# 16x128 = 2048 elems/block: the double-single predicate chains keep
# ~100 live temporaries per element — 64x128 blocks exceeded the 128M
# VMEM budget (measured 158M).
SUB = 16
BLOCK = SUB * LANE


def _kernel(ax, ay, fx, fy, tv, fid, valid, degt, degu, out):
    """One [SUB, LANE]-tile of candidate verdicts.

    Every operand arrives pre-rolled as its own [3, SUB, LANE] (or
    [SUB, LANE]) ref — plane 0 is the apex/edge value, planes 1 and 2
    its roll(-1)/roll(-2) variants — so the kernel body is purely
    elementwise (identical formulas to _edge_candidates_math).
    """
    a_x, p1_x, p2_x = ax[0, :, :], ax[1, :, :], ax[2, :, :]
    a_y, p1_y, p2_y = ay[0, :, :], ay[1, :, :], ay[2, :, :]
    f_x = fx[:]
    f_y = fy[:]
    t_v, p1_v, p2_v = tv[0, :, :], tv[1, :, :], tv[2, :, :]
    far = fid[:]

    stk = lambda x, y: jnp.stack([x, y], axis=-1)
    A = stk(a_x, a_y)
    F_ = stk(f_x, f_y)
    P1 = stk(p1_x, p1_y)
    P2 = stk(p2_x, p2_y)
    o1 = robust.orient2d_ds(A, F_, P1)
    o2 = robust.orient2d_ds(A, F_, P2)
    convex = jnp.sign(o1) * jnp.sign(o2) < 0

    ids = [t_v, p1_v, far, p2_v]
    xs = [a_x, p1_x, f_x, p2_x]
    ys = [a_y, p1_y, f_y, p2_y]
    for i, j in ((0, 1), (2, 3), (0, 2), (1, 3), (1, 2)):
        sw = ids[i] > ids[j]
        for arr in (ids, xs, ys):
            lo = jnp.where(sw, arr[j], arr[i])
            hi = jnp.where(sw, arr[i], arr[j])
            arr[i], arr[j] = lo, hi
    sp = [stk(xs[k], ys[k]) for k in range(4)]
    O = robust.orient2d_ds(sp[0], sp[1], sp[2])
    S = robust.incircle_ds(sp[0], sp[1], sp[2], sp[3]) * jnp.sign(O)
    # position of the largest id among (apex, p1, far, p2)
    q0, q1, q2, q3 = t_v, p1_v, far, p2_v
    m01 = jnp.maximum(q0, q1)
    m23 = jnp.maximum(q2, q3)
    p3 = jnp.where(
        m01 >= m23,
        jnp.where(q0 >= q1, 0, 1),
        jnp.where(q2 >= q3, 2, 3),
    )
    # int32 select arms: Mosaic rejects sub-byte (bool) select operands
    # ("Unsupported target bitwidth for truncation").
    p3i = ((p3 == 0) | (p3 == 2)).astype(jnp.int32)
    want_i = jnp.where(S > 0, p3i, 1 - p3i)
    want = (want_i > 0) & (S != 0)
    ok = (valid[:] > 0) & convex & (
        want | (degt[:] > 0) | (degu[:] > 0)
    )
    out[:] = ok.astype(jnp.int32)


def _as_blocks(x, n_rows):
    return x.reshape(n_rows, LANE)


@functools.partial(jax.jit, static_argnames=("interpret",))
def candidates_math_pallas(
    apex3, fq3, tv, p1_id, far3, p2_id, valid3, cok, degen_u,
    interpret: bool = False,
):
    """Drop-in fused replacement for ``_edge_candidates_math``.

    Same arguments (cok is the [R] triangle-ok flag; degen_t = ~cok is
    applied inside), returns ``cand_ok [R, 3]`` bool.
    """
    R = tv.shape[0]
    L = R * 3
    pad = (-L) % BLOCK
    n_rows = (L + pad) // LANE

    def prep_f(a):  # [R, 3] float -> [n_rows, LANE]
        a = a.reshape(-1)
        a = jnp.concatenate([a, jnp.zeros(pad, a.dtype)])
        return _as_blocks(a, n_rows)

    def prep_i(a):
        a = a.reshape(-1).astype(jnp.int32)
        a = jnp.concatenate([a, jnp.zeros(pad, jnp.int32)])
        return _as_blocks(a, n_rows)

    ax = apex3[..., 0]
    ay = apex3[..., 1]
    # pre-rolled variants (p1 = roll -1 along the edge axis, p2 = -2)
    packf = lambda a: jnp.stack(
        [prep_f(a), prep_f(jnp.roll(a, -1, 1)), prep_f(jnp.roll(a, -2, 1))]
    )
    packi = lambda a: jnp.stack(
        [prep_i(a), prep_i(jnp.roll(a, -1, 1)), prep_i(jnp.roll(a, -2, 1))]
    )
    args = (
        packf(ax), packf(ay),
        prep_f(fq3[..., 0]), prep_f(fq3[..., 1]),
        packi(tv), prep_i(far3),
        prep_i(valid3.astype(jnp.int32)),
        prep_i(jnp.broadcast_to((~cok)[:, None], (R, 3)).astype(jnp.int32)),
        prep_i(degen_u.astype(jnp.int32)),
    )
    grid = (n_rows // SUB,)
    spec3 = pl.BlockSpec(
        (3, SUB, LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    spec1 = pl.BlockSpec(
        (SUB, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((n_rows, LANE), jnp.int32),
        grid=grid,
        in_specs=[
            spec3, spec3, spec1, spec1, spec3, spec1, spec1, spec1, spec1
        ],
        out_specs=spec1,
        # The DS-predicate chains keep thousands of live temporaries per
        # element; the default 16M scoped-VMEM stack OOMs (measured
        # 39.7M at 16x128 blocks) — raise the cap instead of shrinking
        # blocks below the (8, 128) f32 tile floor.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*args)
    return out.reshape(-1)[:L].reshape(R, 3).astype(bool)
