"""Compensated (double-single) geometric predicates.

The parallel Delaunay build decides flips from the SIGN of incircle and
orientation determinants.  In float32, plain evaluation loses ~1e-7
relative per product — on quads touching the huge cage vertices the sign
comes out wrong and a bad diagonal gets locked in (measured ~4e-2 incircle
violations and 0.16 eval error on a 30k f32 build).  Error-free
transformations fix this without float64 (which the TPU executes slowly or
not at all for some ops): Knuth two-sum and Dekker split/two-product give
each product and sum a (hi, lo) representation carrying ~2x the working
precision, so predicate signs are reliable down to ~1e-13 relative in
float32 — effectively exact for f32 inputs outside astronomically thin
ties (which a consistent evaluation resolves deterministically anyway).

This is the light version of Shewchuk's adaptive robust predicates,
vectorized: fixed two-level expansions, no adaptivity, branch-free.
"""

from __future__ import annotations

import numpy as np


def _split_const(dtype):
    # Dekker splitting constant 2^ceil(p/2)+1: f32 (p=24) -> 2^12+1.
    return {np.dtype(np.float32): 4097.0, np.dtype(np.float64): 134217729.0}[
        np.dtype(dtype)
    ]


def _two_sum(a, b):
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def _two_prod(a, b, sc):
    p = a * b
    a1 = a * sc
    ahi = a1 - (a1 - a)
    alo = a - ahi
    b1 = b * sc
    bhi = b1 - (b1 - b)
    blo = b - bhi
    err = ((ahi * bhi - p) + ahi * blo + alo * bhi) + alo * blo
    return p, err


def _ds_add(xh, xl, yh, yl):
    sh, sl = _two_sum(xh, yh)
    sl = sl + (xl + yl)
    h, l = _two_sum(sh, sl)
    return h, l


def _ds_mul(xh, xl, yh, yl, sc):
    ph, pl = _two_prod(xh, yh, sc)
    pl = pl + (xh * yl + xl * yh)
    h, l = _two_sum(ph, pl)
    return h, l


def _ds_neg(xh, xl):
    return -xh, -xl


def orient2d_ds(a, b, c):
    """Compensated signed twice-area; sign reliable to ~2x working precision.

    Batched over leading axes; inputs [..., 2].
    """
    sc = _split_const(a.dtype)
    acx, acx_e = _two_sum(a[..., 0], -c[..., 0])
    acy, acy_e = _two_sum(a[..., 1], -c[..., 1])
    bcx, bcx_e = _two_sum(b[..., 0], -c[..., 0])
    bcy, bcy_e = _two_sum(b[..., 1], -c[..., 1])
    t1h, t1l = _ds_mul(acx, acx_e, bcy, bcy_e, sc)
    t2h, t2l = _ds_mul(acy, acy_e, bcx, bcx_e, sc)
    h, _ = _ds_add(t1h, t1l, *_ds_neg(t2h, t2l))
    return h


def incircle_ds(a, b, c, d):
    """Compensated 2D incircle determinant (see geometry/_incircle_det).

    Positive iff d strictly inside the circumcircle of CCW (a, b, c);
    multiply by sign(orient2d(a, b, c)) for orientation-free use.
    """
    sc = _split_const(a.dtype)

    def diff(u, v):
        return _two_sum(u, -v)

    adx = diff(a[..., 0], d[..., 0])
    ady = diff(a[..., 1], d[..., 1])
    bdx = diff(b[..., 0], d[..., 0])
    bdy = diff(b[..., 1], d[..., 1])
    cdx = diff(c[..., 0], d[..., 0])
    cdy = diff(c[..., 1], d[..., 1])

    def ds_sq_sum(x, y):
        xh, xl = _ds_mul(x[0], x[1], x[0], x[1], sc)
        yh, yl = _ds_mul(y[0], y[1], y[0], y[1], sc)
        return _ds_add(xh, xl, yh, yl)

    ad2 = ds_sq_sum(adx, ady)
    bd2 = ds_sq_sum(bdx, bdy)
    cd2 = ds_sq_sum(cdx, cdy)

    def ds_mul2(x, y):
        return _ds_mul(x[0], x[1], y[0], y[1], sc)

    def ds_sub2(x, y):
        return _ds_add(x[0], x[1], *_ds_neg(y[0], y[1]))

    # adx*(bdy*cd2 - cdy*bd2) - ady*(bdx*cd2 - cdx*bd2)
    #   + ad2*(bdx*cdy - cdx*bdy)
    m1 = ds_sub2(ds_mul2(bdy, cd2), ds_mul2(cdy, bd2))
    m2 = ds_sub2(ds_mul2(bdx, cd2), ds_mul2(cdx, bd2))
    m3 = ds_sub2(ds_mul2(bdx, cdy), ds_mul2(cdx, bdy))
    t1 = ds_mul2(adx, m1)
    t2 = ds_mul2(ady, m2)
    t3 = ds_mul2(ad2, m3)
    h, l = _ds_add(*ds_sub2(t1, t2), *t3)
    return h
