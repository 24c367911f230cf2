"""Batched geometric kernels for scattered-data interpolation.

TPU-first rebuild of the geometry inside the reference's scattered engine
(``interpolation/linear_simplex.c``).  Where the reference computes one
barycentric solve or one circumsphere at a time with per-call LU
factorizations (``linear_simplex.c:607-651, 556-605``), every function here
is batched over arbitrary leading axes so XLA can tile thousands of
independent small solves onto the VPU/MXU at once.  The per-simplex LU
*cache* of the reference accelerator (``linear_simplex.h:23-29``) becomes
irrelevant: batching amortizes factorization across queries instead.

All geometry operates in **standardized coordinates** ``scale * (x - shift)``
exactly as the reference does (``linear_simplex.c:574-582, 627-633``), with
the same machine-epsilon tie-break tolerances (parameterized by dtype so the
same code validates in float64 and runs fast in float32 on TPU).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..utils import machine

# ---------------------------------------------------------------------------
# Standardization (linear_simplex.c:141-212)
# ---------------------------------------------------------------------------


def take_rows(table, idx):
    """Gather rows of ``table`` with a multi-dimensional index, flattened.

    Equivalent to ``table[idx]`` but routes through a 1-D index: the TPU
    compiler handles flat gathers in ~1s where the batched-gather
    dimension-numbers form takes minutes at 1e6-scale shapes (measured
    320s -> 1.1s for one op).  Use for every gather whose index has >1
    dimension.
    """
    flat = table[idx.reshape(-1)]
    return flat.reshape(*idx.shape, *table.shape[1:])


def standardize(x, shift, scale):
    """Map raw coordinates to standardized space: scale * (x - shift)."""
    return scale * (x - shift)


def unstandardize(x, shift, scale):
    """Inverse of :func:`standardize` (used on cage vertices, :255-260)."""
    return x / scale + shift


def shift_scale_from_bounds(lo, hi):
    """Per-axis shift/scale from min/max (linear_simplex.c:187-198).

    ``shift = (min+max)/2``; ``scale = 1/(max-min)`` with a last-ditch
    fallback of 1.0 when the extent is non-positive.
    """
    lo = jnp.asarray(lo)
    hi = jnp.asarray(hi)
    shift = (lo + hi) / 2.0
    extent = hi - lo
    scale = jnp.where(extent > 0, 1.0 / jnp.where(extent > 0, extent, 1.0), 1.0)
    return shift, scale


def isotropic_scale(scale):
    """SIMPLEX_TREE_ISOSCALE: all axes use the minimum scale component
    (linear_simplex.c:200-212); shift remains per-axis."""
    return jnp.broadcast_to(jnp.min(scale), jnp.shape(scale))


# ---------------------------------------------------------------------------
# Regular-simplex cage (linear_simplex.c:215-267)
# ---------------------------------------------------------------------------


def regular_simplex(dim: int, dtype=np.float64) -> np.ndarray:
    """Vertices of a regular d-simplex, (d+1, d), unit circumradius.

    The Cartesian-coordinates construction the reference uses
    (linear_simplex.c:215-232): vertex i gets component
    ``sqrt(1 - sum_j<i c_j^2)`` on axis i, and all later vertices share
    ``-(1/d + tot2)/chosen`` on that axis.  Host-side numpy: this is a tiny
    init-time computation.
    """
    s = np.zeros((dim + 1, dim), dtype=np.float64)
    for i in range(dim):
        tot2 = float(np.sum(s[i, :i] ** 2))
        chosen = np.sqrt(1.0 - tot2)
        s[i, i] = chosen
        s[i + 1 :, i] = -(1.0 / dim + tot2) / chosen
    return s.astype(dtype)


def cage_vertices(dim: int, shift, scale, dtype=np.float64) -> np.ndarray:
    """Seed ("cage") vertices in *raw* coordinates, (d+1, d).

    Reproduces linear_simplex.c:234-260: the regular simplex is scaled so
    its insphere radius (altitude/(d+1)) times the blow-up factor
    ``1/root5(eps)`` dwarfs the standardized data range of 0.5, giving
    robustness to moderate outliers; then the inverse shift/scale is applied
    so the cage lives in the user's raw coordinate system.
    """
    s = regular_simplex(dim, np.float64)
    altitude = s[0, 0] - s[1, 0]
    radius = altitude / (dim + 1)
    s = s * (1.0 / (machine.root5_eps(dtype) * radius))
    raw = s / np.asarray(scale, dtype=np.float64) + np.asarray(shift, np.float64)
    return raw.astype(dtype)


# ---------------------------------------------------------------------------
# Barycentric coordinates (linear_simplex.c:607-651)
# ---------------------------------------------------------------------------


def bary_coords(verts_std, q_std):
    """Barycentric coordinates of queries w.r.t. simplexes, batched.

    Args:
      verts_std: [..., d+1, d] standardized vertex coordinates.
      q_std: [..., d] standardized query points.

    Returns:
      (coords, ok): coords [..., d] are the weights of vertices 0..d-1
      (vertex d's weight is ``1 - sum``), matching the reference's
      convention where the simplex-edge matrix columns are
      ``v_i - v_d`` and the RHS is ``q - v_d`` (linear_simplex.c:614-649).
      ok is False where the simplex is numerically singular — reference
      treats that as "query not inside" (linear_simplex.c:641-642,661-663).
    """
    d = verts_std.shape[-1]
    origin = verts_std[..., d, :]
    # M[..., j, i] = (v_i - v_d)[j]  — columns are edge vectors.
    M = jnp.swapaxes(verts_std[..., :d, :] - origin[..., None, :], -1, -2)
    rhs = q_std - origin
    if d == 2:
        coords, ok = _solve2(M, rhs)
    elif d == 3:
        coords, ok = _solve3(M, rhs)
    else:
        coords = jnp.linalg.solve(M, rhs[..., None])[..., 0]
        ok = jnp.all(jnp.isfinite(coords), axis=-1)
        coords = jnp.where(ok[..., None], coords, 0.0)
    return coords, ok


def bary_coords_scaled(verts_raw, q_raw, scale):
    """Barycentric coordinates from RAW vertex/query coords, per-axis scaled.

    Edge vectors are ``scale * (a_raw - b_raw)`` — subtract first, then
    scale.  This is numerically superior to differencing standardized
    coordinates when vertices include the huge cage points, and is the
    formula used by both the host oracle and the device query path (see
    host_tree.SimplexTree._bary for the parity argument; reference formula
    at linear_simplex.c:614-649).
    """
    d = verts_raw.shape[-1]
    origin = verts_raw[..., d, :]
    edges = (verts_raw[..., :d, :] - origin[..., None, :]) * scale
    M = jnp.swapaxes(edges, -1, -2)
    rhs = (q_raw - origin) * scale
    if d == 2:
        return _solve2(M, rhs)
    if d == 3:
        return _solve3(M, rhs)
    coords = jnp.linalg.solve(M, rhs[..., None])[..., 0]
    ok = jnp.all(jnp.isfinite(coords), axis=-1)
    return jnp.where(ok[..., None], coords, 0.0), ok


def _solve2(M, rhs):
    """Closed-form 2x2 solve (Cramer), batched — the d=2 hot path."""
    a, b = M[..., 0, 0], M[..., 0, 1]
    c, d = M[..., 1, 0], M[..., 1, 1]
    det = a * d - b * c
    ok = det != 0
    safe = jnp.where(ok, det, 1.0)
    x = (rhs[..., 0] * d - b * rhs[..., 1]) / safe
    y = (a * rhs[..., 1] - rhs[..., 0] * c) / safe
    zero = jnp.zeros_like(x)
    coords = jnp.stack(
        [jnp.where(ok, x, zero), jnp.where(ok, y, zero)], axis=-1
    )
    return coords, ok


def _solve3(M, rhs):
    """Closed-form 3x3 solve (Cramer), batched — the d=3 hot path."""
    m = M
    c00 = m[..., 1, 1] * m[..., 2, 2] - m[..., 1, 2] * m[..., 2, 1]
    c01 = m[..., 1, 2] * m[..., 2, 0] - m[..., 1, 0] * m[..., 2, 2]
    c02 = m[..., 1, 0] * m[..., 2, 1] - m[..., 1, 1] * m[..., 2, 0]
    det = m[..., 0, 0] * c00 + m[..., 0, 1] * c01 + m[..., 0, 2] * c02
    ok = det != 0
    safe = jnp.where(ok, det, 1.0)
    # Explicit cofactor expansion per column replacement.
    r0, r1, r2 = rhs[..., 0], rhs[..., 1], rhs[..., 2]
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d_, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    detx = r0 * (e * i - f * h) - b * (r1 * i - f * r2) + c * (r1 * h - e * r2)
    dety = a * (r1 * i - f * r2) - r0 * (d_ * i - f * g) + c * (d_ * r2 - r1 * g)
    detz = a * (e * r2 - r1 * h) - b * (d_ * r2 - r1 * g) + r0 * (d_ * h - e * g)
    coords = jnp.stack([detx / safe, dety / safe, detz / safe], axis=-1)
    coords = jnp.where(ok[..., None], coords, 0.0)
    return coords, ok


def contains(coords, ok=None):
    """Exact containment test on bary coords (linear_simplex.c:653-676).

    All coordinates and their sum must lie in [0,1] — the reference uses no
    epsilon slack here; slop is handled by the best-worst-violation fallback
    during point location instead (linear_simplex.c:363-400).
    """
    tot = jnp.sum(coords, axis=-1)
    inside = (
        jnp.all((coords >= 0) & (coords <= 1), axis=-1) & (tot >= 0) & (tot <= 1)
    )
    if ok is not None:
        inside = inside & ok
    return inside


def worst_violation(coords, ok=None):
    """Max out-of-range violation of coords and their sum.

    Mirrors the fallback metric in ``_find_leaf`` (linear_simplex.c:375-390):
    for each coordinate, the amount below 0 or above 1 (whichever applies),
    and likewise for the coordinate sum; the maximum of these.  Singular
    simplexes get +inf so they are never chosen.
    """
    tot = jnp.sum(coords, axis=-1)
    per = jnp.maximum(jnp.maximum(-coords, coords - 1.0), 0.0)
    v = jnp.maximum(
        jnp.max(per, axis=-1), jnp.maximum(jnp.maximum(-tot, tot - 1.0), 0.0)
    )
    if ok is not None:
        v = jnp.where(ok, v, jnp.inf)
    return v


# ---------------------------------------------------------------------------
# Circumsphere (linear_simplex.c:539-605) and in-sphere test (:495-537)
# ---------------------------------------------------------------------------


def circumsphere(verts_std):
    """Circumcenter and squared radius of simplexes, batched.

    The Eickemeyer linear-system formulation the reference cites
    (linear_simplex.c:552-554): row i of the system is ``v_i - v_{i+1}``
    with RHS ``(|v_i|^2 - |v_{i+1}|^2)/2``; the solution is the center, and
    r^2 is the squared distance to vertex 0 (:556-605).

    Returns:
      (center [..., d], r2 [...], ok [...]): ok False marks degenerate
      simplexes (singular system).  Callers treat degenerate as "point is
      inside the sphere" per linear_simplex.c:517-521.
    """
    d = verts_std.shape[-1]
    a = verts_std[..., :d, :] - verts_std[..., 1:, :]
    sq = jnp.sum(verts_std * verts_std, axis=-1)
    b = 0.5 * (sq[..., :d] - sq[..., 1:])
    if d == 2:
        center, ok = _solve2(a, b)
    elif d == 3:
        center, ok = _solve3(a, b)
    else:
        center = jnp.linalg.solve(a, b[..., None])[..., 0]
        ok = jnp.all(jnp.isfinite(center), axis=-1)
        center = jnp.where(ok[..., None], center, 0.0)
    diff = verts_std[..., 0, :] - center
    r2 = jnp.sum(diff * diff, axis=-1)
    return center, r2, ok


def in_sphere(center, r2, ok, q_std, dtype=None):
    """Strict in-circumsphere predicate with the reference's tie-break.

    ``dist2 < r2 * (1 - 10*eps)`` (linear_simplex.c:535-536) shrinks the
    sphere slightly to break degenerate (cospherical) ties; degenerate
    simplexes (ok=False) count as containing everything (:517-521).
    """
    if dtype is None:
        dtype = q_std.dtype
    diff = q_std - center
    dist2 = jnp.sum(diff * diff, axis=-1)
    inside = dist2 < r2 * (1.0 - 10.0 * machine.eps(dtype))
    return jnp.where(ok, inside, True)


# ---------------------------------------------------------------------------
# 2D orientation predicate (device-build flip validity)
# ---------------------------------------------------------------------------


def orient2d(a, b, c):
    """Signed twice-area of triangle (a,b,c), batched over leading axes.

    Positive for counter-clockwise.  Used by the TPU device build to test
    quad convexity before a 2-2 flip — the 2D specialization of the
    reference's Gram-Schmidt ``flippable`` test (edge_flip.c:39-95).
    """
    return (b[..., 0] - a[..., 0]) * (c[..., 1] - a[..., 1]) - (
        b[..., 1] - a[..., 1]
    ) * (c[..., 0] - a[..., 0])
