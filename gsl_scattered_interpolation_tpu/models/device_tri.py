"""Frozen device triangulation + batched point location and evaluation.

This is the TPU-native "forward pass" of the scattered engine: the query
path the reference runs one point at a time through recursive history-DAG
descent with per-node LU solves (``find_leaf``/``interp_point``,
linear_simplex.c:331-402, 678-711) becomes a **lockstep batched visibility
walk** over SoA arrays in HBM:

* The triangulation is exported once into three flat device arrays —
  standardized point coords ``points_std[P, d]``, simplex vertex ids
  ``tri_verts[T, d+1]``, and face-neighbor ids ``tri_nbrs[T, d+1]`` (face k
  is opposite vertex k; -1 = boundary).  Cage (seed) vertices occupy rows
  0..d, data points follow in insertion order, so "is seed" is ``id <= d``
  and the reference's negative-id convention (linear_simplex.h:82-93) is
  not needed on device.
* Point location walks from a start simplex toward the query: compute all
  d+1 barycentric weights, and if any is negative step to the neighbor
  across the most-violated face.  On a Delaunay triangulation this
  visibility walk terminates; a step cap plus best-effort acceptance mirror
  the reference's numerical-slop fallback (linear_simplex.c:398-400).
  All queries advance in lockstep inside one ``lax.while_loop`` — no
  recursion, no data-dependent shapes.
* A uniform spatial **bucket grid** over the standardized data square
  provides O(1) walk starts (the reference has no analog; its DAG descent
  is O(log n) per query and serial).
* Evaluation gathers vertex responses and dots them with the weights; cage
  rows of the response vector are 0, reproducing the fade-to-zero boundary
  (linear_simplex.c:697-706).  Out-of-cage queries evaluate to 0, fixing
  the reference's ``assert(0)`` TODO (linear_simplex.c:344-347).

Precision: in float64 this path matches the host oracle to <1e-11 on the
weather benchmark (the 1e-10 GSL-parity target).  In float32 (the TPU fast
path) values are good to ~5e-6 relative in the data region; on extremely
thin slivers the walk may settle in an adjacent simplex whose weights agree
within f32 noise, bounding the value error by (weight noise) x (response
range).  Use ``DeviceTriangulation.cast`` to pick the trade-off.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import geometry
from ..utils import machine


class DeviceTriangulation(NamedTuple):
    """SoA triangulation ready for jit.

    Both raw and standardized point coordinates are kept: the query path
    forms edge vectors as ``scale*(a_raw - b_raw)`` (subtract-then-scale,
    see ops.geometry.bary_coords_scaled) for cage-safe precision, while the
    standardized copy serves circumsphere geometry and the bucket grid.
    """

    points_raw: jax.Array  # [P, d] float; rows 0..d are cage vertices
    points_std: jax.Array  # [P, d] float, scale*(raw - shift)
    tri_verts: jax.Array   # [T, d+1] int32
    tri_nbrs: jax.Array    # [T, d+1] int32, -1 = boundary face
    # Per-triangle affine weight maps, packed row-major as
    # [A (d*d) | anchor (d) | w_anchor (d)] with
    # coords(q) = A . (q - anchor) + w_anchor.  One row-gather per walk step
    # replaces the reference's per-visited-node LU factorization
    # (linear_simplex.c:616-639) — the bary weights of a FROZEN simplex are
    # an affine function of the query, so all factorization work is done
    # once at freeze time, batched.  The anchor is the smallest-magnitude
    # vertex and w_anchor its exact one-hot weights: evaluating relative to
    # a nearby anchor keeps float32 containment decisions accurate even on
    # the huge cage slivers, where an absolute offset b = -A.v_cage (~1e3)
    # would lose ~1e-4 to fp32 representation alone.
    affine: jax.Array      # [T, d*d + 2*d]
    shift: jax.Array       # [d]
    scale: jax.Array       # [d]
    # Walk-start bucket grid (2D only; size-1 placeholder otherwise).
    grid_tri: jax.Array    # [G, G] int32: a simplex id near each cell
    grid_res: int          # static

    @property
    def dim(self) -> int:
        return self.points_std.shape[-1]

    @property
    def n_tris(self) -> int:
        return self.tri_verts.shape[0]

    def cast(self, dtype) -> "DeviceTriangulation":
        """Cast float fields (e.g. to float32 for the TPU fast path)."""
        return self._replace(
            points_raw=self.points_raw.astype(dtype),
            points_std=self.points_std.astype(dtype),
            affine=self.affine.astype(dtype),
            shift=self.shift.astype(dtype),
            scale=self.scale.astype(dtype),
        )


# Register with grid_res as STATIC aux data so a DeviceTriangulation can be
# a jit ARGUMENT: under the axon remote-compile tunnel, closing over the
# (large) arrays serializes them into the compile request (HTTP 413 at
# scale), while argument arrays stay on device.
jax.tree_util.register_pytree_node(
    DeviceTriangulation,
    lambda t: (tuple(t[:-1]), (t.grid_res,)),
    lambda aux, ch: DeviceTriangulation(*ch, grid_res=aux[0]),
)


def _inv(M):
    """Batched matrix inverse; closed-form adjugate for d<=3 (TPU-f64-safe,
    no LAPACK), general solve otherwise.  Singular -> inf entries (caller
    poisons them)."""
    d = M.shape[-1]
    if d == 1:
        return 1.0 / M
    if d == 2:
        a, b = M[..., 0, 0], M[..., 0, 1]
        c, dd = M[..., 1, 0], M[..., 1, 1]
        det = a * dd - b * c
        adj = jnp.stack(
            [
                jnp.stack([dd, -b], -1),
                jnp.stack([-c, a], -1),
            ],
            -2,
        )
        return adj / jnp.where(det == 0, jnp.nan, det)[..., None, None]
    if d == 3:
        a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
        e, f, g = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
        h, i, j = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
        A = f * j - g * i
        B = -(e * j - g * h)
        C = e * i - f * h
        det = a * A + b * B + c * C
        adj = jnp.stack(
            [
                jnp.stack([A, -(b * j - c * i), b * g - c * f], -1),
                jnp.stack([B, a * j - c * h, -(a * g - c * e)], -1),
                jnp.stack([C, -(a * i - b * h), a * f - b * e], -1),
            ],
            -2,
        )
        return adj / jnp.where(det == 0, jnp.nan, det)[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(d, dtype=M.dtype), M.shape)
    return jnp.linalg.solve(M, eye)


def affine_maps(points_raw, tri_verts, scale, shift=None):
    """Batched per-triangle affine barycentric maps, [T, d*d+2d].

    coords = M^{-1} S (q - v_d) with M the scaled-edge matrix
    (ops.geometry.bary_coords_scaled) and S=diag(scale), rewritten around
    the smallest-magnitude vertex ``anchor`` as
    ``coords(q) = A (q - anchor) + w_anchor`` with A = M^{-1} S and
    w_anchor the anchor's exact one-hot weights.  Degenerate simplexes get
    a poison map (w_anchor = -1e30) so the walk never reports them as
    containing.
    """
    verts = geometry.take_rows(points_raw, tri_verts)  # [T, d+1, d]
    d = verts.shape[-1]
    origin = verts[:, d, :]
    M = jnp.swapaxes((verts[:, :d, :] - origin[:, None, :]) * scale, -1, -2)
    Minv = _inv(M)  # closed-form for d<=3: works in f64 on TPU too
    A = Minv * scale  # right-multiply by diag(scale)
    ok = jnp.all(jnp.isfinite(A), axis=(-2, -1))
    A = jnp.where(ok[:, None, None], A, 0.0)
    # Anchor at the vertex closest to the (shifted) data region.
    center = shift if shift is not None else jnp.zeros(d, verts.dtype)
    mag = jnp.sum((verts - center) ** 2, axis=-1)  # [T, d+1]
    j = jnp.argmin(mag, axis=-1)  # [T]
    anchor = jnp.take_along_axis(verts, j[:, None, None], axis=1)[:, 0, :]
    w_anchor = (j[:, None] == jnp.arange(d)[None, :]).astype(verts.dtype)
    w_anchor = jnp.where(ok[:, None], w_anchor, -1e30)
    return jnp.concatenate(
        [A.reshape(A.shape[0], d * d), anchor, w_anchor], axis=-1
    )


def _bucket_grid(points_std, tri_verts, grid_res: int) -> np.ndarray:
    """Map each cell of the standardized data square to a nearby simplex.

    Cells are seeded with the simplex whose centroid falls there, then
    empty cells are filled by nearest-seeded-cell (host-side BFS dilation;
    this runs once at freeze time).
    """
    centroids = points_std[tri_verts].mean(axis=1)  # [T, d]
    g = np.full((grid_res,) * centroids.shape[1], -1, dtype=np.int32)
    # Standardized data lives in [-0.5, 0.5]^d; clamp cage-reaching
    # centroids onto the boundary cells.
    cells = np.clip(
        ((centroids + 0.5) * grid_res).astype(np.int64), 0, grid_res - 1
    )
    g[tuple(cells.T)] = np.arange(centroids.shape[0], dtype=np.int32)
    # Dilate until full.
    while (g < 0).any():
        newg = g.copy()
        for ax in range(g.ndim):
            for shift in (1, -1):
                cand = np.roll(g, shift, axis=ax)
                # roll wraps; suppress wrapped edge
                sl = [slice(None)] * g.ndim
                sl[ax] = 0 if shift == 1 else -1
                cand[tuple(sl)] = -1
                newg = np.where(newg < 0, cand, newg)
        if (newg == g).all():
            # no seeded cell at all (degenerate); point at simplex 0
            newg[newg < 0] = 0
        g = newg
    return g


def freeze(tree, grid_res: int = 64) -> DeviceTriangulation:
    """Export a host SimplexTree's current leaves to device arrays.

    Point ids are remapped: seed -(k+1) -> k, data id i -> d+1+i (insertion
    order).  Use :func:`reindex_response` to map a user response vector to
    this layout.
    """
    d = tree.dim
    leaves = tree.leaves()
    leaf_of = {node: i for i, node in enumerate(leaves)}

    def pid_map(p):
        return -p - 1 if p < 0 else d + 1 + p

    P = d + 1 + tree.n_points
    raw = np.zeros((P, d))
    raw[: d + 1] = tree.seed_points
    for i in range(tree.n_points):
        raw[d + 1 + i] = tree.point_coords(i)
    pts = tree.scale * (raw - tree.shift)

    T = len(leaves)
    tv = np.zeros((T, d + 1), dtype=np.int32)
    tn = np.full((T, d + 1), -1, dtype=np.int32)
    for i, node in enumerate(leaves):
        tv[i] = [pid_map(int(p)) for p in tree.tri_points[node]]
        for k in range(d + 1):
            nbr = int(tree.tri_links[node, k])
            if nbr != 0:
                tn[i, k] = leaf_of[nbr]

    if d == 2:
        grid = _bucket_grid(pts, tv, grid_res)
    elif d == 3:
        grid_res = _grid_res_3d(T, grid_res)
        grid = _bucket_grid(pts, tv, grid_res)
    else:
        grid = np.zeros((1,) * d, dtype=np.int32)
        grid_res = 1
    return DeviceTriangulation(
        points_raw=jnp.asarray(raw),
        points_std=jnp.asarray(pts),
        tri_verts=jnp.asarray(tv),
        tri_nbrs=jnp.asarray(tn),
        affine=affine_maps(
            jnp.asarray(raw),
            jnp.asarray(tv),
            jnp.asarray(tree.scale),
            shift=jnp.asarray(tree.shift),
        ),
        shift=jnp.asarray(tree.shift),
        scale=jnp.asarray(tree.scale),
        grid_tri=jnp.asarray(grid),
        grid_res=grid_res,
    )


def _grid_device(pts_std, tv, grid_res: int, n_alive: int):
    """Device-side G^d walk-start bucket grid: seed with centroids,
    dilate to fill (the jit analog of :func:`_bucket_grid`, any d)."""
    d = pts_std.shape[-1]
    centroids = geometry.take_rows(pts_std, tv).mean(axis=1)
    cells = jnp.clip(
        ((centroids + 0.5) * grid_res).astype(jnp.int32), 0, grid_res - 1
    )
    flat = cells[:, 0]
    for j in range(1, d):
        flat = flat * grid_res + cells[:, j]
    g = jnp.full(grid_res**d, -1, jnp.int32).at[flat].set(
        jnp.arange(n_alive, dtype=jnp.int32)
    ).reshape((grid_res,) * d)

    def dil_body(g):
        ng = g
        for ax in range(d):
            for s in (1, -1):
                cand = jnp.roll(g, s, axis=ax)  # wraps: mask the edge
                idx = [slice(None)] * d
                idx[ax] = 0 if s == 1 else grid_res - 1
                cand = cand.at[tuple(idx)].set(-1)
                ng = jnp.where(ng < 0, cand, ng)
        return ng

    return jax.lax.while_loop(lambda g: jnp.any(g < 0), dil_body, g)


def _freeze_device_impl(
    points_raw, shift, scale, tri_v, tri_n, alive, n_alive: int, grid_res: int
):
    """Device-side freeze: compaction, neighbor remap, bucket grid (any d).

    The host freeze pulls the [M, d+1] build arrays through the
    device->host tunnel (~0.2 MB/s: ~10s at 2D-1M, ~15s at 3D-10k);
    everything it does is scatter/gather, so at scale it runs on device
    instead.  ``n_alive`` is static — for a completed 2D build it is
    exactly 2*n_sites + 1; the cavity engine reads it back once.
    """
    M, dp1 = tri_v.shape
    kidx = jnp.cumsum(alive.astype(jnp.int32)) - 1
    arange_m = jnp.arange(M, dtype=jnp.int32)
    rows = jnp.zeros(n_alive + 1, jnp.int32).at[
        jnp.where(alive, kidx, n_alive)
    ].set(arange_m, mode="drop")[:n_alive]
    remap = jnp.concatenate(
        [jnp.where(alive, kidx, -1), jnp.full(1, -1, jnp.int32)]
    )
    tv = tri_v[rows]
    tn_old = tri_n[rows]
    tn = remap[jnp.where(tn_old >= 0, tn_old, M).reshape(-1)].reshape(
        n_alive, dp1
    )
    pts_std = scale * (points_raw - shift)
    g = _grid_device(pts_std, tv, grid_res, n_alive)
    aff = affine_maps(points_raw, tv, scale, shift=shift)
    return pts_std, tv, tn, aff, g


_freeze_device = functools.partial(jax.jit, static_argnums=(6, 7))(
    _freeze_device_impl
)

# Back-compat alias (2D name used by older call sites / cache labels).
_freeze_device_2d = _freeze_device


def from_arrays(
    points_raw: np.ndarray,
    shift,
    scale,
    tri_v: np.ndarray,
    tri_n: np.ndarray,
    alive: np.ndarray,
    grid_res: int = 256,
    device_freeze_min: int = 200_000,
) -> DeviceTriangulation:
    """Assemble a DeviceTriangulation from build arrays (device build path).

    Compacts to alive simplexes and remaps neighbor ids; computes affine
    maps and the bucket grid.  ``points_raw`` rows 0..d are the cage.
    At scale (>= ``device_freeze_min`` slots, d <= 3, arrays already on
    device) the whole assembly runs on device via
    :func:`_freeze_device`.
    """
    # 3D gates at 1/4 the slot count: the pull is [M, 4] x 2 arrays and
    # the 3D build allocates ~9 slots/site, so the tunnel cost bites at
    # much smaller site counts than in 2D.
    _min_slots = (
        device_freeze_min if tri_v.shape[1] == 3 else device_freeze_min // 4
    )
    if (
        isinstance(tri_v, jax.Array)
        and tri_v.shape[1] in (3, 4)
        and tri_v.shape[0] >= _min_slots
    ):
        d_ = tri_v.shape[1] - 1
        if d_ == 3:
            grid_res = _grid_res_3d(tri_v.shape[0], grid_res)
        dtype = jnp.zeros(0).dtype  # canonical default float
        raw_dev = jnp.asarray(np.asarray(points_raw, np.float64), dtype)
        sh = jnp.asarray(np.asarray(shift, np.float64), dtype)
        sc = jnp.asarray(np.asarray(scale, np.float64), dtype)
        n_alive = int(jnp.sum(alive.astype(jnp.int32)))
        # Explicit AOT path (utils/aot.py): n_alive is static (it sets
        # the compacted output shape), so every new build size is a new
        # program — load it via trace/lower/compile (~5 s) instead of a
        # fresh jit __call__ (~20 s).
        from ..utils.aot import aot_compile as _aot

        fz = _aot(
            ("freeze_device", n_alive, grid_res, tri_v.shape, str(dtype)),
            lambda n_alive=n_alive, grid_res=grid_res: jax.jit(
                lambda p, s1, s2, tv, tn, al: _freeze_device_impl(
                    p, s1, s2, tv, tn, al, n_alive, grid_res
                )
            ),
            (raw_dev, sh, sc, tri_v, tri_n, alive),
        )
        pts_std, tv, tn, aff, g = fz(
            raw_dev, sh, sc, tri_v, tri_n, alive
        )
        return DeviceTriangulation(
            points_raw=raw_dev,
            points_std=pts_std,
            tri_verts=tv,
            tri_nbrs=tn,
            affine=aff,
            shift=sh,
            scale=sc,
            grid_tri=g,
            grid_res=grid_res,
        )
    points_raw = np.asarray(points_raw, np.float64)
    tri_v = np.asarray(tri_v)
    tri_n = np.asarray(tri_n)
    alive = np.asarray(alive)
    shift = np.asarray(shift, np.float64)
    scale = np.asarray(scale, np.float64)
    d = points_raw.shape[1]

    keep = np.nonzero(alive)[0]
    remap = np.full(tri_v.shape[0] + 1, -1, np.int32)
    remap[keep] = np.arange(keep.size, dtype=np.int32)
    tv = tri_v[keep].astype(np.int32)
    tn = remap[np.where(tri_n[keep] >= 0, tri_n[keep], tri_v.shape[0])]

    pts_std = scale * (points_raw - shift)
    if d == 2:
        grid = _bucket_grid(pts_std, tv, grid_res)
    elif d == 3:
        grid_res = _grid_res_3d(tv.shape[0], grid_res)
        grid = _bucket_grid(pts_std, tv, grid_res)
    else:
        grid = np.zeros((1,) * d, dtype=np.int32)
        grid_res = 1
    return DeviceTriangulation(
        points_raw=jnp.asarray(points_raw),
        points_std=jnp.asarray(pts_std),
        tri_verts=jnp.asarray(tv),
        tri_nbrs=jnp.asarray(tn),
        affine=affine_maps(
            jnp.asarray(points_raw),
            jnp.asarray(tv),
            jnp.asarray(scale),
            shift=jnp.asarray(shift),
        ),
        shift=jnp.asarray(shift),
        scale=jnp.asarray(scale),
        grid_tri=jnp.asarray(grid),
        grid_res=grid_res,
    )


def _grid_res_3d(n_slots: int, grid_res: int) -> int:
    """Cap the 3D walk-start grid: ~one simplex per cell, <= 128^3."""
    auto = int(np.clip(round(n_slots ** (1.0 / 3.0)), 8, 128))
    return min(grid_res, auto) if grid_res > 1 else auto


def response_for_build(shuffle, response, d: int = 2) -> jax.Array:
    """Response vector for a device-built triangulation.

    device_delaunay.triangulate ids: rows 0..d are the cage (response 0),
    data row i holds user row ``shuffle[i]`` (the insertion order).
    """
    response = np.asarray(response, np.float64)
    out = np.zeros(d + 1 + response.shape[0], dtype=response.dtype)
    out[d + 1 :] = response[np.asarray(shuffle)]
    return jnp.asarray(out)


def reindex_response(tree, response) -> jax.Array:
    """User response vector -> device layout [P], cage rows zero.

    Applies the insertion shuffle (linear_simplex.c:699-707): device data
    row i corresponds to user row ``shuffle[i]``.
    """
    d = tree.dim
    response = np.asarray(response, dtype=np.float64)
    out = np.zeros(d + 1 + tree.n_points, dtype=response.dtype)
    out[d + 1 :] = response[tree.shuffle[: tree.n_points]]
    return jnp.asarray(out)


# ---------------------------------------------------------------------------
# Batched point location (visibility walk)
# ---------------------------------------------------------------------------


def _weights(tri: DeviceTriangulation, cur, q_raw):
    """Full d+1 barycentric weights via the per-triangle affine maps."""
    # (row-gather of affine; multi-dim gathers avoided: see geometry.take_rows)
    d = tri.dim
    row = tri.affine[cur]  # [B, d*d+2d] — single row-gather
    anchor = row[..., d * d : d * d + d]
    w0 = row[..., d * d + d :]
    dq = q_raw - anchor
    if d == 2:
        # Unrolled: a batched-2x2 einsum lowers to an MXU matmul padded
        # 2->128 on both contraction dims — ~100ms/Mq of pure padding.
        c0 = row[..., 0] * dq[..., 0] + row[..., 1] * dq[..., 1] + w0[..., 0]
        c1 = row[..., 2] * dq[..., 0] + row[..., 3] * dq[..., 1] + w0[..., 1]
        coords = jnp.stack([c0, c1], axis=-1)
    else:
        A = row[..., : d * d].reshape(*row.shape[:-1], d, d)
        # Elementwise contraction (no einsum): TPU f32 matmuls run bf16.
        coords = jnp.sum(A * dq[..., None, :], axis=-1) + w0
    w = jnp.concatenate(
        [coords, 1.0 - jnp.sum(coords, axis=-1, keepdims=True)], axis=-1
    )
    return w


def locate(
    tri: DeviceTriangulation,
    q_raw,
    start=None,
    max_steps: int = 128,
    tol: float | None = None,
):
    """Batched visibility-walk point location.

    Args:
      q_raw: [B, d] raw query coords.
      start: [B] start simplex ids; defaults to the bucket-grid hint.
      max_steps: lockstep iteration cap (best-effort accept after).
      tol: containment slack on the barycentric weights.  Default is a few
        ulps of the compute dtype; 0.0 would reproduce the reference's
        exact containment test (linear_simplex.c:665-675) but lets
        boundary-straddling queries oscillate between two simplexes in
        float32.  A 2-cycle detector additionally terminates any query
        that revisits its previous simplex (both simplexes then contain
        the query to within fp noise; either answer is correct).

    Returns:
      (leaf [B] int32, weights [B, d+1], in_domain [B] bool).  A query that
      walks off a boundary face (outside the cage) reports in_domain=False
      with its last simplex.
    """
    B = q_raw.shape[0]
    if tol is None:
        tol = 16.0 * machine.eps(q_raw.dtype)
    if start is None:
        start = walk_start(tri, q_raw)
    cur = jnp.asarray(start, jnp.int32)
    prev = jnp.full(B, -1, jnp.int32)
    done = jnp.zeros(B, bool)
    outside = jnp.zeros(B, bool)

    def cond(state):
        cur, prev, done, outside, steps = state
        return jnp.logical_and(steps < max_steps, ~jnp.all(done))

    def body(state):
        cur, prev, done, outside, steps = state
        w = _weights(tri, cur, q_raw)
        worst = jnp.argmin(w, axis=-1)  # most-violated face
        # Cycle breaking beyond period 2: when several faces are violated,
        # odd steps take the SECOND-most-violated face.  A deterministic
        # worst-face walk can orbit a >2-cycle of f32 slivers (observed
        # ~1/1M queries at T=2e6: the walk exhausts its budget and the
        # query is dropped); alternating the face choice is the standard
        # stochastic-walk fix, costing one extra argmin.
        w2 = jnp.where(
            jnp.arange(w.shape[-1]) == worst[..., None], jnp.inf, w
        )
        second = jnp.argmin(w2, axis=-1)
        two_neg = jnp.sum((w < -tol).astype(jnp.int32), axis=-1) > 1
        worst = jnp.where(
            two_neg & ((steps & 1) == 1), second, worst
        ).astype(worst.dtype)
        inside = jnp.all(w >= -tol, axis=-1)
        nbr = jnp.take_along_axis(
            tri.tri_nbrs[cur], worst[:, None], axis=-1
        )[:, 0]
        hit_boundary = (nbr < 0) & ~inside
        cycling = (nbr == prev) & ~inside  # 2-cycle: accept current
        newly_done = inside | hit_boundary | cycling
        step_to = jnp.where(nbr < 0, cur, nbr)
        advance = ~(done | newly_done)
        new_cur = jnp.where(advance, step_to, cur)
        new_prev = jnp.where(advance, cur, prev)
        return (
            new_cur,
            new_prev,
            done | newly_done,
            outside | (hit_boundary & ~done),
            steps + 1,
        )

    cur, prev, done, outside, _ = jax.lax.while_loop(
        cond, body, (cur, prev, done, outside, jnp.int32(0))
    )
    w = _weights(tri, cur, q_raw)
    # A query that exhausted max_steps mid-walk (done=False) has NOT been
    # located — report it out-of-domain rather than silently interpolating
    # from whatever simplex the walk stopped in (one such query per ~1M at
    # T=2e6 caused a 0.17 eval error).  Final containment is re-checked on
    # the weights so a stale `done` can't leak a non-containing simplex.
    contained = jnp.all(w >= -jnp.asarray(tol, w.dtype), axis=-1)
    return cur, w, ~outside & (contained | done)


def locate_dense(tri: DeviceTriangulation, q_raw, block: int | None = None):
    """MXU brute-force point location: score ALL simplexes per query.

    The affine maps make every simplex's weights a linear function of q, so
    all T*(d+1) weights come from ONE matmul ``[B,d] @ [d, T*(d+1)]`` plus
    bias — no gathers, no walk, pure MXU work.  The selected simplex is the
    one whose minimum weight is largest, which degrades gracefully to the
    reference's global best-worst-violation fallback
    (linear_simplex.c:363-400) when fp noise leaves no simplex strictly
    containing the query.  Preferred for T up to ~16k simplexes; beyond
    that the bandwidth of streaming all maps per query block loses to
    :func:`locate` (the walk).

    Returns (leaf [B], weights [B, d+1], in_domain [B]).
    """
    d = tri.dim
    T = tri.n_tris
    if block is None:
        # Size the query block so the [block, T*d] score intermediate
        # stays ~1 GiB (v5e HBM is 16 GiB and XLA keeps a couple of
        # copies live through the reduction) — a fixed 64k block OOMs
        # past ~50k triangles.
        block = max(512, min(65536, (1 << 28) // max(T * d, 1)))
    A = tri.affine[:, : d * d].reshape(T, d, d)
    anchor = tri.affine[:, d * d : d * d + d]
    w0 = tri.affine[:, d * d + d :]
    # W[b, t, i] = A[t] @ (q_b - anchor[t]) + w0[t].  Center queries at the
    # data center (tri.shift) so the matmul operands stay O(data range) —
    # fp32 scores would otherwise lose ~|A|*|q|*eps, flipping the argmax.
    #   W = (q - c0) . A[t].T + (w0[t] + A[t] @ (c0 - anchor[t]))
    c0 = tri.shift
    G2 = jnp.transpose(jnp.swapaxes(A, -1, -2), (1, 0, 2)).reshape(d, T * d)
    bias = (
        # elementwise, not einsum: TPU f32 matmuls run bf16 (CLAUDE.md)
        w0 + jnp.sum(A * (c0 - anchor)[:, None, :], axis=-1)
    ).reshape(T * d)

    def score(qb):
        # precision=HIGHEST: the TPU MXU would otherwise run f32 matmuls as
        # single-pass bf16 (eps ~ 8e-3), scrambling the argmax.
        prod = jnp.matmul(qb - c0, G2, precision=jax.lax.Precision.HIGHEST)
        Wc = (prod + bias).reshape(qb.shape[0], T, d)  # [b, T, d]
        Wlast = 1.0 - jnp.sum(Wc, axis=-1, keepdims=True)
        minw = jnp.minimum(jnp.min(Wc, axis=-1), Wlast[..., 0])  # [b, T]
        best = jnp.argmax(minw, axis=-1).astype(jnp.int32)
        return best

    B = q_raw.shape[0]
    if B <= block:
        best = score(q_raw)
    else:
        pad = (-B) % block
        qp = jnp.concatenate([q_raw, jnp.zeros((pad, d), q_raw.dtype)])
        best = jax.lax.map(
            score, qp.reshape(-1, block, d)
        ).reshape(-1)[:B]
    # Exact (anchored) weights of the winner; accept within a
    # conditioning-aware slack — weights carry ~eps*kappa noise, so sqrt(eps)
    # accepts everything decided correctly up to kappa ~ 1/sqrt(eps).
    w = _weights(tri, best, q_raw)
    tol = 4.0 * machine.sqrt_eps(q_raw.dtype)
    in_domain = jnp.all(w >= -jnp.asarray(tol, w.dtype), axis=-1)
    return best, w, in_domain


def walk_start(tri: DeviceTriangulation, q_raw):
    """G^d bucket-grid walk-start hint (d <= 3); simplex 0 otherwise."""
    if tri.grid_res <= 1 or tri.dim > 3:
        return jnp.zeros(q_raw.shape[0], jnp.int32)
    q_std = geometry.standardize(q_raw, tri.shift, tri.scale)
    cell = jnp.clip(
        ((q_std + 0.5) * tri.grid_res).astype(jnp.int32),
        0,
        tri.grid_res - 1,
    )
    if tri.dim == 2:
        return tri.grid_tri[cell[:, 0], cell[:, 1]]
    return tri.grid_tri[cell[:, 0], cell[:, 1], cell[:, 2]]


# ---------------------------------------------------------------------------
# Cell-candidate point location (the large-T fast path)
# ---------------------------------------------------------------------------


class CellIndex(NamedTuple):
    """Per-cell candidate tables for O(1) exact point location.

    A uniform grid over the standardized data square; every cell lists ALL
    triangles that intersect it (conservative rasterization), each packed
    as 7 floats — the q-centered affine score form (g00,g01,g10,g11,b0,b1)
    plus the triangle id stored as a float (exact for T < 2^24).  One
    [K*7]-float row gather per query replaces the visibility walk: random
    row gathers on this TPU run ~60-160 Mrow/s, an order of magnitude
    above the lockstep walk, and unlike the VMEM-resident Pallas table the
    candidate grid scales to millions of triangles (HBM-resident).

    Coverage guarantee: a query strictly inside a listed cell whose
    containing triangle intersects that cell ALWAYS finds it, so the fast
    path is exact; only overflowed cells (more than K intersecting
    triangles) and out-of-square queries fall back to the walk.
    """

    table: jax.Array     # 2D: [G^2, 7K] f32 packed; 3D packed: [G^3, 13K]
                         # f32; 3D two-stage: [G^3, K] int32 ids
    overflow: jax.Array  # [G^d] bool: candidate list truncated
    hint: jax.Array      # [G^d] int32 walk-start simplex
    res: int             # static grid resolution G
    k: int               # static candidates per cell
    # 3D two-stage layout only (packed table over HBM budget): per-tet
    # q-centered score rows [T, 12] f32 (g 3x3 row-major + bias 3),
    # gathered per candidate in small blocks at query time.
    rows: jax.Array | None = None
    # Static completeness: True iff every simplex/cell intersection is
    # listed (host build, or a device build with zero span-cap /
    # pair-budget drops).  When False, locate_cells routes every
    # not-contained query to the walk — a non-overflow cell's "no
    # candidate contains q" verdict is only exact for complete lists.
    # CAVEAT (measured r5): an INCOMPLETE index's fast path is
    # TOLERANCE-exact, not exact-exact — a query whose true containing
    # simplex was span-cap-dropped can be accepted by a listed
    # neighbor within the f32 containment slack; across a skinny
    # neighbor the value error is then O(slack x weight-gradient).
    # Harmless for interior queries of uniform builds (1M gate vs the
    # complete host index: 6e-8), but data whose hull fringe carries
    # skinny simplexes should use the host build (auto does, below the
    # size threshold) when exact out-of-tolerance behavior matters.
    complete: bool = True


jax.tree_util.register_pytree_node(
    CellIndex,
    lambda c: (
        (c.table, c.overflow, c.hint, c.rows),
        (c.res, c.k, c.complete),
    ),
    lambda aux, ch: CellIndex(
        *ch[:3], res=aux[0], k=aux[1], rows=ch[3], complete=aux[2]
    ),
)


def _qcentered_tables(tri: DeviceTriangulation):
    """(g [T,2,2], bias [T,2]) with coords(q) = g @ (q - shift) + bias.

    The contraction is written ELEMENTWISE (broadcast-multiply + sum),
    never einsum/matmul: on this TPU f32 matmuls run single-pass bf16,
    and a bf16 bias (~1e-2 relative on anchor-offset products) breaks
    the containment scores of every device-built cell table.
    """
    d = tri.dim
    T = tri.n_tris
    A = tri.affine[:, : d * d].reshape(T, d, d)
    anchor = tri.affine[:, d * d : d * d + d]
    w0 = tri.affine[:, d * d + d :]
    bias = w0 + jnp.sum(A * (tri.shift - anchor)[:, None, :], axis=-1)
    return A, bias


def _qcentered_host(tri: DeviceTriangulation):
    """Host-side f64 q-centered score tables.

    Returns ``(g [T,d,d], bias [T,d])`` with
    ``coords(q_raw) = g @ (q_raw - shift) + bias`` — the same form as
    :func:`_qcentered_tables`, but computed from the (already host-fetched)
    standardized vertex coordinates in numpy f64.  This avoids a
    [T, d(d+1)] device->host readback through the axon tunnel (at
    ~0.2 MB/s, 3 MB of rows at 67k tets costs ~16 s) and carries f64
    accuracy into the packed score tables.  Degenerate simplexes get
    ``bias = +1e30`` so their min weight is hugely negative and they can
    never win the argmax (matches the empty-slot convention of the packed
    cell table).
    """
    pts = np.asarray(tri.points_std, np.float64)
    tv = np.asarray(tri.tri_verts)
    scale = np.asarray(tri.scale, np.float64)
    d = pts.shape[1]
    verts = pts[tv]                       # [T, d+1, d] standardized
    origin = verts[:, d, :]               # coords are weights of verts[:d]
    M = np.swapaxes(verts[:, :d, :] - origin[:, None, :], -1, -2)
    if d == 2:
        a, b = M[:, 0, 0], M[:, 0, 1]
        c, dd_ = M[:, 1, 0], M[:, 1, 1]
        det = a * dd_ - b * c
        adj = np.stack(
            [np.stack([dd_, -b], -1), np.stack([-c, a], -1)], -2
        )
    elif d == 3:
        a, b, c = M[:, 0, 0], M[:, 0, 1], M[:, 0, 2]
        e, f, g_ = M[:, 1, 0], M[:, 1, 1], M[:, 1, 2]
        h, i, j = M[:, 2, 0], M[:, 2, 1], M[:, 2, 2]
        A0 = f * j - g_ * i
        B0 = -(e * j - g_ * h)
        C0 = e * i - f * h
        det = a * A0 + b * B0 + c * C0
        adj = np.stack(
            [
                np.stack([A0, -(b * j - c * i), b * g_ - c * f], -1),
                np.stack([B0, a * j - c * h, -(a * g_ - c * e)], -1),
                np.stack([C0, -(a * i - b * h), a * f - b * e], -1),
            ],
            -2,
        )
    else:
        raise NotImplementedError("q-centered host tables are d<=3")
    bad = det == 0
    g_std = adj / np.where(bad, 1.0, det)[:, None, None]
    # q_std - origin = scale*(q - shift) - origin  =>
    # coords = (g_std * scale) @ (q - shift) - g_std @ origin
    g = g_std * scale[None, None, :]
    bias = -np.einsum("tij,tj->ti", g_std, origin)
    g[bad] = 0.0
    bias[bad] = 1e30
    return g, bias


def build_cell_index(
    tri: DeviceTriangulation,
    grid_res: int | None = None,
    K: int = 16,
    method: str = "auto",
) -> CellIndex:
    """Rasterize simplexes into per-cell candidate lists (freeze-time).

    Conservative: every (simplex, cell) intersection is listed.  Small-
    span simplexes use their bbox directly; large-span ones (cage slivers
    whose bbox covers most of the square) get an exact dilated half-plane
    test so they only land in cells they actually touch.  d == 3
    dispatches to :func:`_build_cell_index_3d` (13-float packed rows).

    ``method``: "host" is the original 1-core numpy rasterizer (always
    complete); "device" runs :func:`_device_index_kernel` on the
    accelerator (VERDICT r4 item 3: the host build cost 28.4 s at 2D-1M
    and 23.3 s at 3D against 8.4 s / 2.6 s of TPU query work it gated);
    "auto" picks the device past a size threshold where the host cost
    bites (2D >= 200k simplexes, 3D >= 32k).
    """
    if method == "auto":
        thresh = 200_000 if tri.dim == 2 else 32_768
        method = (
            "device"
            if tri.dim in (2, 3) and tri.n_tris >= thresh
            else "host"
        )
    if method == "device":
        return _build_cell_index_device(tri, grid_res, K)
    if tri.dim == 3:
        # 3D needs a deeper candidate list: measured 13.5% overflow at
        # K=16 vs ~4% at K=24 on 67k uniform tets
        return _build_cell_index_3d(tri, grid_res, max(K, 24))
    if tri.dim != 2:
        raise NotImplementedError("cell index is 2D/3D")
    pts = np.asarray(tri.points_std, np.float64)
    tv = np.asarray(tri.tri_verts)
    T = tv.shape[0]
    if grid_res is None:
        grid_res = int(np.clip(int(np.sqrt(max(T, 1) / 2.0)), 16, 2048))
    G = int(grid_res)
    cell_w = 1.0 / G  # std square is [-0.5, 0.5]^2

    verts = pts[tv]  # [T, 3, 2]
    lo = np.clip(np.floor((verts.min(1) + 0.5) * G).astype(np.int32), 0, G - 1)
    hi = np.clip(np.floor((verts.max(1) + 0.5) * G).astype(np.int32), 0, G - 1)
    span = (hi[:, 0] - lo[:, 0] + 1).astype(np.int64) * (
        hi[:, 1] - lo[:, 1] + 1
    )

    pair_cell = []
    pair_tri = []
    half_diag = cell_w * np.sqrt(0.5) + 1e-12

    def _halfplane_keep(tris_ids, CX, CY):
        """Conservative triangle/cell-center test, vectorized over pairs."""
        a = verts[tris_ids, 0]
        b = verts[tris_ids, 1]
        c = verts[tris_ids, 2]
        area = (b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1]) - (
            b[:, 1] - a[:, 1]
        ) * (c[:, 0] - a[:, 0])
        sgn = np.where(area >= 0, 1.0, -1.0)
        ok = np.ones(tris_ids.shape, bool)
        for p, qv in ((a, b), (b, c), (c, a)):
            ex, ey = qv[:, 0] - p[:, 0], qv[:, 1] - p[:, 1]
            el = np.hypot(ex, ey)
            el = np.where(el == 0, 1.0, el)
            inward = sgn * (ex * (CY - p[:, 1]) - ey * (CX - p[:, 0])) / el
            ok &= inward >= -half_diag
        return ok

    def emit_bbox(mask):
        ids = np.nonzero(mask)[0].astype(np.int32)
        if ids.size == 0:
            return
        nx = (hi[ids, 0] - lo[ids, 0] + 1).astype(np.int64)
        ny = (hi[ids, 1] - lo[ids, 1] + 1).astype(np.int64)
        cnt = nx * ny
        rep = np.repeat(ids, cnt)
        k = np.arange(cnt.sum(), dtype=np.int64) - np.repeat(
            np.cumsum(cnt) - cnt, cnt
        )
        nxr = np.repeat(nx, cnt)
        dx = (k % nxr).astype(np.int32)
        dy = (k // nxr).astype(np.int32)
        cx_i = lo[rep, 0] + dx
        cy_i = lo[rep, 1] + dy
        # Exact-conservative filter: drop bbox cells the triangle does not
        # actually reach (cuts table occupancy ~2x and most overflow).
        CX = (cx_i + 0.5) * cell_w - 0.5
        CY = (cy_i + 0.5) * cell_w - 0.5
        keep = _halfplane_keep(rep, CX, CY)
        pair_tri.append(rep[keep])
        pair_cell.append(
            cx_i[keep].astype(np.int64) * G + cy_i[keep]
        )

    big = span > 4096
    emit_bbox(~big)
    # Exact SCANLINE rasterization for the few huge triangles (cage
    # slivers whose bbox covers most of the grid): per x-row, the
    # half-diagonal-dilated inner half-planes give a closed-form y-cell
    # interval — the band a sliver actually touches is O(G) cells, where
    # the old per-cell meshgrid test was O(G^2) per sliver (a Python loop
    # burning ~20 s of the 1M-site index build).
    big_ids = np.nonzero(big)[0]
    if big_ids.size:
        bv = verts[big_ids]                      # [B, 3, 2]
        area = (bv[:, 1, 0] - bv[:, 0, 0]) * (bv[:, 2, 1] - bv[:, 0, 1]) - (
            bv[:, 1, 1] - bv[:, 0, 1]
        ) * (bv[:, 2, 0] - bv[:, 0, 0])
        sgn = np.where(area >= 0, 1.0, -1.0)
        p = bv                                   # edge tails
        qv = bv[:, [1, 2, 0], :]                 # edge heads
        ex = qv[..., 0] - p[..., 0]              # [B, 3]
        ey = qv[..., 1] - p[..., 1]
        el = np.hypot(ex, ey)
        el = np.where(el == 0, 1.0, el)
        alpha = sgn[:, None] * ex / el           # inward = alpha*CY - beta'
        rows_per = (hi[big_ids, 0] - lo[big_ids, 0] + 1).astype(np.int64)
        rep = np.repeat(np.arange(big_ids.size), rows_per)
        k = np.arange(rows_per.sum(), dtype=np.int64) - np.repeat(
            np.cumsum(rows_per) - rows_per, rows_per
        )
        xrow = lo[big_ids[rep], 0] + k
        CXr = (xrow + 0.5) * cell_w - 0.5        # [R]
        # constraint per edge: alpha*CY >= beta, from
        # sgn*(ex*(CY-py) - ey*(CX-px))/el >= -half_diag
        beta = (
            -half_diag
            + sgn[rep, None] * ey[rep] * (CXr[:, None] - p[rep, :, 0]) / el[rep]
            + alpha[rep] * p[rep, :, 1]
        )                                        # [R, 3]
        al = alpha[rep]
        with np.errstate(divide="ignore", invalid="ignore"):
            lb = np.where(al > 0, beta / al, -np.inf)
            ub = np.where(al < 0, beta / al, np.inf)
        feas_eq = np.all((al != 0) | (beta <= 0), axis=1)
        ylo = lb.max(axis=1)
        yhi = ub.min(axis=1)
        jlo = np.ceil((ylo + 0.5) / cell_w - 0.5).astype(np.int64)
        jhi = np.floor((yhi + 0.5) / cell_w - 0.5).astype(np.int64)
        jlo = np.maximum(jlo, lo[big_ids[rep], 1])
        jhi = np.minimum(jhi, hi[big_ids[rep], 1])
        width = np.where(feas_eq & (ylo <= yhi), jhi - jlo + 1, 0)
        width = np.maximum(width, 0)
        tot = int(width.sum())
        if tot:
            rep2 = np.repeat(np.arange(width.size), width)
            jj = np.arange(tot, dtype=np.int64) - np.repeat(
                np.cumsum(width) - width, width
            )
            pair_tri.append(big_ids[rep[rep2]])
            pair_cell.append(xrow[rep2] * G + jlo[rep2] + jj)

    cells = np.concatenate(pair_cell)
    tris = np.concatenate(pair_tri)
    order = np.argsort(cells, kind="stable")
    cells = cells[order]
    tris = tris[order]
    counts = np.bincount(cells, minlength=G * G)
    starts = np.concatenate([[0], np.cumsum(counts)])
    rank = (np.arange(cells.size, dtype=np.int64) - starts[cells]).astype(
        np.int32
    )
    keep = rank < K
    overflow = counts > K
    rows_k = cells[keep]
    cols_k = rank[keep]
    tri_k = tris[keep]

    # Walk-start hint: the first listed triangle, else the bucket grid's.
    hint = np.full(G * G, -1, np.int32)
    first = cols_k == 0
    hint[rows_k[first]] = tri_k[first]
    empty = hint < 0
    if empty.any():
        fallback = np.asarray(tri.grid_tri).reshape(-1)
        gr = tri.grid_res
        idx = np.arange(G * G)
        gx = (idx // G) * gr // G
        gy = (idx % G) * gr // G
        hint[empty] = fallback[(gx * gr + gy)[empty]]

    # Pack q-centered affine rows + id as float32, FIELD-major within the
    # row (all K g00s, then all K g01s, ...): the query path then slices
    # contiguous [B, K] blocks with no strided relayout.  Empty slots
    # score -inf through the 1e30 bias.
    gmat, bias = _qcentered_host(tri)
    gmat = gmat.astype(np.float32).reshape(T, 4)
    bias = bias.astype(np.float32)
    packed = np.zeros((G * G, 7, K), np.float32)
    packed[:, 4:6, :] = 1e30
    packed[:, 6, :] = -1.0
    for f in range(4):
        packed[rows_k, f, cols_k] = gmat[tri_k, f]
    packed[rows_k, 4, cols_k] = bias[tri_k, 0]
    packed[rows_k, 5, cols_k] = bias[tri_k, 1]
    packed[rows_k, 6, cols_k] = tri_k.astype(np.float32)
    return CellIndex(
        table=jnp.asarray(packed.reshape(G * G, 7 * K)),
        overflow=jnp.asarray(overflow),
        hint=jnp.asarray(hint),
        res=G,
        k=K,
    )


def _build_cell_index_3d(
    tri: DeviceTriangulation, grid_res: int | None = None, K: int = 24
) -> CellIndex:
    """3D cell-candidate index: conservative tet rasterization.

    Two-stage layout: an int32 id table [G^3, K] plus per-tet q-centered
    score rows [T, 12] (gathered per candidate at query time) — the 2D
    packed-floats layout would need G^3*13K floats of HBM.  Small-bbox
    tets emit their bbox cells filtered by an exact box-vs-half-space
    test (per-face margin = the cell box's support on the face normal —
    measured vs the half-diagonal margin: ~15% fewer listed cells);
    big-bbox tets (cage slivers) run the same test chunked so host
    memory stays bounded.  Cells with more than K intersecting tets are
    marked overflow (queries there take the walk fallback), preserving
    the exact-coverage guarantee of the 2D index.
    """
    pts = np.asarray(tri.points_std, np.float64)
    tv = np.asarray(tri.tri_verts)
    T = tv.shape[0]
    if grid_res is None:
        # measured on 67k uniform tets: G = 1.7 T^(1/3) with the support
        # margin gives ~9 avg candidates/cell, <5% overflow at K=24
        grid_res = int(np.clip(
            round(1.7 * max(T, 1) ** (1.0 / 3.0)), 8, 160
        ))
    G = int(grid_res)
    cell_w = 1.0 / G

    verts = pts[tv]  # [T, 4, 3]
    lo = np.clip(
        np.floor((verts.min(1) + 0.5) * G).astype(np.int64), 0, G - 1
    )
    hi = np.clip(
        np.floor((verts.max(1) + 0.5) * G).astype(np.int64), 0, G - 1
    )
    span = np.prod(hi - lo + 1, axis=1)

    # Inward-oriented face planes: face k opposite vertex k; normal
    # scaled to unit length; keep a cell iff its center is within
    # half_diag inside EVERY face (conservative for convex tets).
    normals = np.zeros((T, 4, 3))
    offsets = np.zeros((T, 4))
    face_idx = [(1, 2, 3), (0, 2, 3), (0, 1, 3), (0, 1, 2)]
    for k, (i, j, l) in enumerate(face_idx):
        a, b, c = verts[:, i], verts[:, j], verts[:, l]
        n = np.cross(b - a, c - a)
        ln = np.linalg.norm(n, axis=1)
        ln = np.where(ln == 0, 1.0, ln)
        n = n / ln[:, None]
        # orient toward the opposite vertex
        s = np.sum(n * (verts[:, k] - a), axis=1)
        n = np.where(s[:, None] >= 0, n, -n)
        normals[:, k] = n
        offsets[:, k] = np.sum(n * a, axis=1)

    pair_cell = []
    pair_tri = []

    def emit(ids):
        """Emit (cell, tet) pairs for the given tet ids, chunked."""
        if ids.size == 0:
            return
        nx = hi[ids, 0] - lo[ids, 0] + 1
        ny = hi[ids, 1] - lo[ids, 1] + 1
        nz = hi[ids, 2] - lo[ids, 2] + 1
        cnt = nx * ny * nz
        CH = 8_000_000  # pair-chunk bound: keeps host memory O(CH)
        starts = np.concatenate([[0], np.cumsum(cnt)])
        pos = 0
        while pos < ids.size:
            end = int(
                np.searchsorted(starts, starts[pos] + CH, side="left")
            )
            end = max(end, pos + 1)
            sl = slice(pos, end)
            rep = np.repeat(ids[sl], cnt[sl])
            # cell ordinal within each tet's bbox block
            k = (
                np.arange(rep.size, dtype=np.int64)
                - np.repeat(np.cumsum(cnt[sl]) - cnt[sl], cnt[sl])
            )
            nxr = np.repeat(nx[sl], cnt[sl])
            nyr = np.repeat(ny[sl], cnt[sl])
            dx = k % nxr
            dy = (k // nxr) % nyr
            dz = k // (nxr * nyr)
            cx = lo[rep, 0] + dx
            cy = lo[rep, 1] + dy
            cz = lo[rep, 2] + dz
            C = np.stack(
                [(cx + 0.5) * cell_w - 0.5,
                 (cy + 0.5) * cell_w - 0.5,
                 (cz + 0.5) * cell_w - 0.5], axis=1
            )
            keep = np.ones(rep.size, bool)
            for kf in range(4):
                nrm = normals[rep, kf]
                d_in = np.sum(nrm * C, axis=1) - offsets[rep, kf]
                # exact box/half-space test: margin = support of the
                # half-cell box on the face normal
                margin = 0.5 * cell_w * np.abs(nrm).sum(axis=1) + 1e-12
                keep &= d_in >= -margin
            pair_tri.append(rep[keep].astype(np.int64))
            pair_cell.append(
                (cx[keep] * G + cy[keep]) * G + cz[keep]
            )
            pos = end

    emit(np.nonzero(span <= 4096)[0])
    emit(np.nonzero(span > 4096)[0])

    cells_f = np.concatenate(pair_cell) if pair_cell else np.zeros(0, np.int64)
    tris_f = np.concatenate(pair_tri) if pair_tri else np.zeros(0, np.int64)
    order = np.argsort(cells_f, kind="stable")
    cells_f = cells_f[order]
    tris_f = tris_f[order]
    counts = np.bincount(cells_f, minlength=G * G * G)
    starts = np.concatenate([[0], np.cumsum(counts)])
    rank = (
        np.arange(cells_f.size, dtype=np.int64) - starts[cells_f]
    ).astype(np.int32)
    keep = rank < K
    overflow = counts > K
    rows_k = cells_f[keep]
    cols_k = rank[keep]
    tri_k = tris_f[keep]

    # Walk-start hint: first listed tet, else the bucket grid's.
    hint = np.full(G * G * G, -1, np.int32)
    first = cols_k == 0
    hint[rows_k[first]] = tri_k[first].astype(np.int32)
    empty = hint < 0
    if empty.any():
        gr = tri.grid_res
        fallback = np.asarray(tri.grid_tri).reshape(-1)
        idx = np.arange(G * G * G)
        cx = idx // (G * G)
        cy = (idx // G) % G
        cz = idx % G
        gx = np.minimum(cx * gr // G, gr - 1)
        gy = np.minimum(cy * gr // G, gr - 1)
        gz = np.minimum(cz * gr // G, gr - 1)
        hint[empty] = fallback[((gx * gr + gy) * gr + gz)[empty]]

    gmat, bias = _qcentered_host(tri)
    gmat = gmat.astype(np.float32).reshape(T, 9)
    bias = bias.astype(np.float32)
    # Layout choice.  The packed table replicates each candidate's 12
    # score floats + id into its cell row, FIELD-major ([G^3, 13K]): one
    # contiguous row gather per query, same as the 2D fast path.  It costs
    # G^3*13K floats of HBM, so past a budget (default 1.5 GB, env
    # GSI_CELLS3D_PACKED_BYTES) fall back to the two-stage layout — id
    # table [G^3, K] + per-tet rows [T, 12] — whose query path chunks the
    # candidate-row gather to bound the T(8,128) lane padding of the
    # 12-float minor dim (un-chunked at B=2M, K=24 that padding is a
    # single 24.6 GB allocation: the BENCH_r03 queries_3d OOM).
    packed_bytes = G * G * G * 13 * K * 4
    budget = int(
        os.environ.get("GSI_CELLS3D_PACKED_BYTES", 1_500_000_000)
    )
    if packed_bytes <= budget:
        packed = np.zeros((G * G * G, 13, K), np.float32)
        packed[:, 9:12, :] = 1e30           # empty slots score -inf
        packed[:, 12, :] = -1.0
        for f in range(9):
            packed[rows_k, f, cols_k] = gmat[tri_k, f]
        for f in range(3):
            packed[rows_k, 9 + f, cols_k] = bias[tri_k, f]
        packed[rows_k, 12, cols_k] = tri_k.astype(np.float32)
        return CellIndex(
            table=jnp.asarray(packed.reshape(G * G * G, 13 * K)),
            overflow=jnp.asarray(overflow),
            hint=jnp.asarray(hint),
            res=G,
            k=K,
        )
    ids = np.full((G * G * G, K), -1, np.int32)
    ids[rows_k, cols_k] = tri_k.astype(np.int32)
    rows12 = jnp.asarray(
        np.concatenate([gmat, bias], axis=1)
    )                                                   # [T, 12] f32
    return CellIndex(
        table=jnp.asarray(ids),
        overflow=jnp.asarray(overflow),
        hint=jnp.asarray(hint),
        res=G,
        k=K,
        rows=rows12,
    )


def _device_index_statics(T: int, d: int, grid_res, K):
    """Shared static sizing for the device cell-index build."""
    if d == 2:
        G = (
            int(np.clip(int(np.sqrt(max(T, 1) / 2.0)), 16, 2048))
            if grid_res is None
            else int(grid_res)
        )
        K = int(K)
        span_cap = 64
        pair_budget = 8
    else:
        G = (
            int(np.clip(round(1.7 * max(T, 1) ** (1.0 / 3.0)), 8, 160))
            if grid_res is None
            else int(grid_res)
        )
        K = max(int(K), 24)
        # 3D bbox spans average ~55 cells/tet with a heavy hull/cage-gap
        # tail: an 80/tet budget measured 34% dropped pairs at 67k tets
        # (mass walk fallback, queries_3d 7.9 -> 1.8 Mq/s).  Cap the
        # tail harder (span > 1024 is gap/cage geometry, not interior
        # coverage) and budget for the mean + margin.
        span_cap = 1024
        pair_budget = 128
    P = pair_budget * T
    return G, K, span_cap, P


def _device_index_kernel(
    tri: DeviceTriangulation,
    G: int,
    K: int,
    span_cap: int,
    P: int,
    packed: bool,
    rank: str,
):
    """Jit body of the device cell-index build (2D and 3D).

    The host rasterizer (:func:`build_cell_index`) is 1-core numpy and
    gates the at-scale query configs (28.4 s at 2D-1M, 23.3 s at 3D —
    3-9x the TPU query time it enables, VERDICT r4 item 3).  Every step
    is embarrassingly parallel, so it runs on device:

      1. bbox cell ranges per simplex; simplexes whose bbox exceeds
         ``span_cap`` cells (cage slivers) emit nothing and flag the
         index INCOMPLETE (exactness is preserved by locate_cells'
         walk-everything-not-contained rule for incomplete indexes);
      2. fixed-budget pair expansion [P]: exclusive-cumsum starts, a
         scatter + cummax recovers each pair's owning simplex, modular
         decomposition its cell offset (budget overflow -> incomplete);
      3. conservative simplex/cell filter: per-simplex affine
         coefficients (edge/face normals + support-margin-folded
         offsets) gathered per pair — keep iff the cell center is
         inside every dilated half-space (the same box-support test as
         the host path, unnormalized + fp slack, strictly conservative);
      4. ranking: per-cell candidate slots hold the K lowest simplex
         ids, either by one (cell, pair) sort + segment offsets
         (``rank="sort"``) or K scatter-min/check rounds
         (``rank="minround"``) — both reproduce the host's first-K-by-
         id-order semantics;
      5. packing: one [Pk, NF] row scatter into a row-major table, then
         a single relayout transpose to the query path's field-major
         [G^d, NF*K] form (7 fields in 2D, 13 in 3D; or the two-stage
         int32 id table when ``packed`` is False).

    Returns ``(table, overflow, hint, n_bad[, rows])`` with ``n_bad``
    the dropped simplex/spilled pair count (0 => the index is complete).
    """
    d = tri.dim
    T = tri.n_tris
    dtype = jnp.float32
    cell_w = 1.0 / G
    NC = G**d
    verts = geometry.take_rows(tri.points_std, tri.tri_verts).astype(dtype)
    lo = jnp.clip(
        jnp.floor((verts.min(1) + 0.5) * G).astype(jnp.int32), 0, G - 1
    )
    hi = jnp.clip(
        jnp.floor((verts.max(1) + 0.5) * G).astype(jnp.int32), 0, G - 1
    )
    spans = hi - lo + 1  # [T, d]
    cnt = jnp.prod(spans, axis=1)
    emit = cnt <= span_cap
    cnt_e = jnp.where(emit, cnt, 0)
    starts = jnp.cumsum(cnt_e) - cnt_e
    total = starts[-1] + cnt_e[-1]
    n_bad = jnp.sum((~emit).astype(jnp.int32)) + jnp.maximum(
        total - P, 0
    )

    # 2. pair -> owning simplex: scatter each emitting simplex's id at its
    # start (starts are distinct among emitters), forward-fill by cummax.
    # Budget-overflow note: when total > P the overhang pairs of the
    # last in-budget simplex decompose to junk cells (k_in beyond its
    # span).  Harmless by construction: a junk (cell, simplex) entry can
    # never contain a query of that cell (containment scoring is the
    # backstop), and total > P also sets n_bad > 0 -> the index reports
    # incomplete and every not-contained query walks.
    ok_sc = (cnt_e > 0) & (starts < P)
    own = (
        jnp.zeros(P + 1, jnp.int32)
        .at[jnp.where(ok_sc, starts, P)]
        .max(jnp.arange(T, dtype=jnp.int32), mode="drop")[:P]
    )
    rep = jax.lax.cummax(own)
    pidx = jnp.arange(P, dtype=jnp.int32)
    pvalid = pidx < jnp.minimum(total, P)
    k_in = pidx - starts[rep]
    lo_p = geometry.take_rows(lo, rep)      # [P, d]
    sp_p = geometry.take_rows(spans, rep)
    dx = k_in % sp_p[:, 0]
    r = k_in // sp_p[:, 0]
    if d == 2:
        dy = r
        cxy = jnp.stack([lo_p[:, 0] + dx, lo_p[:, 1] + dy], -1)
        cid = cxy[:, 0] * G + cxy[:, 1]
    else:
        dy = r % sp_p[:, 1]
        dz = r // sp_p[:, 1]
        cxy = jnp.stack(
            [lo_p[:, 0] + dx, lo_p[:, 1] + dy, lo_p[:, 2] + dz], -1
        )
        cid = (cxy[:, 0] * G + cxy[:, 1]) * G + cxy[:, 2]

    # 3. conservative filter.  Per-simplex half-space coefficients with
    # the support margin folded into the offset: keep iff
    # sum_j a_j C_j + c0 >= 0 for every edge/face.
    nfaces = d + 1
    slack = 32.0 * float(np.finfo(np.float32).eps)
    if d == 2:
        a, b, c = verts[:, 0], verts[:, 1], verts[:, 2]
        area = (b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1]) - (
            b[:, 1] - a[:, 1]
        ) * (c[:, 0] - a[:, 0])
        sgn = jnp.where(area >= 0, 1.0, -1.0).astype(dtype)
        coeff = []
        for p_, q_ in ((a, b), (b, c), (c, a)):
            ex = q_[:, 0] - p_[:, 0]
            ey = q_[:, 1] - p_[:, 1]
            ax = -sgn * ey
            ay = sgn * ex
            mag = jnp.abs(ex) + jnp.abs(ey)
            c0 = (
                -sgn * (ex * p_[:, 1] - ey * p_[:, 0])
                + 0.5 * cell_w * mag
                + slack * mag
            )
            coeff.append(jnp.stack([ax, ay, c0], -1))
        face = jnp.concatenate(coeff, -1)  # [T, 9]
    else:
        face_idx = ((1, 2, 3), (0, 2, 3), (0, 1, 3), (0, 1, 2))
        coeff = []
        for kf, (i_, j_, l_) in enumerate(face_idx):
            a, b, c = verts[:, i_], verts[:, j_], verts[:, l_]
            n = jnp.cross(b - a, c - a)
            s = jnp.sum(n * (verts[:, kf] - a), axis=1)
            n = jnp.where(s[:, None] >= 0, n, -n)
            mag = jnp.abs(n).sum(axis=1)
            c0 = (
                -jnp.sum(n * a, axis=1)
                + 0.5 * cell_w * mag
                + slack * mag
            )
            coeff.append(jnp.concatenate([n, c0[:, None]], -1))
        face = jnp.concatenate(coeff, -1)  # [T, 16]
    fc = geometry.take_rows(face, rep)      # [P, nfaces*(d+1)]
    Cc = (cxy.astype(dtype) + 0.5) * cell_w - 0.5  # [P, d]
    keep = pvalid
    for kf in range(nfaces):
        blk = fc[:, kf * (d + 1) : (kf + 1) * (d + 1)]
        v = blk[:, d]
        for j in range(d):
            v = v + blk[:, j] * Cc[:, j]
        keep = keep & (v >= 0)

    cidk = jnp.where(keep, cid, NC)

    # 4. ranking -> per-pair column (col < K wins a table slot).
    if rank == "sort":
        # One sort + run-position ranking: rank within cell = position
        # minus the cummax-propagated run start.  (Replaces the
        # histogram+cumsum+gather starts — the hist alone cost ~0.16 s
        # at P=24M where the cummax is ~10 ms.)
        skey, sval = jax.lax.sort((cidk, pidx), num_keys=1)
        iota = jnp.arange(P, dtype=jnp.int32)
        newrun = jnp.concatenate(
            [jnp.ones(1, bool), skey[1:] != skey[:-1]]
        )
        runstart = jax.lax.cummax(jnp.where(newrun, iota, -1))
        srank = jnp.minimum(iota - runstart, K)
        col = (
            jnp.full(P, K, jnp.int32)
            .at[sval]
            .set(jnp.where(skey < NC, srank, K))
        )
    else:  # K scatter-min rounds: pairs are simplex-id ordered, so the
        # K smallest pair ids per cell == the host's first-K semantics.
        col = jnp.full(P, K, jnp.int32)
        placed = ~keep
        for kk in range(K):
            cand = jnp.where(placed, INT32_MAX, pidx)
            slot = (
                jnp.full(NC + 1, INT32_MAX, jnp.int32)
                .at[cidk]
                .min(cand)
            )
            win = ~placed & (slot[cidk] == pidx)
            col = jnp.where(win, kk, col)
            placed = placed | win
    got = keep & (col < K)
    # Overflow = any kept pair ranked past the K slots of its cell.
    overflow = (
        jnp.zeros(NC + 1, bool)
        .at[jnp.where(keep & (col >= K), cid, NC)]
        .set(True)[:NC]
    )
    rowidx = jnp.where(got, cid * K + col, NC * K)

    # 5. score fields + packing.
    A, bias = _qcentered_tables(tri)
    A = A.astype(dtype).reshape(T, d * d)
    bias = bias.astype(dtype)
    tid_f = jnp.arange(T, dtype=dtype)[:, None]
    score = jnp.concatenate([A, bias, tid_f], -1)  # [T, NF]
    NF = d * d + d + 1
    # hint: the col==0 winner, else the walk-start bucket grid's simplex.
    hint = (
        jnp.full(NC + 1, -1, jnp.int32)
        .at[jnp.where(got & (col == 0), cid, NC)]
        .set(rep, mode="drop")[:NC]
    )
    gr = tri.grid_res
    idx = jnp.arange(NC, dtype=jnp.int32)
    if d == 2:
        gx = (idx // G) * gr // G
        gy = (idx % G) * gr // G
        fb = tri.grid_tri.reshape(-1)[gx * gr + gy]
    else:
        cx = idx // (G * G)
        cy = (idx // G) % G
        cz = idx % G
        gx = jnp.minimum(cx * gr // G, gr - 1)
        gy = jnp.minimum(cy * gr // G, gr - 1)
        gz = jnp.minimum(cz * gr // G, gr - 1)
        fb = tri.grid_tri.reshape(-1)[(gx * gr + gy) * gr + gz]
    hint = jnp.where(hint >= 0, hint, fb)

    if not packed:
        ids = (
            jnp.full(NC * K + 1, -1, jnp.int32)
            .at[rowidx]
            .set(rep, mode="drop")[: NC * K]
            .reshape(NC, K)
        )
        return ids, overflow, hint, n_bad, score[:, : NF - 1]
    init_row = jnp.zeros(NF, dtype).at[d * d : d * d + d].set(1e30)
    init_row = init_row.at[NF - 1].set(-1.0)
    table_rm = jnp.broadcast_to(init_row, (NC * K + 1, NF)).at[
        rowidx
    ].set(geometry.take_rows(score, rep), mode="drop")[: NC * K]
    table = (
        table_rm.reshape(NC, K, NF)
        .transpose(0, 2, 1)
        .reshape(NC, NF * K)
    )
    return table, overflow, hint, n_bad


INT32_MAX = np.iinfo(np.int32).max


@jax.jit
def _canon_copy(t):
    """Force the default (row-major) device layout via a scatter copy."""
    return jnp.zeros_like(t).at[:, :].set(t)


def _build_cell_index_device(
    tri: DeviceTriangulation,
    grid_res: int | None = None,
    K: int = 16,
    rank: str = "sort",
    pair_budget_override: int | None = None,
) -> CellIndex:
    """Device-side cell-candidate index build (see _device_index_kernel).

    Chooses the packed vs two-stage 3D layout by the same HBM budget as
    the host path; reads back ONE scalar (the drop count) to set the
    static ``complete`` flag honestly.
    """
    from ..utils.aot import aot_compile as _aot

    d = tri.dim
    T = tri.n_tris
    G, K, span_cap, P = _device_index_statics(T, d, grid_res, K)
    if pair_budget_override is not None:
        # test hook: force budget spill (the r5 3D regression class —
        # silently dropped pairs must flag incomplete, never mislocate)
        P = pair_budget_override * T
    packed = True
    if d == 3:
        packed = G**3 * 13 * K * 4 <= int(
            os.environ.get("GSI_CELLS3D_PACKED_BYTES", 1_500_000_000)
        )

    def make():
        @jax.jit
        def run(tri):
            return _device_index_kernel(
                tri, G, K, span_cap, P, packed, rank
            )

        return run

    fn = _aot(
        ("cell_index_dev", d, T, G, K, span_cap, P, packed, rank,
         tri.grid_res, str(tri.points_std.dtype)),
        make,
        (tri,),
    )
    out = fn(tri)
    if packed:
        table, overflow, hint, n_bad = out
        rows = None
        # Canonical-layout copy: XLA gives the build's transposed output
        # a K-minor physical layout, and every query-time row gather then
        # pays a relayout (~12% measured at 600k tris).  One extra
        # streaming pass restores the default layout.
        table = _canon_copy(table)
    else:
        table, overflow, hint, n_bad, rows = out
    complete = int(n_bad) == 0  # one ~0.5s readback; also syncs the build
    return CellIndex(
        table=table,
        overflow=overflow,
        hint=hint,
        res=G,
        k=K,
        rows=rows,
        complete=complete,
    )


def _locate_cells_score_3d(tri, cells, q_raw):
    """[B] 3D candidate scoring, internally chunked for HBM safety.

    Packed layout (``rows is None``): one contiguous [B0, 13K] row gather
    per query block, sliced field-major exactly like the 2D path.
    Two-stage layout: a [B0, K] id gather plus a [B0*K, 12] candidate-row
    gather per block.  Both are chunked with ``lax.map`` — the TPU
    T(8,128) tiling pads a 12-float minor dim to 128 lanes, so an
    un-chunked two-stage gather at B=2M, K=24 materializes f32[48M, 128]
    = 24.6 GB (the BENCH_r03 queries_3d OOM); block sizes below keep every
    padded intermediate under ~200 MB.
    """
    G = cells.res
    K = cells.k
    dtype = q_raw.dtype
    B = q_raw.shape[0]
    q_std = geometry.standardize(q_raw, tri.shift, tri.scale)
    cell = jnp.clip(
        jnp.floor((q_std + 0.5) * G).astype(jnp.int32), 0, G - 1
    )
    cid = (cell[:, 0] * G + cell[:, 1]) * G + cell[:, 2]
    dq_all = q_raw - tri.shift.astype(dtype)            # [B, 3]
    packed = cells.rows is None

    def score_block(args):
        cid_b, dq = args
        if packed:
            rows = cells.table[cid_b].astype(dtype)     # [B0, 13K] gather
            fld = [rows[:, f * K : (f + 1) * K] for f in range(13)]
            tid_f = fld[12]
            ok = tid_f >= 0
        else:
            tid = cells.table[cid_b]                    # [B0, K] int32
            ok = tid >= 0
            r = geometry.take_rows(
                cells.rows, jnp.where(ok, tid, 0).reshape(-1)
            ).astype(dtype)                             # [B0*K, 12]
            fld = [
                r[:, f].reshape(tid.shape) for f in range(12)
            ]
        dqx = dq[:, 0:1]
        dqy = dq[:, 1:2]
        dqz = dq[:, 2:3]
        c0 = fld[0] * dqx + fld[1] * dqy + fld[2] * dqz + fld[9]
        c1 = fld[3] * dqx + fld[4] * dqy + fld[5] * dqz + fld[10]
        c2 = fld[6] * dqx + fld[7] * dqy + fld[8] * dqz + fld[11]
        minw = jnp.minimum(
            jnp.minimum(jnp.minimum(c0, c1), c2), 1.0 - c0 - c1 - c2
        )
        minw = jnp.where(ok, minw, -jnp.inf)
        best = jnp.argmax(minw, axis=-1)
        bestw = jnp.take_along_axis(minw, best[:, None], -1)[:, 0]
        if packed:
            leaf = jnp.maximum(
                jnp.take_along_axis(tid_f, best[:, None], -1)[:, 0], 0.0
            ).astype(jnp.int32)
        else:
            leaf = jnp.maximum(
                jnp.take_along_axis(tid, best[:, None], -1)[:, 0], 0
            )
        return leaf, bestw

    # Packed rows are 13K floats (~150 MB/block at 2^18, K=24); two-stage
    # blocks carry the 12->128 lane padding (~100 MB/block at 2^13, K=24).
    block = 262144 if packed else 8192
    if B <= block:
        leaf, bestw = score_block((cid, dq_all))
    else:
        pad = (-B) % block
        cid_p = jnp.concatenate([cid, jnp.zeros(pad, cid.dtype)])
        dq_p = jnp.concatenate(
            [dq_all, jnp.zeros((pad, 3), dq_all.dtype)]
        )
        leaf, bestw = jax.lax.map(
            score_block,
            (cid_p.reshape(-1, block), dq_p.reshape(-1, block, 3)),
        )
        leaf = leaf.reshape(-1)[:B]
        bestw = bestw.reshape(-1)[:B]
    return cid, leaf, bestw, q_std


def locate_cells(
    tri: DeviceTriangulation,
    cells: CellIndex,
    q_raw,
    fallback_frac: int = 16,
    fallback: str = "auto",
    fallback_steps: int = 32,
):
    """Exact batched location: one candidate-row gather + walk fallback.

    Returns (leaf [B], weights [B, d+1], in_domain [B]).  Queries whose
    cell overflowed or that no candidate contains (out-of-square, walked
    off the hull, capacity-truncated lists) are re-located by the
    visibility walk — compacted to a fixed buffer of B/fallback_frac slots
    when few, or a full masked walk when many, so the result is exact
    either way.
    """
    B = q_raw.shape[0]
    G = cells.res
    K = cells.k
    dtype = q_raw.dtype
    if tri.dim == 3:
        cid, leaf, bestw, q_std = _locate_cells_score_3d(tri, cells, q_raw)
    else:
        q_std = geometry.standardize(q_raw, tri.shift, tri.scale)
        cell = jnp.clip(
            jnp.floor((q_std + 0.5) * G).astype(jnp.int32), 0, G - 1
        )
        cid = cell[:, 0] * G + cell[:, 1]
        rows = cells.table[cid].astype(dtype)  # ONE [B, 7K] gather
        g00 = rows[:, 0 * K : 1 * K]
        g01 = rows[:, 1 * K : 2 * K]
        g10 = rows[:, 2 * K : 3 * K]
        g11 = rows[:, 3 * K : 4 * K]
        b0 = rows[:, 4 * K : 5 * K]
        b1 = rows[:, 5 * K : 6 * K]
        tid = rows[:, 6 * K : 7 * K]
        qx = (q_raw[:, 0] - tri.shift[0].astype(dtype))[:, None]
        qy = (q_raw[:, 1] - tri.shift[1].astype(dtype))[:, None]
        c0 = g00 * qx + g01 * qy + b0
        c1 = g10 * qx + g11 * qy + b1
        minw = jnp.minimum(jnp.minimum(c0, c1), 1.0 - c0 - c1)
        minw = jnp.where(tid >= 0, minw, -jnp.inf)
        best = jnp.argmax(minw, axis=-1)
        take = lambda a: jnp.take_along_axis(a, best[:, None], -1)[:, 0]
        bestw = take(minw)
        leaf = jnp.maximum(take(tid), 0.0).astype(jnp.int32)
    # Selection used the f32 q-centered tables; the returned weights come
    # from the anchored affine maps in the query dtype (one cheap row
    # gather) so f64 callers keep full precision.
    w = _weights(tri, leaf, q_raw)
    # Containment from the f32 score tables needs an f32-scaled slack —
    # judging f32 scores with an f64 tolerance rejects genuinely-inside
    # boundary queries.  The anchored weights are then re-judged at the
    # query dtype's tolerance.
    score_dtype = (
        cells.rows.dtype if cells.rows is not None else cells.table.dtype
    )
    tol_score = 4.0 * machine.sqrt_eps(score_dtype)
    tol_w = jnp.asarray(4.0 * machine.sqrt_eps(dtype), dtype)
    contained = bestw >= -jnp.asarray(tol_score, dtype)
    w_ok = jnp.all(w >= -tol_w, axis=-1)
    # A non-overflowed cell's candidate list is COMPLETE for queries
    # inside that cell, so there a not-contained verdict is exact (the
    # query is outside every triangle).  The walk handles: overflow-cell
    # and out-of-square misses (clamped to a boundary cell they are not
    # inside — e.g. cage-region points of a native build), plus queries
    # where the f32 score and the query-dtype weights disagree (boundary
    # noise).  An INCOMPLETE index (device build with span-cap/budget
    # drops — see _build_cell_index_device) cannot certify "outside":
    # every not-contained query walks instead.
    outside_sq = jnp.any(jnp.abs(q_std) > 0.5, axis=-1)
    if cells.complete:
        bad = ((cells.overflow[cid] | outside_sq) & ~contained) | (
            contained & ~w_ok
        )
    else:
        bad = ~(contained & w_ok)
    in_domain = contained & w_ok

    if fallback == "none":
        # Fast path only: not-contained queries report in_domain=False.
        return leaf, w, in_domain

    nbad = jnp.sum(bad.astype(jnp.int32))
    start_hint = cells.hint[cid]

    def make_few(cap):
        def fallback_few(args):
            leaf, w, in_domain = args
            idx = jnp.nonzero(bad, size=cap, fill_value=0)[0]
            sub_leaf, sub_w, sub_in = locate(
                tri, q_raw[idx], start=start_hint[idx],
                max_steps=fallback_steps,
            )
            sub_in = sub_in & jnp.all(sub_w > -0.5, axis=-1)
            # fill_value rows recompute query 0 — same result, harmless.
            return (
                leaf.at[idx].set(sub_leaf),
                w.at[idx].set(sub_w),
                in_domain.at[idx].set(sub_in),
            )

        return fallback_few

    def fallback_many(args):
        leaf_w, w_w, in_w = locate(
            tri, q_raw, start=start_hint, max_steps=fallback_steps
        )
        in_w = in_w & jnp.all(w_w > -0.5, axis=-1)
        keep = ~bad
        leaf, w, in_domain = args
        return (
            jnp.where(keep, leaf, leaf_w),
            jnp.where(keep[:, None], w, w_w),
            jnp.where(keep, in_domain, in_w),
        )

    # Tiered compaction: tiny buffer for the common sub-1% fallback rate,
    # a middle one for the ~1% regime (walking a B/16 buffer for 30k
    # misses costs ~3x the whole locate), the big buffer at cap, full
    # masked walk beyond.
    cap_small = max(min(1024, B), B // 256)
    cap_mid = max(min(8192, B), B // 64)
    cap_big = max(min(65536, B), B // fallback_frac)

    leaf, w, in_domain = jax.lax.cond(
        nbad == 0,
        lambda args: args,
        lambda args: jax.lax.cond(
            nbad <= cap_small,
            make_few(cap_small),
            lambda args2: jax.lax.cond(
                nbad <= cap_mid,
                make_few(cap_mid),
                lambda args3: jax.lax.cond(
                    nbad <= cap_big, make_few(cap_big), fallback_many, args3
                ),
                args2,
            ),
            args,
        ),
        (leaf, w, in_domain),
    )
    return leaf, w, in_domain


# ---------------------------------------------------------------------------
# Batched evaluation
# ---------------------------------------------------------------------------


# Below this many simplexes, brute-force scoring beats the gather-bound
# walk (measured: pallas 13 Mq/s at T=4k scaling ~1/T, walk ~3.3 Mq/s flat
# out to T=2M; crossover ~16k).
DENSE_LOCATE_MAX_TRIS = 16384
PALLAS_LOCATE_MAX_TRIS = 16384


def vertex_responses(tri: DeviceTriangulation, response_ext) -> jax.Array:
    """Per-triangle response triplets [T, d+1].

    Precompute once per response vector and pass to :func:`interp` as
    ``resp_tri``: evaluation then needs a single [B, d+1] row gather
    instead of two chained gathers per query batch.
    """
    return geometry.take_rows(response_ext[:, None], tri.tri_verts)[..., 0]


def interp(
    tri: DeviceTriangulation,
    response_ext,
    q_raw,
    max_steps: int = 256,
    method: str = "auto",
    cells: CellIndex | None = None,
    resp_tri=None,
):
    """Barycentric interpolation at raw query points, batched.

    The device analog of find_leaf + interp_point
    (linear_simplex.c:331-402, 678-711): responses at cage rows are zero
    (see :func:`reindex_response`), giving the reference's fade-to-zero
    behavior near/outside the data hull; out-of-cage queries return 0.

    method: "auto" picks the cell-candidate index when ``cells`` is
    supplied (the at-scale path: build once via :func:`build_cell_index`),
    else the Pallas VMEM kernel on TPU (2D, tables fit VMEM), else MXU
    brute force (:func:`locate_dense`) for small triangulations, else the
    visibility walk (:func:`locate`); "cells"/"dense"/"walk"/"pallas"
    force a path.
    """
    if method == "auto":
        on_tpu = jax.devices()[0].platform == "tpu"
        if cells is not None and tri.dim in (2, 3):
            method = "cells"
        elif (
            on_tpu
            and tri.dim == 2
            and tri.n_tris <= PALLAS_LOCATE_MAX_TRIS
        ):
            method = "pallas"
        elif tri.n_tris <= DENSE_LOCATE_MAX_TRIS:
            method = "dense"
        else:
            method = "walk"
    if method == "cells":
        if cells is None:
            raise ValueError(
                "method='cells' requires a CellIndex (build_cell_index)"
            )
        leaf, w, in_domain = locate_cells(tri, cells, q_raw)
    elif method == "pallas":
        from ..ops import pallas_locate

        leaf = pallas_locate.locate_dense_pallas(tri, q_raw)
        w = _weights(tri, leaf, q_raw)
        tol = 4.0 * machine.sqrt_eps(q_raw.dtype)
        in_domain = jnp.all(w >= -jnp.asarray(tol, w.dtype), axis=-1)
    elif method == "dense":
        leaf, w, in_domain = locate_dense(tri, q_raw)
    else:
        leaf, w, in_domain = locate(tri, q_raw, max_steps=max_steps)
        # Best-effort acceptance after a capped/cycled walk can leave wildly
        # violating weights (e.g. a query stuck at a degenerate simplex);
        # treat those as out-of-domain rather than emitting garbage.
        in_domain = in_domain & jnp.all(w > -0.5, axis=-1)
    if resp_tri is not None:
        vals = resp_tri[leaf]  # [B, d+1] — one row gather
    else:
        vals = geometry.take_rows(
            response_ext[:, None], tri.tri_verts[leaf]
        )[..., 0]  # [B, d+1]
    out = jnp.sum(w * vals, axis=-1)
    return jnp.where(in_domain, out, 0.0)
