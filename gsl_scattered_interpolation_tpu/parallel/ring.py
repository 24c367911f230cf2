"""Ring-parallel compact-RBF: halo exchange over ICI via lax.ppermute.

The SP/ring-attention analog promised in SURVEY §2e/§5: the reference has
no distributed code at all, and sequence parallelism has no direct
counterpart in a scattered-data library — but the compactly-supported RBF
matvec has exactly the ring structure: shard the cell grid's ROW axis
across the mesh, and the 9-cell stencil (models/rbf_compact.py) needs only
each neighbor device's single boundary row per step.  Two `lax.ppermute`
halo exchanges per matvec replace the all_gather of the dense-sharded path
(parallel/sharding.rbf_matvec_sharded) — O(Gx*cap) bytes over ICI instead
of O(N), the same bandwidth win ring attention gets over gathered
attention.

Grid wrap-around halos (device 0 receiving device n-1's last row) need no
masking: wrapped rows are >= (domain - 2 rho) away, outside the compact
support, so phi kills them — matching the single-device jnp.roll trick.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..models import rbf, rbf_compact


def pad_grid_rows(grid: rbf_compact.CellGrid, n_dev: int):
    """Pad the cell grid's row axis to a multiple of n_dev (poison rows)."""
    Gy = grid.xs_pad.shape[0]
    pad = (-Gy) % n_dev
    if pad == 0:
        return grid
    xs_pad = jnp.concatenate(
        [
            grid.xs_pad,
            jnp.full(
                (pad,) + grid.xs_pad.shape[1:],
                rbf_compact._POISON,
                grid.xs_pad.dtype,
            ),
        ],
        axis=0,
    )
    slot = jnp.concatenate(
        [
            grid.slot_site,
            jnp.full((pad,) + grid.slot_site.shape[1:], -1, jnp.int32),
        ],
        axis=0,
    )
    return grid._replace(xs_pad=xs_pad, slot_site=slot)


def _halo_exchange(x_loc, axis):
    """(row_above, row_below) for this device's block via two ppermutes."""
    n = jax.lax.axis_size(axis)
    # my top halo = previous device's last row
    top = jax.lax.ppermute(
        x_loc[-1:], axis, [(i, (i + 1) % n) for i in range(n)]
    )
    # my bottom halo = next device's first row
    bot = jax.lax.ppermute(
        x_loc[:1], axis, [(i, (i - 1) % n) for i in range(n)]
    )
    return top, bot


def matvec_ring(xs_loc, v_loc, phi, eps, smooth, axis):
    """Local rows of (A + smooth I) v with ppermute halo exchange.

    xs_loc: [R, Gx, cap, d] this device's cell rows (padded layout);
    v_loc: [R, Gx, cap].  Returns the local [R, Gx, cap] slice.
    """
    R = xs_loc.shape[0]
    xt, xb = _halo_exchange(xs_loc, axis)
    vt, vb = _halo_exchange(v_loc, axis)
    xs_ext = jnp.concatenate([xt, xs_loc, xb], axis=0)  # [R+2, ...]
    v_ext = jnp.concatenate([vt, v_loc, vb], axis=0)
    out = smooth * v_loc
    for di in (-1, 0, 1):
        xs_n = jax.lax.dynamic_slice_in_dim(xs_ext, 1 + di, R, axis=0)
        v_n = jax.lax.dynamic_slice_in_dim(v_ext, 1 + di, R, axis=0)
        for dj in (-1, 0, 1):
            xs_o = jnp.roll(xs_n, -dj, axis=1)
            v_o = jnp.roll(v_n, -dj, axis=1)
            diff = xs_loc[:, :, :, None, :] - xs_o[:, :, None, :, :]
            d2 = jnp.sum(diff * diff, axis=-1)
            K = phi(jnp.sqrt(d2), eps)
            out = out + jnp.einsum(
                "yxij,yxj->yxi", K, v_o,
                precision=jax.lax.Precision.HIGHEST,
            )
    return out


def fit_cg_ring(
    grid: rbf_compact.CellGrid,
    y_pad,
    mesh,
    kernel: str = "wendland_c2",
    epsilon: float = 8.0,
    smooth: float = 0.0,
    tol: float = 1e-10,
    maxiter: int = 2000,
    axis: str = "sp",
):
    """Distributed CG fit on the row-sharded cell grid.

    Returns the full coefficient vector in padded layout (replicated).
    The grid's row count must divide mesh.shape[axis] (pad_grid_rows).
    """
    phi = rbf.KERNELS[kernel].phi
    n_dev = mesh.shape[axis]
    Gy = grid.xs_pad.shape[0]
    assert Gy % n_dev == 0, (Gy, n_dev)

    def cg_local(xs_loc, slot_loc, y_loc):
        mask = (slot_loc >= 0).astype(y_loc.dtype)

        def dot(a, b):
            return jax.lax.psum(jnp.sum(a * b * mask), axis)

        def mv(v):
            return matvec_ring(xs_loc, v, phi, epsilon, smooth, axis) * mask

        b2 = dot(y_loc, y_loc)
        target = tol * tol * b2

        def cond(state):
            *_, rs, it = state
            return jnp.logical_and(rs > target, it < maxiter)

        def body(state):
            x, r, p, rs, it = state
            Ap = mv(p)
            alpha = rs / dot(p, Ap)
            x = x + alpha * p
            r = r - alpha * Ap
            rs_new = dot(r, r)
            p = r + (rs_new / rs) * p
            return x, r, p, rs_new, it + 1

        x0 = jnp.zeros_like(y_loc)
        x, _, _, rs, it = jax.lax.while_loop(
            cond, body, (x0, y_loc, y_loc, b2, jnp.int32(0))
        )
        return jax.lax.all_gather(x, axis, tiled=True), rs, it

    row_spec = P(axis, None, None)
    fit = jax.jit(
        jax.shard_map(
            cg_local,
            mesh=mesh,
            in_specs=(P(axis, None, None, None), row_spec, row_spec),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )
    )
    lam_pad, rs, it = fit(grid.xs_pad, grid.slot_site, y_pad)
    return lam_pad, float(jnp.sqrt(rs)), int(it)
