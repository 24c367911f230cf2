"""Partition-of-unity TPS: the TPU-native "fast RBF method" (README:23).

Global thin-plate systems defy single-precision hardware at scale: the
coefficients grow like h^-2 (1e5+ at 100k sites), so f32 matvecs lose the
answer to cancellation (see rbf._projected_pcg_matfree docstring).  The
TPU-native route to fast large-N thin-plate fitting is PARTITION OF
UNITY: many small, unit-scaled (hence f32-well-conditioned) local TPS
fits, blended by smooth compactly-supported weights — batched dense
solves on the MXU instead of an unstable global Krylov iteration.

Construction (2D):

* Sites are bucketed into a uniform grid of cells (side H); each CELL
  owns a patch whose fit set is its 3x3 cell neighborhood (padded SoA,
  rolled like models/rbf_compact.py — no gathers).
* Every patch solves its local TPS saddle system in coordinates scaled
  to the patch radius (conditioning independent of N) — one batched LU.
* The blend weight of patch p is wendland_c2(|x - c_p| / H).  Since any
  x within H of a patch center lies inside that patch's 3x3 fit block,
  every site is interpolated by EVERY patch active there, so the blend
  s(x) = sum_p w_p s_p(x) / sum_p w_p interpolates all data exactly and
  is C1-smooth.
* Evaluation touches the 3x3 patches around the query's cell: 9 small
  dense kernel sums, batched over queries.

This serves the 100k-site "< 10 s" capability with f32-stable numerics;
the global-weight solver (rbf.RbfInterp solver="pcg") remains the parity
path where f64 is available.
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import rbf
from ..ops import accurate
from ..utils import config, errors

HIGHEST = jax.lax.Precision.HIGHEST
_POISON = 1e7


class PuTps(NamedTuple):
    """Fitted partition-of-unity TPS model (padded SoA)."""

    xs9: jax.Array      # [Gy, Gx, W, 2] per-patch fit sites (poison pads)
    lam: jax.Array      # [Gy, Gx, W] local TPS coefficients
    poly: jax.Array     # [Gy, Gx, 3] local affine tails (in patch coords)
    origin: jax.Array   # [2] grid origin (standardized coords)
    cell: float         # cell side H
    rad: float          # patch coordinate scale (= 1.5 H)
    shift: jax.Array    # [2] raw->standardized shift
    scale: jax.Array    # [2] raw->standardized scale

    @property
    def shape(self):
        return self.xs9.shape[:2]


jax.tree_util.register_pytree_node(
    PuTps,
    lambda m: (
        (m.xs9, m.lam, m.poly, m.origin, m.shift, m.scale),
        (m.cell, m.rad),
    ),
    lambda aux, ch: PuTps(
        xs9=ch[0], lam=ch[1], poly=ch[2], origin=ch[3],
        cell=aux[0], rad=aux[1], shift=ch[4], scale=ch[5],
    ),
)


def _plu_solve_batched(K, rhs):
    """Batched partially-pivoted Gaussian elimination, pure VPU f32.

    jnp.linalg.solve's BATCHED lowering on TPU runs its blocked LU
    updates as bf16 matmuls (the unbatched path does not), which inflates
    ill-conditioned edge-patch coefficients ~1000x — and
    ``default_matmul_precision`` does not reach the LU custom lowering
    (verified: identical HLO).  This eliminates with rank-1 OUTER-PRODUCT
    updates — elementwise VPU ops, exact f32 — at O(W) fori steps over
    [B, W, W] slabs: ~W^3 flops/batch, bandwidth-bound and fast for the
    W~100 patch systems.

    Args:  K [B, W, W], rhs [B, W].  Returns x [B, W].
    """
    B, W, _ = K.shape
    A = jnp.concatenate([K, rhs[..., None]], axis=-1)   # [B, W, W+1]

    def elim(k, A):
        col = jnp.abs(A[:, :, k])
        masked = jnp.where(jnp.arange(W)[None, :] >= k, col, -1.0)
        piv = jnp.argmax(masked, axis=-1)               # [B]
        # swap rows k <-> piv
        rk = jnp.take_along_axis(A, piv[:, None, None], axis=1)[:, 0]
        rp = A[:, k, :]
        A = A.at[:, k, :].set(rk)
        onehot = jnp.arange(W)[None, :] == piv[:, None]
        A = jnp.where(onehot[..., None], rp[:, None, :], A)
        # eliminate below
        pivval = A[:, k, k]
        safe = jnp.where(pivval == 0, 1.0, pivval)
        factors = jnp.where(
            jnp.arange(W)[None, :] > k, A[:, :, k] / safe[:, None], 0.0
        )                                               # [B, W]
        A = A - factors[:, :, None] * A[:, k, None, :]
        return A

    A = jax.lax.fori_loop(0, W, elim, A)

    def back(i, x):
        k = W - 1 - i
        num = A[:, k, W] - jnp.einsum(
            "bj,bj->b", A[:, k, :W], x,
            precision=jax.lax.Precision.HIGHEST,
        )
        diag = A[:, k, k]
        xk = num / jnp.where(diag == 0, 1.0, diag)
        return x.at[:, k].set(xk)

    x = jax.lax.fori_loop(0, W, back, jnp.zeros((B, W), K.dtype))
    return x


def _phi_tps(r):
    safe = jnp.where(r > 0, r, 1.0)
    # accurate.log everywhere: on TPU because jnp.log is only ~2.4e-3
    # accurate there (ops/accurate.py), on CPU because the pure-arithmetic
    # polynomial vectorizes where libm log calls do not.
    return jnp.where(r > 0, r * r * accurate.log(safe), 0.0)


def _neighborhood9(xs_pad, fill=_POISON):
    """[Gy, Gx, 9*cap, d] — each cell's 3x3 block, via rolls (no gathers).

    ``jnp.roll`` WRAPS at the grid border: without masking, an edge
    patch's "neighbor" block contains real sites from the opposite side
    of the domain (distance ~1 in standardized coords), whose phi entries
    (~1e4) wreck the patch system's conditioning — f32 solves of corner
    patches then produce O(10)-size coefficients and 0.1-level eval
    errors.  Wrapped slots are overwritten with ``fill`` (poison for
    coordinates, 0 for values) so the pad-row detection drops them.
    """
    Gy, Gx = xs_pad.shape[:2]
    iy = jnp.arange(Gy)[:, None]
    ix = jnp.arange(Gx)[None, :]
    parts = []
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            rolled = jnp.roll(xs_pad, (-di, -dj), axis=(0, 1))
            ok = (
                (iy + di >= 0) & (iy + di < Gy)
                & (ix + dj >= 0) & (ix + dj < Gx)
            )
            shape = ok.shape + (1,) * (xs_pad.ndim - 2)
            parts.append(
                jnp.where(ok.reshape(shape), rolled, fill)
            )
    return jnp.concatenate(parts, axis=2)


def fit(
    sites,
    values,
    target_per_cell: float = 6.0,
    smooth: float = 0.0,
    chunk: int = 2048,
    dtype=None,
):
    """Fit a partition-of-unity TPS to (sites [N,2], values [N])."""
    sites = np.asarray(sites, np.float64)
    values = np.asarray(values, np.float64)
    n, d = sites.shape
    if d != 2:
        raise errors.InvalidArgumentError("PU-TPS is 2D")
    if values.shape != (n,):
        raise errors.InvalidArgumentError("values shape mismatch")
    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32

    lo, hi = sites.min(0), sites.max(0)
    shift = (lo + hi) / 2.0
    ext = hi - lo
    scale = np.where(ext > 0, 1.0 / np.where(ext > 0, ext, 1), 1.0)
    xs = scale * (sites - shift)

    # Bucket into cells of side H ~ sqrt(target/N).
    from . import rbf_compact

    # Hybrid split: on TPU the batched patch solve runs on the coexisting
    # HOST CPU backend — the TPU's batched LU is bf16-corrupted (see
    # _plu_solve_batched), a W-column scalar solver loop pays this
    # runtime's per-kernel launch cost ~2W times per chunk (tens of
    # seconds), and crucially the host must never read the problem BACK
    # from the device (the axon tunnel downloads at ~0.2 MB/s; uploads
    # run ~100 MB/s).  So the cell grid stays in host memory, the whole
    # patch pipeline runs as one cpu-backend jit (LAPACK-exact f32), and
    # only the results are uploaded.  GSI_TPU_PU_HOST=0 forces the
    # pure-TPU path (_plu_solve_batched).
    on_tpu = jax.devices()[0].platform == "tpu"
    host_path = on_tpu and os.environ.get("GSI_TPU_PU_HOST", "1") != "0"
    use_lapack = host_path

    H = float(np.sqrt(target_per_cell / max(n, 1)))
    grid = rbf_compact.build_cell_grid(xs, rho=H, as_numpy=host_path)
    H = grid.cell_size
    Gy, Gx = grid.shape
    cap = grid.cap
    config.log.info(
        "PU-TPS: grid %dx%d, cap %d (avg %.1f/cell)", Gy, Gx, cap,
        n / (Gy * Gx),
    )
    W = 9 * cap
    rad = 1.5 * H
    origin = np.asarray(grid.origin, np.float64)

    def solve_chunk(args):
        xb, vb, cc = args  # [c, Ws, 2], [c, Ws], [c, 2]
        Ws = xb.shape[1]
        u = (xb - cc[:, None, :]) / rad
        pad_row = jnp.any(jnp.abs(u) > 100.0, axis=-1)  # poison slots
        u = jnp.where(pad_row[..., None], 0.0, u)
        diff = u[:, :, None, :] - u[:, None, :, :]
        r = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
        A = _phi_tps(r)
        keep = ~pad_row
        A = jnp.where(keep[:, :, None] & keep[:, None, :], A, 0.0)
        eye = jnp.eye(Ws, dtype=A.dtype)
        A = A + jnp.where(pad_row[:, :, None], eye, 0.0)
        A = A + smooth * eye
        P = jnp.concatenate(
            [jnp.ones(u.shape[:2] + (1,), A.dtype), u], axis=-1
        )
        P = jnp.where(keep[..., None], P, 0.0)
        top = jnp.concatenate([A, P], axis=2)
        bot = jnp.concatenate(
            [
                jnp.swapaxes(P, 1, 2),
                # tiny negative regularization keeps degenerate patches
                # (e.g. <3 non-collinear sites at the hull edge) solvable
                -1e-8 * jnp.eye(3, dtype=A.dtype)[None].repeat(
                    xb.shape[0], 0
                ),
            ],
            axis=2,
        )
        K = jnp.concatenate([top, bot], axis=1)
        rhs = jnp.concatenate(
            [jnp.where(keep, vb, 0.0), jnp.zeros((xb.shape[0], 3), A.dtype)],
            axis=1,
        )
        if use_lapack:
            # CPU backend: the batched LAPACK LU is exact-f32 there
            sol = jnp.linalg.solve(K, rhs[..., None])[..., 0]
        else:
            sol = _plu_solve_batched(K, rhs)
        lam = sol[:, :Ws] * keep
        poly = sol[:, Ws:]
        return lam, poly

    # Patch width: W = 9*cap is sized by the WORST single cell times 9 —
    # the actual 9-cell neighborhood populations are far smaller (mean
    # ~9*target), and the patch LU costs O(width^3).  When the grid is on
    # the host, compact every neighborhood to the max POPULATED count
    # (exactly the same system minus decoupled identity pad rows; LU is
    # ~5x cheaper at the typical cap).
    if host_path:
        counts = (np.asarray(grid.slot_site) >= 0).sum(-1)  # [Gy, Gx]
        padded = np.pad(counts, 1)
        conv9 = sum(
            padded[1 + di : Gy + 1 + di, 1 + dj : Gx + 1 + dj]
            for di in (-1, 0, 1)
            for dj in (-1, 0, 1)
        )
        W2 = min(W, max(32, int(-(-int(conv9.max()) // 8) * 8)))
    else:
        W2 = W

    def pipeline(xs_pad, v_pad):
        """Neighborhoods + chunked patch solves (runs on either backend)."""
        xs9 = _neighborhood9(xs_pad)              # [Gy, Gx, W, 2]
        v9 = _neighborhood9(v_pad[..., None], fill=0.0)[..., 0]
        cy = origin[0] + (jnp.arange(Gy, dtype=dtype) + 0.5) * H
        cx = origin[1] + (jnp.arange(Gx, dtype=dtype) + 0.5) * H
        centers = jnp.stack(jnp.meshgrid(cy, cx, indexing="ij"), -1)
        xs9f = xs9.reshape(-1, W, 2)
        v9f = v9.reshape(-1, W)
        cf = centers.reshape(-1, 2)
        C = xs9f.shape[0]
        if W2 < W:
            # Stable valid-slots-first compaction to [C, W2]; the model
            # stores the compacted patches (evaluate() is width-agnostic,
            # poison slots carry lam = 0).
            invalid = (xs9f[..., 0] > _POISON / 2).astype(jnp.int32)
            order = jnp.argsort(invalid, axis=1, stable=True)[:, :W2]
            xs9f = jnp.take_along_axis(xs9f, order[..., None], 1)
            v9f = jnp.take_along_axis(v9f, order, 1)
        Wc = xs9f.shape[1]
        padc = (-C) % chunk
        chunked = (
            jnp.concatenate(
                [xs9f, jnp.full((padc, Wc, 2), _POISON, dtype)]
            ).reshape(-1, chunk, Wc, 2),
            jnp.concatenate(
                [v9f, jnp.zeros((padc, Wc), dtype)]
            ).reshape(-1, chunk, Wc),
            jnp.concatenate(
                [cf, jnp.zeros((padc, 2), dtype)]
            ).reshape(-1, chunk, 2),
        )
        lam, poly = jax.lax.map(solve_chunk, chunked)
        xs9 = xs9f.reshape(Gy, Gx, Wc, 2)
        lam = lam.reshape(-1, Wc)[:C].reshape(Gy, Gx, Wc)
        poly = poly.reshape(-1, 3)[:C].reshape(Gy, Gx, 3)
        return xs9, lam, poly

    if host_path:
        # grid arrays are host numpy; everything runs on the CPU backend
        # and only the fitted model is uploaded (~100 MB/s).
        np_dtype = np.dtype(dtype)
        slot = np.asarray(grid.slot_site)
        v_pad_np = np.where(
            slot >= 0, np.asarray(values)[np.clip(slot, 0, n - 1)], 0.0
        ).astype(np_dtype)
        xs9, lam, poly = jax.jit(pipeline, backend="cpu")(
            np.asarray(grid.xs_pad).astype(np_dtype), v_pad_np
        )
        xs9 = jnp.asarray(np.asarray(xs9))
        lam = jnp.asarray(np.asarray(lam))
        poly = jnp.asarray(np.asarray(poly))
        origin_dev = jnp.asarray(origin, dtype)
    else:
        xs_pad = grid.xs_pad.astype(dtype)
        v_pad = rbf_compact.pack_values(grid, jnp.asarray(values, dtype))
        xs9, lam, poly = pipeline(xs_pad, v_pad)
        origin_dev = jnp.asarray(grid.origin, dtype)
    return PuTps(
        xs9=xs9,
        lam=lam,
        poly=poly,
        origin=origin_dev,
        cell=float(H),
        rad=float(rad),
        shift=jnp.asarray(shift, dtype),
        scale=jnp.asarray(scale, dtype),
    )


def evaluate(model: PuTps, q_raw):
    """Blended evaluation at [B, 2] raw queries (jit-able)."""
    dtype = model.xs9.dtype
    q = jnp.atleast_2d(jnp.asarray(q_raw, dtype))
    qs = model.scale * (q - model.shift)
    Gy, Gx = model.shape
    W = model.xs9.shape[2]
    cell = jnp.asarray(model.cell, dtype)
    ij = jnp.floor((qs - model.origin) / cell).astype(jnp.int32)
    iy = jnp.clip(ij[:, 0], 0, Gy - 1)
    ix = jnp.clip(ij[:, 1], 0, Gx - 1)
    xs_flat = model.xs9.reshape(Gy * Gx, W, 2)
    lam_flat = model.lam.reshape(Gy * Gx, W)
    poly_flat = model.poly.reshape(Gy * Gx, 3)
    wend = rbf.KERNELS["wendland_c2"].phi

    num = jnp.zeros(q.shape[0], dtype)
    den = jnp.zeros(q.shape[0], dtype)
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            ny = jnp.clip(iy + di, 0, Gy - 1)
            nx = jnp.clip(ix + dj, 0, Gx - 1)
            valid = ((iy + di) == ny) & ((ix + dj) == nx)
            rowsid = ny * Gx + nx
            ctr = jnp.stack(
                [
                    model.origin[0] + (ny.astype(dtype) + 0.5) * cell,
                    model.origin[1] + (nx.astype(dtype) + 0.5) * cell,
                ],
                -1,
            )
            dq = qs - ctr
            wgt = wend(
                jnp.sqrt(jnp.sum(dq * dq, axis=-1)), 1.0 / cell
            ) * valid
            xb = xs_flat[rowsid]          # [B, W, 2]
            lb = lam_flat[rowsid]         # [B, W]
            pb = poly_flat[rowsid]        # [B, 3]
            u = (qs[:, None, :] - xb) / model.rad
            # poison slots: lam is 0 there, so phi(huge) * 0 needs care —
            # clamp the radius to keep f32 finite.
            r = jnp.minimum(
                jnp.sqrt(jnp.sum(u * u, axis=-1)), jnp.asarray(1e6, dtype)
            )
            uq = dq / model.rad
            s_p = jnp.sum(_phi_tps(r) * lb, axis=-1) + (
                pb[:, 0] + pb[:, 1] * uq[:, 0] + pb[:, 2] * uq[:, 1]
            )
            num = num + wgt * s_p
            den = den + wgt
    return jnp.where(den > 0, num / jnp.where(den > 0, den, 1.0), 0.0)
