"""Compactly-supported ("fast") RBF at scale: cell-list Wendland fitting.

The reference README plans "compactly supported radial basis functions"
and "fast RBF interpolation" (README:22-23) but implements neither.  The
dense path in :mod:`rbf` treats Wendland like any kernel — an O(N^2)
matvec that cannot reach the 1M-site north-star config.  This module is
the TPU-native design that exploits compact support:

* **Cell-list structure** (built once at fit): sites are bucketed into a
  uniform grid whose cell size equals the support radius ``rho = 1/eps``,
  sorted by cell, and padded to a fixed per-cell capacity — an SoA layout
  ``[n_cells_y, n_cells_x, cap, d]``.  Pad slots hold far-away poison
  coordinates, so ``phi = 0`` kills them with no masking.
* **Dense 9-stencil matvec**: a site only interacts with its own and the
  8 adjacent cells.  For each of the 9 offsets the neighbor block is a
  ``jnp.roll`` of the padded array (pure data movement, no gathers), and
  the contribution is one batched ``[C, cap, cap] x [C, cap]`` contraction
  — MXU-shaped batched matmuls instead of sparse scatter/gathers.  Grid
  wrap-around needs no masking either: wrapped pairs are >= (domain -
  2 rho) apart, outside the support.  Total work is O(N * avg_neighbors),
  not O(N^2).
* **CG solver** on the (strictly PD) compact kernel, entirely jit-able;
  the multi-device ring variant lives in parallel/ring.py (halo exchange
  via lax.ppermute — the SP/ring-attention analog of SURVEY §2e).
* **Evaluation** buckets queries into the same grid and sums the 9
  neighboring cells' contributions per query — one [B, 9*cap] weight
  contraction.

Reference anchors: the Cholesky its dependency closure carried for the
planned RBF path (linalg/gsl_linalg.h:471-474); kernel definition matches
rbf.KERNELS["wendland_c2"] exactly.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import rbf
from ..utils import aot, config, errors, machine

HIGHEST = jax.lax.Precision.HIGHEST
# Pad-slot coordinate: far outside any standardized data range so every
# distance leaves the compact support.  Must stay f32-SAFE under squaring:
# 1e30 would overflow to inf and produce 0*inf = NaN inside wendland.
_POISON = 1e8


class CellGrid(NamedTuple):
    """Padded cell-list layout of standardized sites."""

    xs_pad: jax.Array    # [Gy, Gx, cap, d] site coords (poison in pads)
    slot_site: jax.Array  # [Gy, Gx, cap] original site row or -1 (pads)
    n_sites: int
    cell_size: float     # >= support radius
    origin: jax.Array    # [d] grid origin in standardized coords

    @property
    def shape(self):
        return self.xs_pad.shape[:2]

    @property
    def cap(self) -> int:
        return self.xs_pad.shape[2]


# n_sites/cell_size are STATIC aux data: a CellGrid must be usable as a
# jit argument (closure constants get serialized into axon remote-compile
# requests, which reject >~100MB bodies at north-star scales).
jax.tree_util.register_pytree_node(
    CellGrid,
    lambda g: (
        (g.xs_pad, g.slot_site, g.origin),
        (g.n_sites, g.cell_size),
    ),
    lambda aux, ch: CellGrid(
        xs_pad=ch[0],
        slot_site=ch[1],
        n_sites=aux[0],
        cell_size=aux[1],
        origin=ch[2],
    ),
)


def build_cell_grid(
    xs_std: np.ndarray, rho: float, as_numpy: bool = False
) -> CellGrid:
    """Bucket standardized sites into a cell grid with cell size >= rho.

    Host-side, runs once per fit.  Capacity = max cell occupancy (no
    silent truncation is possible by construction).  ``as_numpy`` keeps
    the arrays on the host — device->host readback through the axon
    tunnel runs at ~0.2 MB/s, so host-side consumers (the PU-TPS hybrid
    patch solver) must never round-trip them through the TPU.
    """
    xs_std = np.asarray(xs_std, np.float64)
    n, d = xs_std.shape
    lo = xs_std.min(0)
    hi = xs_std.max(0)
    ext = np.maximum(hi - lo, 1e-300)
    G = np.maximum(np.floor(ext / rho).astype(int), 1)
    cell = ext / G  # >= rho per axis
    ij = np.minimum((xs_std - lo) / cell, G - 1).astype(np.int64)
    ij = np.maximum(ij, 0)
    n_cells = int(np.prod(G))
    flat = np.ravel_multi_index(tuple(ij.T), tuple(G))
    order = np.argsort(flat, kind="stable")
    counts = np.bincount(flat, minlength=n_cells)
    cap = int(counts.max())
    starts = np.concatenate([[0], np.cumsum(counts)])
    slot_site = np.full((n_cells, cap), -1, np.int32)
    within = np.arange(n) - starts[flat[order]]
    slot_site[flat[order], within] = order.astype(np.int32)
    xs_pad = np.full((n_cells, cap, d), _POISON, np.float64)
    xs_pad[flat[order], within] = xs_std[order]
    conv = (lambda a: a) if as_numpy else jnp.asarray
    return CellGrid(
        xs_pad=conv(xs_pad.reshape(*G, cap, d)),
        slot_site=conv(slot_site.reshape(*G, cap)),
        n_sites=n,
        cell_size=float(cell.max()),
        origin=conv(lo),
    )


def pack_values(grid: CellGrid, values) -> jax.Array:
    """Site-ordered vector -> padded [Gy, Gx, cap] layout (pads = 0)."""
    v = jnp.asarray(values)
    safe = jnp.where(grid.slot_site >= 0, grid.slot_site, 0)
    return jnp.where(grid.slot_site >= 0, v[safe], 0.0)


def unpack_values(grid: CellGrid, v_pad) -> jax.Array:
    """Padded layout -> site-ordered vector."""
    out = jnp.zeros(grid.n_sites, v_pad.dtype)
    tgt = jnp.where(
        grid.slot_site >= 0, grid.slot_site, grid.n_sites
    ).reshape(-1)
    return out.at[tgt].set(v_pad.reshape(-1), mode="drop")


def _stencil_offsets(d: int = 2):
    return [(di, dj) for di in (-1, 0, 1) for dj in (-1, 0, 1)]


def matvec_pad(grid: CellGrid, phi, eps, smooth, v_pad):
    """(A + smooth I) v in padded layout: dense 9-stencil contraction.

    For each neighbor offset, rolls the padded site/value blocks into
    alignment and contracts ``phi(dist)`` against the neighbor values —
    batched [C, cap, cap] x [C, cap] matmuls, zero gathers.  Wrapped and
    pad entries die through phi (distance > support).
    """
    xs = grid.xs_pad
    Gy, Gx, cap, d = xs.shape
    out = smooth * v_pad

    def contrib(nx, nv):
        # [Gy, Gx, cap_i, cap_j] pair distances per cell pair
        diff = xs[:, :, :, None, :] - nx[:, :, None, :, :]
        d2 = jnp.sum(diff * diff, axis=-1)
        K = phi(jnp.sqrt(d2), eps)
        return jnp.einsum(
            "yxij,yxj->yxi", K, nv, precision=HIGHEST
        )

    for di, dj in _stencil_offsets():
        nx = jnp.roll(xs, (-di, -dj), axis=(0, 1))
        nv = jnp.roll(v_pad, (-di, -dj), axis=(0, 1))
        out = out + contrib(nx, nv)
    return out


def _cg_pad(grid, phi, eps, smooth, y_pad, tol, maxiter):
    """CG on the padded layout; scalars reduce over real slots only."""
    mask = (grid.slot_site >= 0).astype(y_pad.dtype)

    def dot(a, b):
        return jnp.sum(a * b * mask)

    def mv(v):
        return matvec_pad(grid, phi, eps, smooth, v) * mask

    b2 = dot(y_pad, y_pad)
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

    x0 = jnp.zeros_like(y_pad)
    x, _, _, rs, it = jax.lax.while_loop(
        cond, body, (x0, y_pad, y_pad, b2, jnp.int32(0))
    )
    return x, rs, it


def _block_jacobi_inv(grid: CellGrid, phi, eps, smooth):
    """Per-cell kernel-block inverses, [Gy, Gx, cap, cap].

    The within-cell restriction of A is itself a Wendland Gram matrix
    (SPD); pad slots are exact identity rows for free (phi(0)=1 on the
    diagonal, poison distances kill every off-diagonal).  Inverted once
    with batched pivot-free Gauss-Jordan — SPD needs no pivoting, and the
    batched jnp.linalg path is off-limits on this TPU (bf16-corrupted
    LU).  Applying M^-1 is then one batched [cap, cap] matmul per cell.
    """
    xs = grid.xs_pad
    diff = xs[:, :, :, None, :] - xs[:, :, None, :, :]
    r = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
    cap = xs.shape[2]
    eye = jnp.eye(cap, dtype=xs.dtype)
    # Pad slots all sit at the SAME poison coordinate, so phi would give
    # them a singular all-ones block: force exact identity rows/columns
    # outside the real slots.
    keep = grid.slot_site >= 0
    # The within-cell Gram is ill-conditioned (near-flat kernel at
    # sub-support spacing): an unregularized f32 elimination produces a
    # garbage inverse that STALLS the PCG it is meant to accelerate
    # (measured: capped at |r|/|b| ~ 1e-2).  A small ridge caps the
    # block condition at ~1/delta — the preconditioner only shapes
    # search directions, so the clipped tail eigenvalues cost extra
    # iterations, not accuracy.  delta is dtype-scaled: f64 blocks can
    # afford the near-exact inverse.
    delta = 100.0 * float(np.sqrt(machine.eps(xs.dtype)))
    B = phi(r, eps) + (smooth + delta) * eye
    B = jnp.where(keep[..., :, None] & keep[..., None, :], B, eye)
    M = jnp.concatenate([B, jnp.broadcast_to(eye, B.shape)], axis=-1)

    # Unrolled over the (static, small) cap: traced pivot indices can't
    # slice, and flat programs load faster than loop-nested ones anyway.
    for i in range(cap):
        row = M[..., i, :] / M[..., i, i : i + 1]
        M = M - M[..., :, i : i + 1] * row[..., None, :]
        M = M.at[..., i, :].set(row)
    return M[..., :, cap:]


def _pcg_pad(grid, phi, eps, smooth, y_pad, tol, maxiter):
    """Block-Jacobi preconditioned CG on the padded layout.

    Plain CG on the 1M-site Wendland system stalls against its iteration
    cap (~40 coupled neighbors per site); the per-cell block inverse
    captures the strongest coupling and roughly halves the iterations per
    digit.  The preconditioner application runs at default (bf16 MXU)
    precision — it only shapes the search directions, the residual and
    solution are untouched — while the operator matvec keeps HIGHEST.
    Stopping stays on the TRUE residual |r|^2 <= tol^2 |b|^2, identical
    to :func:`_cg_pad`.
    """
    mask = (grid.slot_site >= 0).astype(y_pad.dtype)
    Binv = _block_jacobi_inv(grid, phi, eps, smooth)

    def dot(a, b):
        return jnp.sum(a * b * mask)

    def mv(v):
        return matvec_pad(grid, phi, eps, smooth, v) * mask

    def prec(r):
        # HIGHEST: a bf16 preconditioner application makes M effectively
        # unsymmetric between iterations and CG stalls (measured: 400
        # capped iterations at |r|/|b| ~ 1e-2 vs convergence in f32).
        return (
            jnp.einsum("yxij,yxj->yxi", Binv, r, precision=HIGHEST) * mask
        )

    b2 = dot(y_pad, y_pad)
    target = tol * tol * b2

    def cond(state):
        *_, rr, _rz, it = state
        return jnp.logical_and(rr > target, it < maxiter)

    def body(state):
        x, r, p, rr, rz, it = state
        Ap = mv(p)
        alpha = rz / dot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        z = prec(r)
        rz_new = dot(r, z)
        p = z + (rz_new / rz) * p
        return x, r, p, dot(r, r), rz_new, it + 1

    z0 = prec(y_pad)
    x, _, _, rr, _, it = jax.lax.while_loop(
        cond, body,
        (jnp.zeros_like(y_pad), y_pad, z0, b2, dot(y_pad, z0), jnp.int32(0)),
    )
    return x, rr, it


def _host_matvec_f64(xs_std, eps, smooth, lam):
    """Host f64 ``(A + smooth I) @ lam`` for the Wendland-C2 system.

    The residual engine of iterative refinement: kernel entries AND the
    accumulation both run in numpy f64, so the residual is accurate to
    ~n*eps_f64 — refining against an f32-entry matvec would stall at the
    f32 entry noise (kappa * eps_f32).  Dense pairwise for moderate N;
    cell-list 9-stencil (chunked over cell rows) beyond.
    """
    xs_std = np.asarray(xs_std, np.float64)
    lam = np.asarray(lam, np.float64)
    n = xs_std.shape[0]

    def phi64(r):
        t = eps * r
        return np.maximum(1.0 - t, 0.0) ** 4 * (4.0 * t + 1.0)

    if n <= 32768:
        diff = xs_std[:, None, :] - xs_std[None, :, :]
        K = phi64(np.sqrt((diff**2).sum(-1)))
        return K @ lam + smooth * lam
    grid = build_cell_grid(xs_std, 1.0 / eps, as_numpy=True)
    ok = grid.slot_site >= 0
    lam_pad = np.zeros(grid.slot_site.shape)
    lam_pad[ok] = lam[grid.slot_site[ok]]
    xs = grid.xs_pad  # f64 with poison pads (1e16 squared: f64-safe)
    Gy, Gx, cap, _ = xs.shape
    out = smooth * lam_pad
    rows_per = max(1, 50_000_000 // max(Gx * cap * cap, 1))
    for di, dj in _stencil_offsets():
        nx = np.roll(xs, (-di, -dj), axis=(0, 1))
        nv = np.roll(lam_pad, (-di, -dj), axis=(0, 1))
        for y0 in range(0, Gy, rows_per):
            sl = slice(y0, min(y0 + rows_per, Gy))
            diff = xs[sl][:, :, :, None, :] - nx[sl][:, :, None, :, :]
            K = phi64(np.sqrt((diff**2).sum(-1)))
            out[sl] += np.einsum("yxij,yxj->yxi", K, nv[sl])
    res = np.zeros(n)
    res[grid.slot_site[ok]] = out[ok]
    return res


class CompactRbf:
    """Wendland-C2 interpolant built on the cell list (strictly PD, d<=3).

    Args:
      sites: [N, 2] raw coordinates.
      values: [N].
      epsilon: inverse support radius in standardized coords.  Default
        picks the support so each site sees ~``target_neighbors`` others
        (pi rho^2 N = target).
      smooth: ridge on the diagonal (0 interpolates exactly).
      tol / maxiter: CG stopping controls.
    """

    def __init__(
        self,
        sites,
        values,
        epsilon: float | None = None,
        smooth: float = 0.0,
        tol: float = 1e-8,
        maxiter: int = 1000,
        standardize: bool = True,
        dtype=None,
    ):
        sites = np.asarray(sites, np.float64)
        values = np.asarray(values, np.float64)
        n, d = sites.shape
        if values.shape != (n,):
            raise errors.InvalidArgumentError("values shape mismatch")
        if standardize:
            lo, hi = sites.min(0), sites.max(0)
            self.shift = (lo + hi) / 2.0
            ext = hi - lo
            self.scale = np.where(ext > 0, 1.0 / np.where(ext > 0, ext, 1), 1.0)
        else:
            self.shift = np.zeros(d)
            self.scale = np.ones(d)
        xs_std = self.scale * (sites - self.shift)
        if epsilon is None:
            target_neighbors = 40.0
            rho = float(np.sqrt(target_neighbors / (np.pi * n)))
            epsilon = 1.0 / rho
        self.epsilon = float(epsilon)
        self.smooth = float(smooth)
        self.kernel = rbf.KERNELS["wendland_c2"]
        if dtype is None:
            dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32

        self.grid = build_cell_grid(xs_std, 1.0 / self.epsilon)
        self.grid = self.grid._replace(
            xs_pad=self.grid.xs_pad.astype(dtype)
        )
        occ = float(n) / (self.grid.shape[0] * self.grid.shape[1])
        config.log.info(
            "CompactRbf: grid %s cap %d (avg occupancy %.1f), eps=%.4g",
            self.grid.shape,
            self.grid.cap,
            occ,
            self.epsilon,
        )
        y_pad = pack_values(self.grid, jnp.asarray(values, dtype))

        phi = self.kernel.phi
        # AOT-compiled through the shared executable cache: a fresh jit
        # instance per constructed model costs ~8-20s of trace/cache-load
        # on this runtime even when the program itself is cached.
        args = (
            self.grid,
            jnp.asarray(self.epsilon, dtype),
            jnp.asarray(self.smooth, dtype),
            y_pad,
        )
        fit = aot.aot_compile(
            ("compact_pcg", self.kernel.name, float(tol), int(maxiter)),
            lambda: jax.jit(
                lambda grid, eps_, sm_, y: _pcg_pad(
                    grid, phi, eps_, sm_, y, tol=tol, maxiter=maxiter
                )
            ),
            args,
        )
        lam_pad, rs, it = fit(*args)
        self.lam_pad = lam_pad
        self.cg_iters = int(it)
        self.cg_residual = float(jnp.sqrt(rs))
        self.values = jnp.asarray(values, dtype)
        # kept for iterative refinement (host f64 residuals)
        self._fit = fit
        self._xs_std = xs_std
        self._values64 = values
        self.lam64 = None
        self.refine_history: list[float] = []

    def refine(self, iters: int = 2) -> "CompactRbf":
        """Mixed-precision iterative refinement of the fit weights.

        The f32 PCG solution alone carries a kappa-limited relative weight
        error (~1e-3 at BENCH_r03's N=4096 config).  Classic refinement
        recovers near-f64 weights from the f32 solver: the residual
        ``r = y - A lam`` is computed on the HOST in f64 (the TPU has no
        f64 linalg; kernel entries must exceed f32 accuracy or refinement
        stalls at kappa*eps_f32), each correction re-uses the
        already-compiled f32 PCG program with ``r`` as the right-hand
        side, and the accumulator lives in host f64.  The error contracts
        by ~(solver relative error) per pass, so 2-3 passes reach the
        f64-residual floor.  BASELINE.md row 3 anchor: the f64 Cholesky
        the reference's planned RBF path would have used
        (linalg/gsl_linalg.h:471-474).

        Records max|r|_inf BEFORE each pass and after the last in
        ``self.refine_history``; leaves f64 weights in ``self.lam64`` and
        refreshes ``lam_pad`` (so ``eval``/``lam`` use refined weights).
        """
        dtype = self.grid.xs_pad.dtype
        eps_a = jnp.asarray(self.epsilon, dtype)
        sm_a = jnp.asarray(self.smooth, dtype)
        lam64 = np.asarray(self.lam, np.float64)
        hist = []
        for _ in range(iters):
            r = self._values64 - _host_matvec_f64(
                self._xs_std, self.epsilon, self.smooth, lam64
            )
            hist.append(float(np.max(np.abs(r))))
            r_pad = pack_values(self.grid, jnp.asarray(r, dtype))
            d_pad, _, _ = self._fit(self.grid, eps_a, sm_a, r_pad)
            lam64 = lam64 + np.asarray(
                unpack_values(self.grid, d_pad), np.float64
            )
        hist.append(
            float(
                np.max(
                    np.abs(
                        self._values64
                        - _host_matvec_f64(
                            self._xs_std, self.epsilon, self.smooth, lam64
                        )
                    )
                )
            )
        )
        self.refine_history = hist
        self.lam64 = lam64
        self.lam_pad = pack_values(self.grid, jnp.asarray(lam64, dtype))
        return self

    @property
    def lam(self) -> jax.Array:
        """Coefficients in original site order."""
        return unpack_values(self.grid, self.lam_pad)

    def eval(self, q):
        """Interpolant at [B, 2] raw queries: 9-cell neighbor sums."""
        q = jnp.atleast_2d(jnp.asarray(q))
        dtype = self.grid.xs_pad.dtype
        qs = (
            jnp.asarray(self.scale, dtype)
            * (q.astype(dtype) - jnp.asarray(self.shift, dtype))
        )
        # static phi (function identity), everything else an argument —
        # jit-safe at scale under the axon remote-compile size limit.
        return _eval_cells_jit(
            self.grid,
            self.kernel.phi,
            jnp.asarray(self.epsilon, dtype),
            self.lam_pad,
            qs,
        )

    def residual(self):
        """Max |s(x_i) - y_i| over the sites (fit diagnostic)."""
        pred_pad = matvec_pad(
            self.grid,
            self.kernel.phi,
            jnp.asarray(self.epsilon, self.grid.xs_pad.dtype),
            jnp.asarray(0.0, self.grid.xs_pad.dtype),
            self.lam_pad,
        )
        pred = unpack_values(self.grid, pred_pad)
        return jnp.max(jnp.abs(pred + self.smooth * self.lam - self.values))


def _eval_cells(grid: CellGrid, phi, eps, lam_pad, qs):
    """Sum phi(|q - x_j|) lam_j over the 9 cells around each query."""
    Gy, Gx, cap, d = grid.xs_pad.shape
    cell = jnp.asarray(grid.cell_size, qs.dtype)
    ij = jnp.floor((qs - grid.origin.astype(qs.dtype)) / cell).astype(
        jnp.int32
    )
    iy = jnp.clip(ij[:, 0], 0, Gy - 1)
    ix = jnp.clip(ij[:, 1], 0, Gx - 1)
    out = jnp.zeros(qs.shape[0], qs.dtype)
    xs_flat = grid.xs_pad.reshape(Gy * Gx, cap, d)
    lam_flat = lam_pad.reshape(Gy * Gx, cap)
    for di, dj in _stencil_offsets():
        ny = jnp.clip(iy + di, 0, Gy - 1)
        nx = jnp.clip(ix + dj, 0, Gx - 1)
        # Suppress double counting when clipping collapses offsets.
        valid = ((iy + di) == ny) & ((ix + dj) == nx)
        rows = ny * Gx + nx
        xb = xs_flat[rows]        # [B, cap, d] row gather
        lb = lam_flat[rows]       # [B, cap]
        diff = qs[:, None, :] - xb
        r = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
        out = out + jnp.where(
            valid, jnp.sum(phi(r, eps) * lb, axis=-1), 0.0
        )
    return out


_eval_cells_jit = jax.jit(_eval_cells, static_argnums=(1,))
