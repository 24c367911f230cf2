"""Radial-basis-function interpolation — the reference's planned RBF path.

The reference README lists RBF interpolation (including compactly
supported and "fast" variants) as planned but unimplemented
(README:21-23); its dependency closure carries the Cholesky solver the
path would have used (linalg/gsl_linalg.h:471-474).  This module builds it
for real, TPU-first:

* **Assembly on the MXU**: the kernel matrix A[i,j] = phi(|x_i - x_j|)
  comes from one Gram matmul (|a|^2 + |b|^2 - 2 a.b) at
  ``Precision.HIGHEST`` — distances never touch a Python loop.
* **Solvers**: dense Cholesky (strictly PD kernels, with optional ridge
  ``smooth``) or LU on the polynomial-augmented saddle system
  (conditionally PD kernels like thin-plate); plus a **matrix-free
  conjugate-gradient** path that re-materializes kernel blocks on the fly,
  so N is bounded by FLOPs, not by HBM (a 100k x 100k f32 matrix alone
  would exceed a v5e chip's memory).
* **Evaluation** is one [B, N] kernel matmul + polynomial tail — the same
  MXU shape as the assembly, batched over any number of queries.

Kernels: gaussian, multiquadric, inverse_multiquadric, linear, cubic,
thin_plate (r^2 log r, +degree-1 polynomial), wendland_c2 (compactly
supported (1-r)_+^4 (4r+1), strictly PD for d<=3).

Sites are standardized (scale*(x-shift), the engine's convention at
linear_simplex.c:187-198) before radii are measured, so shape parameters
are resolution-independent.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import accurate, morton
from ..utils import config, errors

HIGHEST = jax.lax.Precision.HIGHEST


class Kernel(NamedTuple):
    name: str
    phi: Callable  # (r, eps) -> value
    poly_degree: int  # -1: none needed; 0: constant; 1: affine
    strictly_pd: bool


def _phi_gaussian(r, eps):
    return jnp.exp(-((eps * r) ** 2))


def _phi_mq(r, eps):
    return jnp.sqrt(1.0 + (eps * r) ** 2)


def _phi_imq(r, eps):
    return 1.0 / jnp.sqrt(1.0 + (eps * r) ** 2)


def _phi_linear(r, eps):
    return r


def _phi_cubic(r, eps):
    return r * r * r


def _phi_tps(r, eps):
    # r^2 log r, smoothly 0 at r=0.
    safe = jnp.where(r > 0, r, 1.0)
    # accurate.log: jnp.log is only ~2.4e-3 accurate on the target TPU
    return jnp.where(r > 0, r * r * accurate.log(safe), 0.0)


def _phi_wendland_c2(r, eps):
    # Support radius rho = 1/eps: (1 - eps r)_+^4 (4 eps r + 1).
    t = eps * r
    base = jnp.maximum(1.0 - t, 0.0)
    return base**4 * (4.0 * t + 1.0)


KERNELS = {
    "gaussian": Kernel("gaussian", _phi_gaussian, -1, True),
    "multiquadric": Kernel("multiquadric", _phi_mq, 0, False),
    "inverse_multiquadric": Kernel(
        "inverse_multiquadric", _phi_imq, -1, True
    ),
    "linear": Kernel("linear", _phi_linear, 0, False),
    "cubic": Kernel("cubic", _phi_cubic, 1, False),
    "thin_plate": Kernel("thin_plate", _phi_tps, 1, False),
    "wendland_c2": Kernel("wendland_c2", _phi_wendland_c2, -1, True),
}


def pairwise_dist(a, b):
    """[Na, Nb] Euclidean distances via the Gram-matmul trick (MXU)."""
    a2 = jnp.sum(a * a, axis=-1)
    b2 = jnp.sum(b * b, axis=-1)
    g = jnp.matmul(a, b.T, precision=HIGHEST)
    d2 = jnp.maximum(a2[:, None] + b2[None, :] - 2.0 * g, 0.0)
    return jnp.sqrt(d2)


def _poly_basis(x, degree: int):
    """[N, m] polynomial tail basis: degree 0 -> [1]; 1 -> [1, x...]."""
    n = x.shape[0]
    if degree < 0:
        return jnp.zeros((n, 0), x.dtype)
    cols = [jnp.ones((n, 1), x.dtype)]
    if degree >= 1:
        cols.append(x)
    return jnp.concatenate(cols, axis=-1)


class RbfInterp:
    """RBF interpolant s(x) = sum_i lambda_i phi(|x - x_i|) + P(x).

    Args:
      sites: [N, d] raw coordinates.
      values: [N].
      kernel: one of KERNELS.
      epsilon: shape parameter (support reciprocal for wendland).  Default
        1/h with h the mean nearest-site spacing estimate in standardized
        coords, except thin_plate/cubic/linear which are shape-free.
      smooth: ridge added to the kernel diagonal (smoothing spline);
        0.0 interpolates exactly.
      solver: "direct" (Cholesky/LU), "cg" (matrix-free), or "pcg"
        (matrix-free projected CG with a Morton-blocked additive-Schwarz
        preconditioner — the at-scale path for conditionally-PD kernels
        like thin_plate; north-star config 3); "auto" picks direct for
        N <= 8192, else pcg for poly-augmented kernels and cg otherwise.
      standardize: measure radii in scale*(x-shift) coordinates.
    """

    def __init__(
        self,
        sites,
        values,
        kernel: str = "thin_plate",
        epsilon: float | None = None,
        smooth: float = 0.0,
        solver: str = "auto",
        standardize: bool = True,
        cg_tol: float = 1e-10,
        cg_maxiter: int = 500,
        block: int = 4096,
        precond_neighbors: int = 50,
        precond_anchors: int = 12,
    ):
        if kernel not in KERNELS:
            raise errors.InvalidArgumentError(
                f"unknown RBF kernel {kernel!r}; have {sorted(KERNELS)}"
            )
        self.kernel = KERNELS[kernel]
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
        xs = jnp.asarray(self.scale * (sites - self.shift))
        self.xs = xs
        self.values = jnp.asarray(values)

        if epsilon is None:
            # ~1/(mean spacing): n points in a unit box -> h ~ n^(-1/d).
            epsilon = 0.5 * float(n) ** (1.0 / d)
        self.epsilon = float(epsilon)
        self.smooth = float(smooth)

        if solver == "auto":
            if n <= 8192:
                solver = "direct"
            else:
                solver = "pcg" if self.kernel.poly_degree >= 0 else "cg"
        self.solver = solver
        self._precond_q = int(precond_neighbors)
        self._precond_anchors = int(precond_anchors)
        self._fit(cg_tol, cg_maxiter, block)

    # -- fitting ----------------------------------------------------------

    def _fit(self, cg_tol, cg_maxiter, block):
        xs, y = self.xs, self.values
        n = xs.shape[0]
        phi = self.kernel.phi
        eps = self.epsilon
        if self.solver == "direct":
            A = phi(pairwise_dist(xs, xs), eps)
            A = A + self.smooth * jnp.eye(n, dtype=A.dtype)
            P = _poly_basis(xs, self.kernel.poly_degree)
            m = P.shape[1]
            if m == 0:
                if self.kernel.strictly_pd:
                    L, lower = jax.scipy.linalg.cho_factor(A, lower=True)
                    lam = jax.scipy.linalg.cho_solve((L, lower), y)
                else:
                    lam = jnp.linalg.solve(A, y[:, None])[:, 0]
                self.lam = lam
                self.poly_coef = jnp.zeros(0, A.dtype)
            else:
                # Saddle system [[A,P],[P^T,0]] [lam;c] = [y;0].
                top = jnp.concatenate([A, P], axis=1)
                bot = jnp.concatenate(
                    [P.T, jnp.zeros((m, m), A.dtype)], axis=1
                )
                K = jnp.concatenate([top, bot], axis=0)
                rhs = jnp.concatenate([y, jnp.zeros(m, A.dtype)])
                sol = jnp.linalg.solve(K, rhs[:, None])[:, 0]
                # jit-safe singularity report (no-op under tracing).
                errors.strict_check(
                    jnp.all(jnp.isfinite(sol)),
                    errors.SingularError,
                    "singular RBF system (duplicate sites?)",
                )
                self.lam = sol[:n]
                self.poly_coef = sol[n:]
        elif self.solver == "pcg":
            # Morton-order the sites so preconditioner blocks are
            # spatially coherent, fit, then un-permute the coefficients.
            order = morton.morton_order(np.asarray(xs))
            inv = np.empty_like(order)
            inv[order] = np.arange(order.size)
            xs_m = xs[order]
            P = _poly_basis(xs_m, self.kernel.poly_degree)
            lam_m, self.poly_coef, info = _projected_pcg_matfree(
                xs_m, y[jnp.asarray(order)], P, phi, eps, self.smooth,
                cg_tol, cg_maxiter, block,
                q=self._precond_q, n_anchor=self._precond_anchors,
            )
            self.lam = lam_m[jnp.asarray(inv)]
            self.solve_info = info
        else:
            P = _poly_basis(xs, self.kernel.poly_degree)
            if P.shape[1] == 0:
                self.lam = _cg_matfree(
                    xs, y, phi, eps, self.smooth, cg_tol, cg_maxiter, block
                )
                self.poly_coef = jnp.zeros(0, xs.dtype)
            else:
                self.lam, self.poly_coef = _projected_cg_matfree(
                    xs, y, P, phi, eps, self.smooth, cg_tol, cg_maxiter,
                    block,
                )

    # -- evaluation --------------------------------------------------------

    def eval(self, q):
        """Interpolant values at [B, d] raw query points (one MXU matmul)."""
        q = jnp.atleast_2d(jnp.asarray(q))
        qs = jnp.asarray(self.scale) * (q - jnp.asarray(self.shift))
        B = self.kernel.phi(pairwise_dist(qs, self.xs), self.epsilon)
        out = jnp.matmul(B, self.lam, precision=HIGHEST)
        if self.poly_coef.shape[0]:
            out = out + _poly_basis(qs, self.kernel.poly_degree) @ self.poly_coef
        return out

    def eval_deriv(self, q):
        """Gradient [B, d] via exact autodiff of the interpolant."""
        q = jnp.atleast_2d(jnp.asarray(q))
        g = jax.vmap(jax.grad(lambda p: self.eval(p[None, :])[0]))(q)
        return g

    def residual(self):
        """Max |s(x_i) - y_i| at the sites (fit diagnostics)."""
        return jnp.max(jnp.abs(self.eval_sites() - self.values))

    def eval_sites(self):
        B = self.kernel.phi(pairwise_dist(self.xs, self.xs), self.epsilon)
        out = jnp.matmul(B, self.lam, precision=HIGHEST)
        if self.poly_coef.shape[0]:
            out = out + _poly_basis(
                self.xs, self.kernel.poly_degree
            ) @ self.poly_coef
        return out


def _projected_cg_matfree(xs, y, P, phi, eps, smooth, tol, maxiter, block):
    """Null-space projected CG for conditionally-PD kernels (TPS etc.).

    The saddle system [[A,P],[P^T,0]][lam;c]=[y;0] restricted to the
    constraint subspace P^T lam = 0 is positive definite (that is what
    "conditionally PD of order m" means), so CG applies to
    Pi A Pi lam = Pi y with the orthogonal projector
    Pi = I - Q Q^T (Q = reduced-QR basis of P).  A is streamed in blocks
    like :func:`_cg_matfree`; the polynomial tail follows as
    c = R^{-1} Q^T (y - A lam).  This is the scalable path for
    thin-plate/cubic/multiquadric fitting where the dense saddle solve
    no longer fits memory.
    """
    Q, R = jnp.linalg.qr(P)  # [n, m], [m, m]

    def proj(v):
        return v - Q @ (Q.T @ v)

    matvec = _make_block_matvec(xs, phi, eps, smooth, block)

    def pmv(v):
        return proj(matvec(proj(v)))

    b = proj(y)
    b2 = jnp.vdot(b, b)
    target = tol * tol * b2

    def cond(state):
        *_, rs, it = state
        return jnp.logical_and(rs > target, it < maxiter)

    def body(state):
        x, r, p, rs, it = state
        Ap = pmv(p)
        alpha = rs / jnp.vdot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        rs_new = jnp.vdot(r, r)
        p = r + (rs_new / rs) * p
        return x, r, p, rs_new, it + 1

    x0 = jnp.zeros_like(y)
    lam, *_ = jax.lax.while_loop(cond, body, (x0, b, b, b2, jnp.int32(0)))
    lam = proj(lam)
    c = jax.scipy.linalg.solve_triangular(R, Q.T @ (y - matvec(lam)))
    return lam, c


def _local_lagrange_precond(
    xs, phi, eps, m: int, q: int = 50, n_anchor: int = 12, chunk: int = 4096
):
    """Local-Lagrange preconditioner for conditionally-PD kernels.

    The classic fast-fitting construction (Faul–Powell / Beatson–Cherrie–
    Mouat): for every site i, solve a LOCAL interpolation problem over its
    ``q`` nearest neighbors plus ``n_anchor`` globally spread anchor sites
    — the cardinal (Lagrange) rhs ``e_i`` with the polynomial constraint —
    giving one sparse row ``C[i]`` of an approximate inverse ``C ~= A^-1``
    (``A C^T ~= I`` because the local cardinal function nearly vanishes at
    all data sites).  The anchors carry the smooth/global modes that pure
    k-NN sets miss; every row satisfies its local constraint, so ``C^T r``
    lies in the global constraint space by construction.

    Build: one cKDTree query (host) + batched LU solves of
    [N, q+n_anchor+m, .] local saddles, chunked with lax.map so peak
    memory stays O(chunk * width^2).  Apply is a gather + row-dot and the
    transposed scatter; PCG uses the symmetrized (C + C^T)/2.
    """
    from scipy.spatial import cKDTree

    xs_h = np.asarray(xs)
    n, d = xs_h.shape
    q = min(q, n)
    tree = cKDTree(xs_h)
    _, nbrs = tree.query(xs_h, k=q)
    nbrs = nbrs.reshape(n, q).astype(np.int32)  # col 0 == i itself
    # Anchors: Morton-strided global sites (xs is Morton-ordered upstream),
    # deduplicated against the neighbor set by masking later.
    anchors = np.linspace(0, n - 1, n_anchor, dtype=np.int32)
    L = np.concatenate(
        [nbrs, np.broadcast_to(anchors, (n, n_anchor)).copy()], axis=1
    )  # [n, w]
    w = L.shape[1]
    # Duplicate columns (an anchor already among the neighbors) make the
    # local system singular: shift duplicates to poison coords instead.
    dup = np.zeros((n, w), bool)
    srt = np.sort(L, axis=1)
    eq = srt[:, 1:] == srt[:, :-1]
    # mark the *later* occurrence as duplicate via rank trick
    order = np.argsort(L, axis=1, kind="stable")
    dup_sorted = np.concatenate([np.zeros((n, 1), bool), eq], axis=1)
    np.put_along_axis(dup, order, dup_sorted, axis=1)

    L_j = jnp.asarray(L)
    dup_j = jnp.asarray(dup)
    xs_j = jnp.asarray(xs)

    # Homogeneity exponent: phi(h r) = h^s phi(r) (+ a term absorbed by
    # the polynomial part, for thin-plate's log).  Lets every local system
    # be built in UNIT-scaled coordinates — f32-conditioning becomes
    # scale-free, which is what makes the preconditioner build viable on
    # TPU hardware — then c_local = c_unit / h^s.
    _scale_expo = {"thin_plate": 2.0, "cubic": 3.0, "linear": 1.0}
    expo = None
    for name, k in KERNELS.items():
        if k.phi is phi and name in _scale_expo:
            expo = _scale_expo[name]

    def solve_chunk(args):
        Lc, dupc = args  # [c, w], [c, w]
        xb = xs_j[Lc]  # [c, w, d]
        keep_c = ~dupc
        if expo is not None:
            ctr = xb[:, :1, :]
            rel = xb - ctr
            dist = jnp.sqrt(jnp.sum(rel * rel, axis=-1))
            rad = jnp.max(jnp.where(keep_c, dist, 0.0), axis=1)
            rad = jnp.maximum(rad, 1e-30)[:, None, None]
            xb = rel / rad
        xb = jnp.where(dupc[..., None], 1e8, xb)
        diff = xb[:, :, None, :] - xb[:, None, :, :]
        r = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
        A = phi(r, eps)
        # decouple poisoned rows: identity diagonal, zero elsewhere
        keep = ~dupc
        A = jnp.where(keep[:, :, None] & keep[:, None, :], A, 0.0)
        eye = jnp.eye(w, dtype=A.dtype)
        A = A + jnp.where(dupc[:, :, None], eye, 0.0)
        rhs_card = jnp.zeros((Lc.shape[0], w), A.dtype).at[:, 0].set(1.0)
        if m:
            Pb = _poly_basis_batched(xb, 1 if m == 3 else 0)
            Pb = jnp.where(keep[..., None], Pb, 0.0)
            top = jnp.concatenate([A, Pb], axis=2)
            bot = jnp.concatenate(
                [
                    jnp.swapaxes(Pb, 1, 2),
                    jnp.zeros((Lc.shape[0], m, m), A.dtype),
                ],
                axis=2,
            )
            K = jnp.concatenate([top, bot], axis=1)
            rhs = jnp.concatenate(
                [rhs_card, jnp.zeros((Lc.shape[0], m), A.dtype)], axis=1
            )
        else:
            K, rhs = A, rhs_card
        sol = jnp.linalg.solve(K, rhs[..., None])[..., 0]
        c_loc = sol[:, :w] * keep  # poisoned slots contribute 0
        if expo is not None:
            c_loc = c_loc / (rad[:, :, 0] ** expo)
        return c_loc

    pad = (-n) % chunk
    L_pad = jnp.concatenate([L_j, jnp.zeros((pad, w), jnp.int32)])
    dup_pad = jnp.concatenate([dup_j, jnp.ones((pad, w), bool)])
    # poison everything in pad rows except slot 0 (identity row, solvable)
    dup_pad = dup_pad.at[n:, 0].set(False)
    C = jax.lax.map(
        solve_chunk,
        (
            L_pad.reshape(-1, chunk, w),
            dup_pad.reshape(-1, chunk, w),
        ),
    ).reshape(-1, w)[:n]

    def apply_raw(r):
        """z = C r (nonsymmetric approximate inverse) — for GMRES."""
        rn = r[L_j]  # [n, w] gather
        return jnp.sum(C * jnp.where(dup_j, 0.0, rn), axis=1)

    def apply(r):
        """Symmetrized (C + C^T)/2 r — for PCG."""
        Cr = apply_raw(r)
        # C^T r: scatter-add of C[i, j] * r[i] into L[i, j]
        contrib = C * jnp.where(dup_j, 0.0, r[:, None])
        CTr = jnp.zeros_like(r).at[L_j.reshape(-1)].add(
            contrib.reshape(-1)
        )
        return 0.5 * (Cr + CTr)

    apply.raw = apply_raw
    return apply


def _poly_basis_batched(x, degree: int):
    """[.., w, m] polynomial tail basis over batched point sets."""
    ones = jnp.ones(x.shape[:-1] + (1,), x.dtype)
    if degree < 1:
        return ones
    return jnp.concatenate([ones, x], axis=-1)


def _projected_pcg_matfree(
    xs, y, P, phi, eps, smooth, tol, maxiter, block,
    q: int = 50, n_anchor: int = 12, krylov: str = "gmres",
):
    """Preconditioned projected CG — the at-scale conditionally-PD solver.

    Same constraint-subspace formulation as :func:`_projected_cg_matfree`
    (Pi A Pi on {P^T lam = 0}), with the Morton-block additive-Schwarz
    preconditioner of :func:`_block_saddle_precond`.  Cuts iteration
    counts by ~an order of magnitude on thin-plate systems, which is what
    makes the 100k-site < 10 s target reachable (north-star config 3).

    Returns (lam, poly_coef, info dict with iters/residual).
    """
    n = xs.shape[0]
    m = P.shape[1]
    if m:
        Q, R = jnp.linalg.qr(P)

        def proj(v):
            return v - Q @ (Q.T @ v)

    else:

        def proj(v):
            return v

    matvec = _make_block_matvec(xs, phi, eps, smooth, block)
    pre = _local_lagrange_precond(xs, phi, eps, m, q=q, n_anchor=n_anchor)

    def pmv(v):
        return proj(matvec(proj(v)))

    def prec(r):
        # Tiny identity shift keeps M strictly PD on the subspace even if
        # some block's local solve annihilates this residual.
        return proj(pre(r) + 1e-8 * r)

    b = proj(y)
    if krylov == "gmres":
        # Right-preconditioned GMRES with the RAW (nonsymmetric) local-
        # Lagrange inverse — converges in far fewer matvecs than the
        # symmetrized PCG on thin-plate systems.
        lam, rel, mv = _gmres_right(
            pmv, lambda r: proj(pre.raw(r)), b,
            m=min(60, max(10, xs.shape[0] - 1)), tol=tol,
            max_restarts=max(1, maxiter // 60),
        )
        lam = proj(lam)
        if m:
            c = jax.scipy.linalg.solve_triangular(
                R, Q.T @ (y - matvec(lam))
            )
        else:
            c = jnp.zeros(0, xs.dtype)
        info = {"iters": mv, "rel_residual": rel}
        config.log.info(
            "projected GMRES: %d matvecs, rel residual %.2e", mv, rel
        )
        return lam, c, info
    b2 = jnp.vdot(b, b)
    target = tol * tol * b2

    def cond(state):
        *_, rs, _rz, it = state
        return jnp.logical_and(rs > target, it < maxiter)

    def body(state):
        x, r, p, z, rs, rz, it = state
        Ap = pmv(p)
        alpha = rz / jnp.vdot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        z_new = prec(r)
        rz_new = jnp.vdot(r, z_new)
        p = z_new + (rz_new / rz) * p
        return x, r, p, z_new, jnp.vdot(r, r), rz_new, it + 1

    x0 = jnp.zeros_like(y)
    z0 = prec(b)
    state = (x0, b, z0, z0, b2, jnp.vdot(b, z0), jnp.int32(0))
    x, r, *_, rs, _rz, it = jax.lax.while_loop(cond, body, state)
    lam = proj(x)
    if m:
        c = jax.scipy.linalg.solve_triangular(R, Q.T @ (y - matvec(lam)))
    else:
        c = jnp.zeros(0, xs.dtype)
    info = {
        "iters": int(it),
        "rel_residual": float(jnp.sqrt(rs / b2)),
    }
    config.log.info(
        "projected PCG: %d iters, rel residual %.2e",
        info["iters"],
        info["rel_residual"],
    )
    return lam, c, info


def _gmres_right(pmv, prec, b, m: int = 60, tol: float = 1e-10,
                 max_restarts: int = 20):
    """Right-preconditioned restarted GMRES(m), pure JAX.

    Solves pmv(x) = b with x = prec(u); the preconditioner may be
    NONSYMMETRIC (the raw local-Lagrange approximate inverse), which is
    where it beats symmetrized PCG on thin-plate systems.  The Arnoldi
    inner loop is a lax.fori_loop with masked modified-Gram-Schmidt (full
    [m+1, n] contractions per step — MXU-shaped); the small least-squares
    solve runs on device via normal equations (m ~ 60, f32-safe).

    Returns (x, rel_residual, matvecs).
    """
    n = b.shape[0]
    dtype = b.dtype
    bnorm = jnp.linalg.norm(b)

    def arnoldi(x0):
        r = b - pmv(x0)
        beta = jnp.linalg.norm(r)
        V0 = jnp.zeros((m + 1, n), dtype).at[0].set(
            r / jnp.where(beta > 0, beta, 1.0)
        )
        H0 = jnp.zeros((m + 1, m), dtype)

        def body(j, carry):
            V, H = carry
            w = pmv(prec(V[j]))
            # masked MGS against rows 0..j
            mask = (jnp.arange(m + 1) <= j).astype(dtype)
            h = (V @ w) * mask  # [m+1]
            w = w - V.T @ h
            hnorm = jnp.linalg.norm(w)
            H = H.at[:, j].set(h.at[j + 1].set(hnorm))
            V = V.at[j + 1].set(w / jnp.where(hnorm > 0, hnorm, 1.0))
            return V, H

        V, H = jax.lax.fori_loop(0, m, body, (V0, H0))
        return V, H, beta

    def update(x0, V, y):
        x = x0 + prec(V[:m].T @ y)
        res = jnp.linalg.norm(b - pmv(x))
        return x, res

    x = jnp.zeros_like(b)
    run = jax.jit(arnoldi)
    upd = jax.jit(update)
    matvecs = 0
    res = float(bnorm)
    for _ in range(max_restarts):
        V, H, beta = run(x)
        # Small least squares min ||beta e1 - H y|| on the HOST in f64:
        # f32 normal equations square the Hessenberg conditioning and sent
        # the 100k thin-plate solve divergent.
        Hh = np.asarray(H, np.float64)
        rhs = np.zeros(m + 1)
        rhs[0] = float(beta)
        y = np.linalg.lstsq(Hh, rhs, rcond=None)[0]
        x, res_d = upd(x, V, jnp.asarray(y, dtype))
        matvecs += m + 2
        res = float(res_d)
        if res <= tol * float(bnorm):
            break
    return x, res / max(float(bnorm), 1e-300), matvecs


def pairwise_d2(a, b):
    """[Na, Nb] SQUARED distances via the Gram-matmul trick (MXU)."""
    a2 = jnp.sum(a * a, axis=-1)
    b2 = jnp.sum(b * b, axis=-1)
    g = jnp.matmul(a, b.T, precision=HIGHEST)
    return jnp.maximum(a2[:, None] + b2[None, :] - 2.0 * g, 0.0)


def _phi_tps_d2(d2, eps):
    # r^2 log r = d2 * log(d2) / 2; the additive tiny kills the 0*(-inf)
    # NaN at coincident points with no branch, no sqrt (VPU-lean: the
    # streamed 100k matvec is transcendental-bound).
    return 0.5 * d2 * accurate.log(d2 + jnp.asarray(1e-37, d2.dtype))


# phi variants taking SQUARED distance (cheaper streamed matvecs).
_PHI_D2 = {"thin_plate": _phi_tps_d2}


def _make_block_matvec(xs, phi, eps, smooth, block):
    """Matrix-free (A + smooth I) v with kernel blocks streamed from coords."""
    n = xs.shape[0]
    pad = (-n) % block
    xp = jnp.concatenate([xs, jnp.full((pad, xs.shape[1]), 1e8, xs.dtype)])
    nblk = xp.shape[0] // block
    phi_d2 = None
    for name, k in KERNELS.items():
        if k.phi is phi and name in _PHI_D2:
            phi_d2 = _PHI_D2[name]

    def matvec(v):
        def one(xb):
            if phi_d2 is not None:
                K = phi_d2(pairwise_d2(xb, xs), eps)
            else:
                K = phi(pairwise_dist(xb, xs), eps)
            return jnp.matmul(K, v, precision=HIGHEST)

        out = jax.lax.map(one, xp.reshape(nblk, block, -1)).reshape(-1)[:n]
        return out + smooth * v

    return matvec


def _cg_matfree(xs, y, phi, eps, smooth, tol, maxiter, block):
    """Conjugate gradients on (A + smooth I) lam = y without storing A.

    The matvec streams kernel blocks: for each row block, rebuild
    phi(|x_i - x_j|) from coordinates and contract on the MXU.  Memory is
    O(N + block*N); arbitrary N fits on-chip.
    """
    matvec = _make_block_matvec(xs, phi, eps, smooth, block)

    def body(state):
        x, r, p, rs, it = state
        Ap = matvec(p)
        alpha = rs / jnp.vdot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        rs_new = jnp.vdot(r, r)
        p = r + (rs_new / rs) * p
        return x, r, p, rs_new, it + 1

    # Relative tolerance on ||r||/||b||.  Note on conditioning: global RBF
    # kernel matrices (gaussian/IMQ) have condition numbers growing
    # explosively with N and flatness — plain CG is only practical for
    # compactly supported kernels (wendland, support-controlled
    # conditioning) or with a ridge; scalable GLOBAL kernels need
    # partition-of-unity / multipole acceleration (planned follow-up).
    b2 = jnp.vdot(y, y)
    target = tol * tol * b2

    def cond(state):
        *_, rs, it = state
        return jnp.logical_and(rs > target, it < maxiter)

    x0 = jnp.zeros_like(y)
    r0 = y
    state = (x0, r0, r0, jnp.vdot(r0, r0), jnp.int32(0))
    x, *_ = jax.lax.while_loop(cond, body, state)
    return x
