"""The gsl_interp2d family (bilinear, bicubic), batched-functional.

Rebuilds the 2D strategy API (gsl_interp2d.h:37-60) and both kernels:

* bilinear (bilinear.c) — cell-local bilinear blend.
* bicubic (bicubic.c:98-177) — nodal derivative grids ``zx``, ``zy``,
  ``zxy`` precomputed with 1D NATURAL cubic splines along rows, columns,
  and rows-of-zy respectively (exactly the reference's construction), then
  a 16-term Hermite patch per cell scaled to cell units (bicubic.c:178-320).

Grid convention: ``z[i, j]`` is the value at ``(x[i], y[j])`` — a 2D array
here instead of GSL's flat ``z[j*xsize+i]`` (gsl_interp2d.h:72-77);
:func:`idx`/:func:`zget`/:func:`zset` provide the flat-layout helpers for
porting.

Evaluation is batched over query arrays; the two per-axis accelerators
(interp2d.c) are replaced by vectorized bisection.  ``eval`` enforces the
domain (NaN outside, like interp2d_eval's bounds wrapper,
interp2d.c:130-154); ``eval_extrap`` skips the check and extrapolates with
the edge cell (gsl_interp2d_eval_extrap, interp2d.c:160-176).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from . import interp1d
from ..utils import errors


def idx(i, j, xsize):
    """Flat index of grid node (i, j) in GSL layout (interp2d.c IDX2D)."""
    return j * xsize + i


def zget(z_flat, i, j, xsize):
    return z_flat[idx(i, j, xsize)]


def zset(z_flat, i, j, xsize, val):
    return z_flat.at[idx(i, j, xsize)].set(val)


def _cspline_nodal_deriv(x, y_cols):
    """d/dx at the nodes of natural csplines, vectorized over columns.

    y_cols: [n, m] — m independent splines sharing knots x.  Returns [n, m].
    The derivative at node i is the b-coefficient of segment i; at the last
    node it is the end-derivative of the final segment.
    """

    def one(y):
        coef = interp1d._coef_cspline(x, y)
        h_last = x[-1] - x[-2]
        last = (
            coef[-1, 1]
            + h_last * (2.0 * coef[-1, 2] + 3.0 * coef[-1, 3] * h_last)
        )
        return jnp.concatenate([coef[:, 1], last[None]])

    return jax.vmap(one, in_axes=1, out_axes=1)(y_cols)


class Interp2D:
    """2D interpolant on a rectilinear grid (gsl_interp2d analog)."""

    MIN_SIZE = {"bilinear": 2, "bicubic": 4}

    def __init__(self, x, y, z, kind: str = "bicubic"):
        if kind not in self.MIN_SIZE:
            raise errors.InvalidArgumentError(
                f"unknown 2D interpolation type {kind!r}"
            )
        x = jnp.asarray(x)
        y = jnp.asarray(y)
        z = jnp.asarray(z)
        if z.shape != (x.shape[0], y.shape[0]):
            raise errors.InvalidArgumentError(
                f"z shape {z.shape} != (len(x), len(y))"
                f" = ({x.shape[0]}, {y.shape[0]})"
            )
        ms = self.MIN_SIZE[kind]
        if x.shape[0] < ms or y.shape[0] < ms:
            raise errors.InvalidArgumentError(
                f"{kind} requires a grid of at least {ms}x{ms}"
            )
        for arr, nm in ((x, "x"), (y, "y")):
            if not np.all(np.diff(np.asarray(arr)) > 0):
                raise errors.InvalidArgumentError(
                    f"{nm} values must be strictly increasing"
                )
        self.kind = kind
        self.x = x
        self.y = y
        self.z = z
        if kind == "bicubic":
            # Nodal derivative grids, bicubic.c:98-177.
            self.zx = _cspline_nodal_deriv(x, z)          # d/dx along rows
            self.zy = _cspline_nodal_deriv(y, z.T).T      # d/dy along cols
            self.zxy = _cspline_nodal_deriv(x, self.zy)   # d/dx of zy

    @property
    def name(self) -> str:
        return self.kind

    @property
    def min_size(self) -> int:
        return self.MIN_SIZE[self.kind]

    @property
    def xmin(self):
        return self.x[0]

    @property
    def xmax(self):
        return self.x[-1]

    @property
    def ymin(self):
        return self.y[0]

    @property
    def ymax(self):
        return self.y[-1]

    # -- cell data -------------------------------------------------------

    def _cell(self, xq, yq):
        xi = interp1d.bsearch(self.x, xq)
        yi = interp1d.bsearch(self.y, yq)
        dx = self.x[xi + 1] - self.x[xi]
        dy = self.y[yi + 1] - self.y[yi]
        t = (xq - self.x[xi]) / dx
        u = (yq - self.y[yi]) / dy
        return xi, yi, dx, dy, t, u

    def _corners(self, grid, xi, yi):
        return (
            grid[xi, yi],
            grid[xi + 1, yi],
            grid[xi, yi + 1],
            grid[xi + 1, yi + 1],
        )

    # -- bicubic patch ---------------------------------------------------

    def _patch_coeffs(self, xi, yi, dx, dy):
        """4x4 monomial coefficient tensor a[..., i, j] for z = sum a_ij t^i u^j.

        Built from corner values and cell-scaled derivatives via the
        standard Hermite matrix  H = [[1,0,0,0],[0,0,1,0],[-3,3,-2,-1],
        [2,-2,1,1]]:  A = H F H^T with F the corner value/derivative
        block — algebraically identical to the explicit 16-term expansion
        in bicubic.c:244-320.
        """
        f00, f10, f01, f11 = self._corners(self.z, xi, yi)
        fx00, fx10, fx01, fx11 = [
            v * dx for v in self._corners(self.zx, xi, yi)
        ]
        fy00, fy10, fy01, fy11 = [
            v * dy for v in self._corners(self.zy, xi, yi)
        ]
        fxy00, fxy10, fxy01, fxy11 = [
            v * dx * dy for v in self._corners(self.zxy, xi, yi)
        ]
        F = jnp.stack(
            [
                jnp.stack([f00, f01, fy00, fy01], -1),
                jnp.stack([f10, f11, fy10, fy11], -1),
                jnp.stack([fx00, fx01, fxy00, fxy01], -1),
                jnp.stack([fx10, fx11, fxy10, fxy11], -1),
            ],
            -2,
        )  # [..., 4, 4]
        H = jnp.asarray(
            [
                [1.0, 0.0, 0.0, 0.0],
                [0.0, 0.0, 1.0, 0.0],
                [-3.0, 3.0, -2.0, -1.0],
                [2.0, -2.0, 1.0, 1.0],
            ],
            F.dtype,
        )
        return jnp.einsum("ik,...kl,jl->...ij", H, F, H)

    @staticmethod
    def _powers(t):
        one = jnp.ones_like(t)
        return jnp.stack([one, t, t * t, t * t * t], -1)

    @staticmethod
    def _dpowers(t):
        zero = jnp.zeros_like(t)
        one = jnp.ones_like(t)
        return jnp.stack([zero, one, 2.0 * t, 3.0 * t * t], -1)

    @staticmethod
    def _d2powers(t):
        zero = jnp.zeros_like(t)
        return jnp.stack([zero, zero, 2.0 * jnp.ones_like(t), 6.0 * t], -1)

    def _bicubic(self, xq, yq, ddx: int, ddy: int):
        xi, yi, dx, dy, t, u = self._cell(xq, yq)
        A = self._patch_coeffs(xi, yi, dx, dy)
        tp = [self._powers, self._dpowers, self._d2powers][ddx](t)
        up = [self._powers, self._dpowers, self._d2powers][ddy](u)
        val = jnp.einsum("...ij,...i,...j->...", A, tp, up)
        return val / dx**ddx / dy**ddy

    def _bilinear(self, xq, yq, ddx: int, ddy: int):
        xi, yi, dx, dy, t, u = self._cell(xq, yq)
        z00, z10, z01, z11 = self._corners(self.z, xi, yi)
        if ddx == 0 and ddy == 0:
            return (
                z00 * (1 - t) * (1 - u)
                + z10 * t * (1 - u)
                + z01 * (1 - t) * u
                + z11 * t * u
            )
        if (ddx, ddy) == (1, 0):
            return ((z10 - z00) * (1 - u) + (z11 - z01) * u) / dx
        if (ddx, ddy) == (0, 1):
            return ((z01 - z00) * (1 - t) + (z11 - z10) * t) / dy
        if (ddx, ddy) == (1, 1):
            return (z11 - z10 - z01 + z00) / (dx * dy)
        return jnp.zeros_like(t)  # second derivatives of bilinear are 0

    # -- public evaluation ----------------------------------------------

    def _dispatch(self, xq, yq, ddx, ddy, extrap, strict):
        xq = jnp.asarray(xq)
        yq = jnp.asarray(yq)
        fn = self._bicubic if self.kind == "bicubic" else self._bilinear
        vals = fn(xq, yq, ddx, ddy)
        if extrap:
            return vals
        ok = (
            (xq >= self.x[0])
            & (xq <= self.x[-1])
            & (yq >= self.y[0])
            & (yq <= self.y[-1])
        )
        if strict:
            # jit-safe: no-ops under tracing, raises on host (errors.py).
            errors.strict_check(
                ok, errors.DomainError, "interpolation point outside range"
            )
        return jnp.where(ok, vals, jnp.nan)

    def eval(self, xq, yq, strict: bool = False):
        return self._dispatch(xq, yq, 0, 0, False, strict)

    def eval_extrap(self, xq, yq):
        return self._dispatch(xq, yq, 0, 0, True, False)

    def eval_e(self, xq, yq):
        vals = self.eval(xq, yq)
        ok = ~jnp.isnan(vals)
        return vals, jnp.where(ok, errors.SUCCESS, errors.EDOM)

    def eval_deriv_x(self, xq, yq, strict: bool = False):
        return self._dispatch(xq, yq, 1, 0, False, strict)

    def eval_deriv_y(self, xq, yq, strict: bool = False):
        return self._dispatch(xq, yq, 0, 1, False, strict)

    def eval_deriv_xx(self, xq, yq, strict: bool = False):
        return self._dispatch(xq, yq, 2, 0, False, strict)

    def eval_deriv_xy(self, xq, yq, strict: bool = False):
        return self._dispatch(xq, yq, 1, 1, False, strict)

    def eval_deriv_yy(self, xq, yq, strict: bool = False):
        return self._dispatch(xq, yq, 0, 2, False, strict)


class Spline2D(Interp2D):
    """gsl_spline2d analog — owns the grid arrays (gsl_spline2d.h:44-50)."""


def interp2d(x, y, z, kind="bicubic") -> Interp2D:
    return Interp2D(x, y, z, kind)


def spline2d(x, y, z, kind="bicubic") -> Spline2D:
    return Spline2D(x, y, z, kind)
