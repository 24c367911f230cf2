"""Tridiagonal solvers (Thomas / cyclic Sherman-Morrison) as lax.scan.

Device replacements for the two GSL solvers the spline kernels use:
``gsl_linalg_solve_symm_tridiag`` (cspline.c:137) and
``gsl_linalg_solve_symm_cyc_tridiag`` (cspline.c:212).  Implemented as
sequential scans — spline setup is O(n) and latency-bound, not a matmul
workload; the scan keeps it jit-compatible and differentiable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def solve_symm_tridiag(diag, offdiag, rhs):
    """Solve symmetric tridiagonal A x = rhs.

    diag [n], offdiag [n-1] (sub == super), rhs [n].
    """
    n = diag.shape[0]
    if n == 1:
        return rhs / diag
    e = jnp.concatenate([offdiag, jnp.zeros(1, diag.dtype)])  # pad

    # Forward sweep: c'_i, d'_i.
    def fwd(carry, inp):
        cp_prev, dp_prev = carry
        d_i, e_i, b_i, e_im1 = inp
        denom = d_i - e_im1 * cp_prev
        cp = e_i / denom
        dp = (b_i - e_im1 * dp_prev) / denom
        return (cp, dp), (cp, dp)

    e_prev = jnp.concatenate([jnp.zeros(1, diag.dtype), e[:-1]])
    (_, _), (cps, dps) = jax.lax.scan(
        fwd, (jnp.zeros((), diag.dtype), jnp.zeros((), diag.dtype)),
        (diag, e, rhs, e_prev),
    )

    # Back substitution.
    def bwd(x_next, inp):
        cp, dp = inp
        x = dp - cp * x_next
        return x, x

    _, xs = jax.lax.scan(
        bwd, jnp.zeros((), diag.dtype), (cps, dps), reverse=True
    )
    return xs


def solve_symm_cyc_tridiag(diag, offdiag, rhs):
    """Solve symmetric CYCLIC tridiagonal A x = rhs via Sherman-Morrison.

    diag [n], offdiag [n] (offdiag[n-1] couples row n-1 with row 0), rhs [n].
    """
    n = diag.shape[0]
    if n == 1:
        return rhs / (diag + 2 * offdiag)
    if n == 2:
        # Dense 2x2: corner and offdiag coincide.
        a, d = diag[0], diag[1]
        b = offdiag[0] + offdiag[1]
        det = a * d - b * b
        x0 = (d * rhs[0] - b * rhs[1]) / det
        x1 = (a * rhs[1] - b * rhs[0]) / det
        return jnp.stack([x0, x1])
    alpha = offdiag[-1]  # the cyclic corner
    gamma = -diag[0]
    dmod = diag.at[0].add(-gamma).at[-1].add(-alpha * alpha / gamma)
    u = jnp.zeros(n, diag.dtype).at[0].set(gamma).at[-1].set(alpha)
    v = jnp.zeros(n, diag.dtype).at[0].set(1.0).at[-1].set(alpha / gamma)
    y = solve_symm_tridiag(dmod, offdiag[:-1], rhs)
    z = solve_symm_tridiag(dmod, offdiag[:-1], u)
    factor = (v @ y) / (1.0 + v @ z)
    return y - factor * z
