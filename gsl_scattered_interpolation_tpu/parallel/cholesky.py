"""Distributed blocked Cholesky over the tp axis (shard_map + collectives).

The reference's dependency closure carries GSL's serial Cholesky
(linalg/gsl_linalg.h:471-474, cholesky.c) for the planned dense-RBF solve;
this is the TPU-native replacement: a right-looking blocked factorization
with the matrix row-block-sharded over the mesh's ``tp`` axis.  Each step
broadcasts one [b, b] diagonal block and one [n, b] panel (``all_gather``
riding ICI) and every device applies the rank-b trailing update to its own
row slice on the MXU — the communication-optimal 1-D version of ScaLAPACK's
pdpotrf, expressed as jax collectives instead of MPI.

The factor count is O(n^3 / D) FLOPs and O(n b) words of communication per
step; with b = n/#steps fixed this is the classic panel algorithm.  For the
conditionally-PD RBF saddle systems see models/rbf.py (projected CG /
local-Lagrange PCG) — this module serves the strictly-PD paths (Wendland
kernel matrices, kriging normal systems) and completes SURVEY §7.6's
"blocked/sharded Cholesky" line.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P


def _chol_unblocked(a):
    """Cholesky of a replicated small block (jnp.linalg, runs per-device)."""
    return jnp.linalg.cholesky(a)


def cholesky_sharded(A, mesh, block: int = 256, axis: str = "tp"):
    """Lower-Cholesky factor of PD matrix ``A`` ([n, n]), row-sharded.

    Args:
      A: [n, n] symmetric positive definite (only the lower triangle is
        read).  n must be divisible by ``mesh.shape[axis] * 1`` and by
        ``block``.
      mesh: jax.sharding.Mesh with the ``axis`` name.
      block: panel width b.

    Returns L ([n, n], lower triangular, sharded like A was placed).
    """
    n = A.shape[0]
    D = mesh.shape[axis]
    if n % block:
        raise ValueError(f"n={n} must divide by block={block}")
    if n % D:
        raise ValueError(f"n={n} must divide by mesh axis size {D}")
    K = n // block
    rows_per = n // D

    A = jax.device_put(A, NamedSharding(mesh, P(axis, None)))

    @functools.partial(
        jax.jit,
        out_shardings=NamedSharding(mesh, P(axis, None)),
    )
    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=P(axis, None),
        out_specs=P(axis, None),
    )
    def factor(a_local):
        # a_local: [rows_per, n] — this device's contiguous row slice.
        didx = jax.lax.axis_index(axis)
        row0 = didx * rows_per
        dtype = a_local.dtype

        def step(k, a_local):
            c0 = k * block
            # 1. gather the full current block column [n, b]
            col_local = jax.lax.dynamic_slice(
                a_local, (0, c0), (rows_per, block)
            )
            col = jax.lax.all_gather(
                col_local, axis, tiled=True
            )                                   # [n, b]
            akk = jax.lax.dynamic_slice(col, (c0, 0), (block, block))
            lkk = _chol_unblocked(akk)          # replicated [b, b]
            # 2. panel: L[k:, k] = A[k:, k] L_kk^{-T}  (triangular solve,
            # computed on the full gathered column — O(n b^2) replicated
            # work, negligible vs the O(n^2 b / D) trailing update)
            panel = jax.scipy.linalg.solve_triangular(
                lkk, col.T, lower=True
            ).T                                 # [n, b]
            # zero rows above the diagonal block; identity-fill inside it
            r = jnp.arange(n, dtype=jnp.int32)[:, None]
            panel = jnp.where(r >= c0, panel, 0.0)
            panel = jnp.where(
                (r >= c0) & (r < c0 + block),
                jax.lax.dynamic_update_slice(
                    jnp.zeros((n, block), dtype), lkk, (c0, 0)
                ),
                panel,
            )
            # 3. write this device's slice of the block column back
            my_panel = jax.lax.dynamic_slice(
                panel, (row0, jnp.zeros_like(row0)), (rows_per, block)
            )
            a_local = jax.lax.dynamic_update_slice(
                a_local, my_panel, (0, c0)
            )
            # 4. trailing update on local rows (MXU):
            #    A[i, c0+b:] -= L[i, k] @ L[c0+b:, k]^T
            upd = my_panel @ panel.T            # [rows_per, n]
            keep = jnp.arange(n, dtype=jnp.int32)[None, :] >= c0 + block
            return a_local - jnp.where(keep, upd, 0.0)

        a_local = jax.lax.fori_loop(0, K, step, a_local)
        # zero the strict upper triangle of the local slice
        cols = jnp.arange(n, dtype=jnp.int32)[None, :]
        rows = row0 + jnp.arange(rows_per, dtype=jnp.int32)[:, None]
        return jnp.where(cols <= rows, a_local, 0.0)

    return factor(A)


def cholesky_solve_sharded(L, b, mesh, axis: str = "tp"):
    """Solve A x = b given the sharded factor L (forward+back substitution).

    Substitution is inherently sequential across blocks; it gathers L to
    each device once and runs the replicated triangular solves — the
    factorization is the O(n^3) part worth distributing, the O(n^2) solves
    are not.  (ScaLAPACK reaches the same conclusion for skinny RHS.)
    """
    Lg = jax.lax.with_sharding_constraint(
        L, NamedSharding(mesh, P())
    )

    @jax.jit
    def solve(Lg, b):
        y = jax.scipy.linalg.solve_triangular(Lg, b, lower=True)
        return jax.scipy.linalg.solve_triangular(
            Lg.T, y, lower=False
        )

    return solve(Lg, b)
