"""Multi-chip execution: sharded query eval + distributed RBF solves.

The reference has no distributed code at all (no MPI/NCCL/threads —
SURVEY.md §2e); these are the TPU-native scaling paths:

* :func:`interp_sharded` — data-parallel barycentric evaluation: queries
  sharded over ``dp``, the frozen triangulation replicated; XLA partitions
  the locate matmul/walk row-wise with no communication beyond the final
  (sharded) output.
* :func:`rbf_matvec_sharded` / :func:`rbf_fit_cg_sharded` — the kernel
  matrix row-block-sharded over ``tp``: each device rebuilds its block of
  phi(|x_i - x_j|) on the fly against an all-gathered coefficient vector
  and contributes its slice of the matvec; CG scalars reduce with psum.
  This is the distributed, matrix-free analog of the blocked Cholesky the
  reference's dependency closure pointed at (linalg/gsl_linalg.h:471-474)
  — O(N/devices) memory per chip, collectives riding ICI.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..models import device_tri, rbf


def interp_sharded(
    tri, response_ext, q, mesh, method: str = "auto", cells=None
):
    """Batched interpolation with queries sharded over the mesh's dp axis.

    q's leading dimension must divide by mesh.shape['dp'].  With
    ``method="cells"`` pass a :class:`device_tri.CellIndex`; its tables
    are replicated like the triangulation (the flagship 100M-query
    configuration: dp-sharded queries, replicated candidate grid).
    """
    q_sharded = jax.device_put(q, NamedSharding(mesh, P("dp", None)))
    repl = NamedSharding(mesh, P())
    tri_r = jax.tree.map(lambda a: jax.device_put(a, repl), tri)
    resp_r = jax.device_put(response_ext, repl)
    cells_r = (
        jax.tree.map(lambda a: jax.device_put(a, repl), cells)
        if cells is not None
        else None
    )

    @functools.partial(
        jax.jit,
        static_argnames=("method",),
        out_shardings=NamedSharding(mesh, P("dp")),
    )
    def run(tri, resp, qq, cells, method):
        return device_tri.interp(
            tri, resp, qq, method=method, cells=cells
        )

    return run(tri_r, resp_r, q_sharded, cells_r, method)


def rbf_matvec_sharded(xs_local, v_local, phi, epsilon, smooth, axis="tp"):
    """One row-block-sharded kernel matvec inside shard_map.

    xs_local: [N/dev, d] this device's site block; v_local: [N/dev].
    Returns the local slice of (A + smooth I) v.  The full coefficient
    vector is all-gathered over ICI; the block of A is rebuilt on the fly
    (matrix-free), contracted on the MXU.
    """
    xs_all = jax.lax.all_gather(xs_local, axis, tiled=True)
    v_all = jax.lax.all_gather(v_local, axis, tiled=True)
    K = phi(rbf.pairwise_dist(xs_local, xs_all), epsilon)
    return (
        jnp.matmul(K, v_all, precision=jax.lax.Precision.HIGHEST)
        + smooth * v_local
    )


def rbf_fit_cg_sharded(
    sites_std,
    values,
    mesh,
    kernel: str = "wendland_c2",
    epsilon: float = 6.0,
    smooth: float = 0.0,
    tol: float = 1e-10,
    maxiter: int = 500,
    axis: str = "tp",
):
    """Distributed matrix-free CG fit of an RBF coefficient vector.

    sites_std [N, d] / values [N] with N divisible by mesh.shape[axis].
    Runs conjugate gradients entirely inside shard_map: per-device row
    blocks, all_gather for the search direction, psum for the CG scalars.
    Returns the full coefficient vector (replicated).
    """
    phi = rbf.KERNELS[kernel].phi
    n_dev = mesh.shape[axis]
    N = sites_std.shape[0]
    assert N % n_dev == 0, (N, n_dev)

    def cg_local(xs_local, y_local):
        def matvec(v_local):
            return rbf_matvec_sharded(
                xs_local, v_local, phi, epsilon, smooth, axis
            )

        def psum(x):
            return jax.lax.psum(x, axis)

        b2 = psum(jnp.vdot(y_local, y_local))
        target = tol * tol * b2

        def cond(state):
            *_, rs, it = state
            return jnp.logical_and(rs > target, it < maxiter)

        def body(state):
            x, r, p, rs, it = state
            Ap = matvec(p)
            alpha = rs / psum(jnp.vdot(p, Ap))
            x = x + alpha * p
            r = r - alpha * Ap
            rs_new = psum(jnp.vdot(r, r))
            p = r + (rs_new / rs) * p
            return x, r, p, rs_new, it + 1

        x0 = jnp.zeros_like(y_local)
        state = (x0, y_local, y_local, b2, jnp.int32(0))
        x, *_ = jax.lax.while_loop(cond, body, state)
        return jax.lax.all_gather(x, axis, tiled=True)

    spec_sites = P(*(axis, None))
    fit = jax.jit(
        jax.shard_map(
            cg_local,
            mesh=mesh,
            in_specs=(spec_sites, P(axis)),
            out_specs=P(),
            check_vma=False,
        )
    )
    return fit(jnp.asarray(sites_std), jnp.asarray(values))
