"""Multi-chip sharding on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsl_scattered_interpolation_tpu.models import (
    device_tri as dt,
    host_tree as ht,
    rbf,
)
from gsl_scattered_interpolation_tpu.parallel import mesh as pmesh, sharding
from gsl_scattered_interpolation_tpu.utils import datasets


@pytest.fixture(scope="module")
def mesh_dp8():
    return pmesh.make_mesh(dp=8, tp=1)


@pytest.fixture(scope="module")
def mesh_tp8():
    return pmesh.make_mesh(dp=1, tp=8)


class TestMesh:
    def test_make_mesh(self):
        m = pmesh.make_mesh(dp=4, tp=2)
        assert m.shape == {"dp": 4, "tp": 2}
        with pytest.raises(ValueError):
            pmesh.make_mesh(dp=3, tp=2)


class TestInterpSharded:
    def test_matches_single_device(self, mesh_dp8):
        sites, temps = datasets.weather()
        tree = ht.build(sites, key=0)
        tri = dt.freeze(tree)
        resp = dt.reindex_response(tree, temps)
        rng = np.random.default_rng(0)
        Q = jnp.asarray(
            rng.uniform([-89.5, 41.0], [-86.5, 43.1], size=(8 * 512, 2))
        )
        single = np.asarray(dt.interp(tri, resp, Q))
        shard = np.asarray(
            sharding.interp_sharded(tri, resp, Q, mesh_dp8)
        )
        np.testing.assert_allclose(shard, single, atol=1e-12)
        # Output really is dp-sharded across 8 devices.
        out = sharding.interp_sharded(tri, resp, Q, mesh_dp8)
        assert len(out.sharding.device_set) == 8


class TestRbfSharded:
    def test_cg_matches_direct(self, mesh_tp8):
        rng = np.random.default_rng(1)
        n = 8 * 48
        sites = rng.uniform(-0.5, 0.5, size=(n, 2))
        vals = np.sin(4 * sites[:, 0]) + sites[:, 1]
        direct = rbf.RbfInterp(
            sites, vals, kernel="wendland_c2", epsilon=6.0,
            standardize=False,
        )
        lam = sharding.rbf_fit_cg_sharded(
            sites, vals, mesh_tp8, kernel="wendland_c2", epsilon=6.0,
            tol=1e-12, maxiter=2000,
        )
        np.testing.assert_allclose(
            np.asarray(lam), np.asarray(direct.lam), atol=1e-6
        )

    def test_matvec_consistency(self, mesh_tp8):
        # Sharded matvec == dense matvec.
        rng = np.random.default_rng(2)
        n = 8 * 16
        xs = jnp.asarray(rng.uniform(-0.5, 0.5, size=(n, 2)))
        v = jnp.asarray(rng.normal(size=n))
        phi = rbf.KERNELS["wendland_c2"].phi
        A = phi(rbf.pairwise_dist(xs, xs), 6.0)
        want = np.asarray(A @ v + 0.5 * v)

        from jax.sharding import PartitionSpec as P

        f = jax.jit(
            jax.shard_map(
                lambda xl, vl: sharding.rbf_matvec_sharded(
                    xl, vl, phi, 6.0, 0.5
                ),
                mesh=mesh_tp8,
                in_specs=(P("tp", None), P("tp")),
                out_specs=P("tp"),
                check_vma=False,
            )
        )
        got = np.asarray(f(xs, v))
        np.testing.assert_allclose(got, want, atol=1e-10)


class TestRingCompactRbf:
    """Ring ppermute halo-exchange path vs single-device cell-list CG."""

    def _mesh_sp(self):
        import jax
        from jax.sharding import Mesh

        return Mesh(np.array(jax.devices()[:8]), ("sp",))

    def test_matvec_ring_matches_local(self):
        from gsl_scattered_interpolation_tpu.models import rbf, rbf_compact
        from gsl_scattered_interpolation_tpu.parallel import ring

        rng = np.random.default_rng(0)
        sites = rng.uniform(-0.5, 0.5, size=(900, 2))
        vals = np.sin(4 * sites[:, 0]) + sites[:, 1]
        eps = 10.0
        grid = rbf_compact.build_cell_grid(sites, rho=1.0 / eps)
        mesh = self._mesh_sp()
        grid = ring.pad_grid_rows(grid, mesh.shape["sp"])
        phi = rbf.KERNELS["wendland_c2"].phi
        v_pad = rbf_compact.pack_values(grid, jnp.asarray(vals))
        want = rbf_compact.matvec_pad(grid, phi, eps, 0.5, v_pad)

        import jax
        from jax.sharding import PartitionSpec as P

        f = jax.jit(
            jax.shard_map(
                lambda xs, v: ring.matvec_ring(xs, v, phi, eps, 0.5, "sp"),
                mesh=mesh,
                in_specs=(P("sp"), P("sp")),
                out_specs=P("sp"),
                check_vma=False,
            )
        )
        got = f(grid.xs_pad, v_pad)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-12, atol=1e-12
        )

    def test_fit_cg_ring_matches_dense(self):
        from gsl_scattered_interpolation_tpu.models import rbf, rbf_compact
        from gsl_scattered_interpolation_tpu.parallel import ring

        rng = np.random.default_rng(1)
        sites = rng.uniform(-0.5, 0.5, size=(500, 2))
        vals = np.cos(3 * sites[:, 0]) * sites[:, 1]
        eps = 8.0
        grid = rbf_compact.build_cell_grid(sites, rho=1.0 / eps)
        mesh = self._mesh_sp()
        grid = ring.pad_grid_rows(grid, mesh.shape["sp"])
        y_pad = rbf_compact.pack_values(grid, jnp.asarray(vals))
        lam_pad, res, it = ring.fit_cg_ring(
            grid, y_pad, mesh, epsilon=eps, tol=1e-13, maxiter=5000
        )
        lam = rbf_compact.unpack_values(grid, lam_pad)
        dense = rbf.RbfInterp(
            sites, vals, kernel="wendland_c2", epsilon=eps,
            solver="cg", cg_tol=1e-13, cg_maxiter=5000, standardize=False,
        )
        np.testing.assert_allclose(
            np.asarray(lam), np.asarray(dense.lam), atol=1e-6
        )


class TestCholeskySharded:
    def test_matches_dense(self, mesh_tp8):
        from gsl_scattered_interpolation_tpu.parallel import cholesky

        rng = np.random.default_rng(0)
        n, b = 512, 64
        B = rng.standard_normal((n, n))
        A = B @ B.T + n * np.eye(n)
        L = np.asarray(cholesky.cholesky_sharded(jnp.asarray(A), mesh_tp8, block=b))
        ref = np.linalg.cholesky(A)
        np.testing.assert_allclose(L, ref, atol=1e-8 * n)
        # solve round-trip
        x_true = rng.standard_normal(n)
        rhs = A @ x_true
        x = np.asarray(
            cholesky.cholesky_solve_sharded(
                jnp.asarray(L), jnp.asarray(rhs), mesh_tp8
            )
        )
        np.testing.assert_allclose(x, x_true, atol=1e-7)

    def test_wendland_kernel_system(self, mesh_tp8):
        # strictly-PD RBF system solved via the distributed factor
        from gsl_scattered_interpolation_tpu.parallel import cholesky

        rng = np.random.default_rng(1)
        n = 256
        xs = rng.uniform(-1, 1, size=(n, 2))
        r = np.linalg.norm(xs[:, None] - xs[None, :], axis=-1)
        t = np.maximum(1 - r / 0.8, 0.0)
        A = t**4 * (4 * r / 0.8 + 1) + 1e-10 * np.eye(n)  # wendland_c2
        y = np.sin(xs[:, 0])
        L = cholesky.cholesky_sharded(jnp.asarray(A), mesh_tp8, block=32)
        lam = np.asarray(
            cholesky.cholesky_solve_sharded(L, jnp.asarray(y), mesh_tp8)
        )
        np.testing.assert_allclose(A @ lam, y, atol=1e-8)
