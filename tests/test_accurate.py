"""Accurate-f32 transcendentals and the VPU batched solver.

ops/accurate.py exists because the target TPU's jnp.log is a ~2.4e-3
relative approximation and jnp.linalg.solve's batched LU runs its block
updates in bf16 (both measured on hardware; see CLAUDE.md).  These tests
pin the bit-twiddle log and the pivoted-elimination solver on the CPU
backend, where the reference values are trustworthy.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from gsl_scattered_interpolation_tpu.ops import accurate
from gsl_scattered_interpolation_tpu.models.rbf_pu import _plu_solve_batched


class TestAccurateLog:
    def test_matches_reference_f32(self):
        rng = np.random.default_rng(0)
        x = np.concatenate(
            [
                rng.uniform(1e-6, 4.0, 50_000),
                rng.uniform(1.0, 1e30, 2_000),
                rng.uniform(1e-30, 1e-3, 2_000),
                [1.18e-38, 0.5, 1.0, 2.0, np.sqrt(2.0), 1e30],
            ]
        ).astype(np.float32)
        got = np.asarray(accurate.log(jnp.asarray(x)), np.float64)
        ref = np.log(x.astype(np.float64))
        rel = np.abs(got - ref) / np.maximum(np.abs(ref), 1e-12)
        assert rel.max() < 5e-7  # ~2 ulps

    def test_special_values(self):
        out = np.asarray(
            accurate.log(jnp.asarray([0.0, -1.0, np.inf, 1.0], jnp.float32))
        )
        assert out[0] == -np.inf
        assert np.isnan(out[1])
        assert out[2] == np.inf
        assert out[3] == 0.0

    def test_f64_passthrough(self):
        x = jnp.asarray([0.5, 1.0, 3.0], jnp.float64)
        np.testing.assert_allclose(
            np.asarray(accurate.log(x)), np.log(np.asarray(x)), rtol=1e-15
        )

    def test_xlogy_zero_convention(self):
        out = np.asarray(
            accurate.xlogy(
                jnp.asarray([0.0, 2.0], jnp.float32),
                jnp.asarray([0.0, 3.0], jnp.float32),
            )
        )
        assert out[0] == 0.0
        np.testing.assert_allclose(out[1], 2 * np.log(3.0), rtol=1e-6)


class TestPluSolve:
    @pytest.mark.parametrize("dtype", [jnp.float32, jnp.float64])
    def test_random_systems(self, dtype):
        rng = np.random.default_rng(1)
        B, W = 16, 61
        K = rng.standard_normal((B, W, W))
        x_true = rng.standard_normal((B, W))
        rhs = np.einsum("bij,bj->bi", K, x_true)
        x = np.asarray(
            _plu_solve_batched(jnp.asarray(K, dtype), jnp.asarray(rhs, dtype))
        )
        tol = 1e-3 if dtype == jnp.float32 else 1e-9
        assert np.abs(x - x_true).max() / np.abs(x_true).max() < tol

    def test_needs_pivoting(self):
        # zero leading pivot: unpivoted elimination would divide by zero
        K = np.array([[[0.0, 1.0], [1.0, 1.0]]])
        rhs = np.array([[2.0, 3.0]])
        x = np.asarray(_plu_solve_batched(jnp.asarray(K), jnp.asarray(rhs)))
        np.testing.assert_allclose(x, [[1.0, 2.0]], atol=1e-12)

    def test_saddle_system(self):
        # TPS-like conditionally-PD saddle block structure
        rng = np.random.default_rng(2)
        W, B = 40, 4
        xs = rng.uniform(0, 3, (B, W, 2))
        d = np.linalg.norm(xs[:, :, None] - xs[:, None], axis=-1)
        with np.errstate(divide="ignore", invalid="ignore"):
            A = np.where(d > 0, d**2 * np.log(d), 0.0)
        P = np.concatenate([np.ones((B, W, 1)), xs], axis=2)
        K = np.zeros((B, W + 3, W + 3))
        K[:, :W, :W] = A
        K[:, :W, W:] = P
        K[:, W:, :W] = np.swapaxes(P, 1, 2)
        rhs = np.concatenate(
            [np.sin(xs[:, :, 0]), np.zeros((B, 3))], axis=1
        )
        ref = np.linalg.solve(K, rhs[..., None])[..., 0]
        got = np.asarray(
            _plu_solve_batched(jnp.asarray(K), jnp.asarray(rhs))
        )
        np.testing.assert_allclose(got, ref, atol=1e-8)
