"""Per-primitive timing at 2D-build shapes on the real chip.

Every timed call is salted (fresh operand) to defeat axon result reuse;
each op is dispatched k times per timing loop inside ONE jit (scan) so
the per-op time excludes dispatch overhead.

PYTHONPATH=/root/repo:/root/.axon_site python tools/microbench_ops.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from gsl_scattered_interpolation_tpu.utils import config

config.enable_compile_cache()

M = 2_097_155
R = 524_288
REP = 50

rng = np.random.default_rng(0)
idx_r = jnp.asarray(rng.integers(0, M, size=(R,)), jnp.int32)
arr_m3 = jnp.asarray(rng.integers(0, M, size=(M, 3)), jnp.int32)
arr_m8 = jnp.asarray(rng.integers(0, M, size=(M, 8)), jnp.int32)
vals_r3 = jnp.asarray(rng.integers(0, M, size=(R, 3)), jnp.int32)
vals_r8 = jnp.asarray(rng.integers(0, M, size=(R, 8)), jnp.int32)
bool_m = jnp.asarray(rng.random(M) < 0.3)

from gsl_scattered_interpolation_tpu.ops import geometry


def timed(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args, jnp.int32(0))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = f(*args, jnp.int32(1))
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / REP * 1e3
    print(f"{name:28s} {dt:8.3f} ms/op", flush=True)


def rep(body):
    def fn(*args):
        *a, salt = args

        def step(c, i):
            return body(*a, c + i + salt), None

        out, _ = jax.lax.scan(
            step, jnp.int32(0), jnp.arange(REP, dtype=jnp.int32)
        )
        return out

    return fn


# 1. row gather [R] rows from [M, 3]
timed(
    "gather R rows of [M,3]",
    rep(lambda a, i, s: jnp.sum(geometry.take_rows(a, (i + s) % M))),
    arr_m3, idx_r,
)
# 1b. row gather [R] rows from [M, 8]
timed(
    "gather R rows of [M,8]",
    rep(lambda a, i, s: jnp.sum(geometry.take_rows(a, (i + s) % M))),
    arr_m8, idx_r,
)
# 2. scatter R rows into [M, 3]
timed(
    "scatter R rows into [M,3]",
    rep(lambda a, i, v, s: jnp.sum(
        a.at[(i + s) % M].set(v, mode="drop")[0]
    )),
    arr_m3, idx_r, vals_r3,
)
timed(
    "scatter R rows into [M,8]",
    rep(lambda a, i, v, s: jnp.sum(
        a.at[(i + s) % M].set(v, mode="drop")[0]
    )),
    arr_m8, idx_r, vals_r8,
)
# 3. scatter-min R scalars into [M+1]
timed(
    "scatter-min R into [M+1]",
    rep(lambda i, s: jnp.sum(
        jnp.full(M + 1, np.iinfo(np.int32).max, jnp.int32)
        .at[(i + s) % M]
        .min(i)[0:2]
    )),
    idx_r,
)
# 4. cumsum over [M]
timed(
    "cumsum over [M] int32",
    rep(lambda b, s: jnp.sum(
        jnp.cumsum((b ^ (s % 2 == 0)).astype(jnp.int32))[-1:]
    )),
    bool_m,
)
# 5. elementwise pass over [M, 3]
timed(
    "elementwise [M,3]",
    rep(lambda a, s: jnp.sum((a + s)[0])),
    arr_m3,
)
# 6. compensated predicate at [R, 3] shape (orient2d_ds)
from gsl_scattered_interpolation_tpu.ops import robust

pts_r = jnp.asarray(rng.uniform(-0.5, 0.5, size=(R, 3, 2)), jnp.float32)
timed(
    "orient2d_ds [R,3]",
    rep(lambda p, s: jnp.sum(
        robust.orient2d_ds(
            p[:, 0] + s * jnp.float32(1e-9), p[:, 1], p[:, 2]
        )[0:2]
    )),
    pts_r,
)
# 7. incircle_ds at [R, 3]
q_r = jnp.asarray(rng.uniform(-0.5, 0.5, size=(R, 3, 2)), jnp.float32)
timed(
    "incircle_ds [R,3]",
    rep(lambda p, q, s: jnp.sum(
        robust.incircle_ds(
            p[:, 0] + s * jnp.float32(1e-9), p[:, 1], p[:, 2], q[:, 0]
        )[0:2]
    )),
    pts_r, q_r,
)
