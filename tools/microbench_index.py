"""Microbench the primitives for a device-side cell-index build.

axon gotcha: block_until_ready can return before execution — each
measurement runs a jitted fori_loop of `ITERS` data-dependent, salted
iterations and pays ONE scalar readback; per-op time = (wall - readback)
/ ITERS, with readback cost measured on a trivial program.

Run ON TPU:
  nohup python tools/microbench_index.py > /tmp/mb_index.log 2>&1 &
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 10


def timed(make_body, *args, label=""):
    """make_body(i, carry_scalar, *args) -> scalar contribution."""

    @jax.jit
    def run(*args):
        def body(i, acc):
            return acc + make_body(i, acc, *args)

        return jax.lax.fori_loop(0, ITERS, body, jnp.int32(0))

    out = run(*args)
    _ = int(out)  # compile + first-touch
    t0 = time.perf_counter()
    out = int(run(*args))
    wall = time.perf_counter() - t0
    return wall


def readback_cost():
    @jax.jit
    def trivial(x):
        return x + 1

    x = jnp.int32(3)
    int(trivial(x))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        int(trivial(x + 1))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    print(jax.devices(), flush=True)
    rb = readback_cost()
    print(f"scalar readback {rb*1e3:.0f} ms", flush=True)
    rng = np.random.default_rng(0)
    C = 4_000_000
    IMAX = np.iinfo(np.int32).max

    for P in (4_000_000, 16_000_000, 48_000_000):
        keys = jnp.asarray(rng.integers(0, C, P), jnp.int32)
        vals = jnp.asarray(
            rng.integers(0, IMAX // 2, P), jnp.int32
        )

        def b_sort(i, acc, k, v):
            sk, sv = jax.lax.sort((k + i, v), num_keys=1)
            return sk[0] + sv[P - 1]

        def b_hist(i, acc, k, v):
            h = jnp.zeros(C, jnp.int32).at[(k + acc % 2)].add(1)
            return h[0] + h[C - 1]

        def b_minround(i, acc, k, v):
            tbl = jnp.full(C, IMAX, jnp.int32).at[k].min(v + i)
            win = tbl[k] == v + i
            return jnp.sum(win.astype(jnp.int32))

        def b_cummax(i, acc, k, v):
            cm = jax.lax.cummax(k + i)
            return cm[P - 1]

        def b_gather(i, acc, k, v):
            big = jnp.arange(C, dtype=jnp.int32) * 3 + i
            g = big[k]
            return g[0] + g[P - 1]

        for name, body in [
            ("sort(k,v)  ", b_sort),
            ("hist       ", b_hist),
            ("minrnd+gath", b_minround),
            ("cummax     ", b_cummax),
            ("gather     ", b_gather),
        ]:
            w = timed(body, keys, vals, label=name)
            per = (w - rb) / ITERS
            print(
                f"P={P:>9}: {name} {per*1e3:8.1f} ms/op "
                f"(wall {w:.2f}s)",
                flush=True,
            )

    cnts = jnp.asarray(rng.integers(0, 20, C), jnp.int32)

    def b_cumsum(i, acc, c):
        cs = jnp.cumsum(c + i)
        return cs[C - 1]

    w = timed(b_cumsum, cnts)
    print(f"C={C:>9}: cumsum       {(w-rb)/ITERS*1e3:8.1f} ms/op", flush=True)


if __name__ == "__main__":
    main()
