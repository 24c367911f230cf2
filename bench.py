"""Benchmark: barycentric query throughput on TPU vs CPU baseline.

North-star config 2 (BASELINE.json): batched point location + barycentric
evaluation over a Delaunay triangulation.  Builds a 2000-site model,
evaluates 10M queries on the TPU via the MXU dense-locate path (float32),
and compares against scipy's compiled-C LinearNDInterpolator (Qhull) on
the host CPU as the stand-in for CPU GSL.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from gsl_scattered_interpolation_tpu.models import (
        device_tri as dt,
        host_tree as ht,
    )

    rng = np.random.default_rng(0)
    n_sites = 2000
    sites = rng.uniform(-0.5, 0.5, size=(n_sites, 2))
    values = np.sin(6 * sites[:, 0]) * np.cos(6 * sites[:, 1])

    # Build (host engine; the device build's TPU compile is amortized in
    # round benchmarks separately) and freeze to device arrays.
    t0 = time.perf_counter()
    tree = ht.build(sites, flags=ht.NOSTANDARDIZE)
    build_s = time.perf_counter() - t0
    tri = dt.freeze(tree, grid_res=128).cast(jnp.float32)
    resp = dt.reindex_response(tree, values).astype(jnp.float32)

    chunk = 1_000_000
    n_chunks = 10
    method = "pallas" if jax.devices()[0].platform == "tpu" else "dense"
    f = jax.jit(lambda q: dt.interp(tri, resp, q, method=method))
    Q = jnp.asarray(
        rng.uniform(-0.45, 0.45, size=(chunk, 2)), jnp.float32
    )
    jax.block_until_ready(f(Q))  # compile
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        out = f(Q)
    jax.block_until_ready(out)
    dt_s = time.perf_counter() - t0
    qps = n_chunks * chunk / dt_s

    # CPU baseline: scipy's compiled Qhull linear interpolator.
    from scipy.interpolate import LinearNDInterpolator

    lin = LinearNDInterpolator(sites, values)
    qb = np.asarray(Q[:100_000], np.float64)
    lin(qb[:100])  # warm
    t0 = time.perf_counter()
    lin(qb)
    base_s = time.perf_counter() - t0
    base_qps = len(qb) / base_s

    print(
        json.dumps(
            {
                "metric": "barycentric_interp_queries_per_sec_2k_sites",
                "value": round(qps),
                "unit": "queries/s",
                "vs_baseline": round(qps / base_qps, 2),
            }
        )
    )
    print(
        f"# detail: {n_chunks}x{chunk} queries in {dt_s:.2f}s on "
        f"{jax.devices()[0].device_kind}; host build {build_s:.1f}s; "
        f"scipy LinearNDInterpolator {base_qps:.0f} q/s",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
