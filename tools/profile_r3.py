"""Round-3 profiling: 2D 1M build phase breakdown + 3D cavity build rate.

Run on TPU:  PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_r3.py [2d|3d|3dq]
"""

import logging
import sys
import time

import numpy as np

logging.basicConfig(level=logging.INFO)

import jax
import jax.numpy as jnp

from gsl_scattered_interpolation_tpu.utils import config

config.enable_compile_cache()
config.log.setLevel(logging.INFO)

mode = sys.argv[1] if len(sys.argv) > 1 else "2d"


def run_2d(n=1_000_000):
    from gsl_scattered_interpolation_tpu.models import (
        device_delaunay as dd, host_tree as ht,
    )

    rng = np.random.default_rng(7)
    sites = rng.uniform(-0.5, 0.5, size=(n, 2))
    for rep in range(3):
        t0 = time.perf_counter()
        tri, shuf = dd.triangulate(
            sites, flags=ht.NOSTANDARDIZE, dtype=jnp.float32,
            chunk_threshold=400_000, grid_res=512,
        )
        jax.block_until_ready(tri.tri_verts)
        print(f"== build {rep}: {time.perf_counter()-t0:.2f}s", flush=True)


def run_3d(n=10_000):
    from gsl_scattered_interpolation_tpu.models import (
        device_cavity as dc, host_tree as ht,
    )

    from gsl_scattered_interpolation_tpu.models import device_tri as dt

    rng = np.random.default_rng(13)
    sites = rng.uniform(-0.5, 0.5, size=(n, 3))
    for rep in range(2):
        t0 = time.perf_counter()
        tri, shuf = dc.triangulate(
            sites, flags=ht.NOSTANDARDIZE, dtype=jnp.float32
        )
        jax.block_until_ready(tri.tri_verts)
        print(f"== 3d build {rep} n={n}: {time.perf_counter()-t0:.2f}s",
              flush=True)
    # accuracy vs scipy (the VERDICT outlier check: max, not just p999)
    vals = np.sin(3 * sites[:, 0]) * np.cos(2 * sites[:, 1]) + sites[:, 2]
    resp = dt.response_for_build(shuf, vals, d=3).astype(jnp.float32)
    q = rng.uniform(-0.45, 0.45, size=(50_000, 3))
    out = np.asarray(
        dt.interp(tri.cast(jnp.float32), resp,
                  jnp.asarray(q, jnp.float32), method="walk")
    )
    from scipy.interpolate import LinearNDInterpolator

    ref = LinearNDInterpolator(sites, vals)(q)
    ok = np.isfinite(ref)
    err = np.abs(out[ok] - ref[ok])
    print(f"== 3d err: max {err.max():.3e} p999 "
          f"{np.quantile(err, 0.999):.3e} n_out>1e-4 "
          f"{(err > 1e-4).sum()} n_out>1e-5 {(err > 1e-5).sum()}",
          flush=True)

    # query throughput: walk (grid starts) vs cell index
    tri32 = tri.cast(jnp.float32)
    resp_tri = dt.vertex_responses(tri32, resp)
    t0 = time.perf_counter()
    cells = dt.build_cell_index(tri32)
    print(f"== 3d cell index build {time.perf_counter()-t0:.2f}s "
          f"G={cells.res} K={cells.k} overflow="
          f"{float(jnp.mean(cells.overflow.astype(jnp.float32))):.4f}",
          flush=True)
    B = 1_000_000
    Q = jnp.asarray(rng.uniform(-0.45, 0.45, size=(B, 3)), jnp.float32)
    for method, kw in (("walk", {}), ("cells", {"cells": cells})):
        f = jax.jit(
            lambda t, rt, q, s, **k: dt.interp(
                t, None, q + s, method=method, resp_tri=rt, **k
            )
        )
        out0 = f(tri32, resp_tri, Q, jnp.float32(0.0), **kw)
        jax.block_until_ready(out0)
        n_rep = 5
        t0 = time.perf_counter()
        outs = [
            f(tri32, resp_tri, Q, jnp.float32(1e-6 * (i + 1)), **kw)
            for i in range(n_rep)
        ]
        jax.block_until_ready(outs[-1])
        dt_s = time.perf_counter() - t0
        print(f"== 3d queries {method}: {n_rep*B/dt_s/1e6:.2f} Mq/s",
              flush=True)
    return tri, shuf, sites


def run_pallas_boundary(n_sites=50_000):
    """VERDICT #8: pallas vs dense locate agreement at the T~100k VMEM
    boundary, on a real device build, on the real chip."""
    from gsl_scattered_interpolation_tpu.models import (
        device_delaunay as dd, device_tri as dt, host_tree as ht,
    )
    from gsl_scattered_interpolation_tpu.ops import pallas_locate

    rng = np.random.default_rng(3)
    sites = rng.uniform(-0.5, 0.5, size=(n_sites, 2))
    tri, shuf = dd.triangulate(
        sites, flags=ht.NOSTANDARDIZE, dtype=jnp.float32, grid_res=256
    )
    tri32 = tri.cast(jnp.float32)
    T = tri32.n_tris
    q = jnp.asarray(rng.uniform(-0.45, 0.45, size=(200_000, 2)), jnp.float32)
    leaf_p = pallas_locate.locate_dense_pallas(tri32, q)
    w_p = dt._weights(tri32, leaf_p, q)
    cells = dt.build_cell_index(tri32)
    leaf_c, w_c, in_c = dt.locate_cells(tri32, cells, q)
    # leaves may differ on shared edges; min weights and values must agree
    mw_p = np.asarray(jnp.min(w_p, -1))
    mw_c = np.asarray(jnp.min(w_c, -1))
    dmw = np.max(np.abs(mw_p - mw_c))
    resp = np.random.default_rng(4).standard_normal(
        tri32.points_raw.shape[0]
    ).astype(np.float32)
    resp[:3] = 0
    rj = jnp.asarray(resp)
    v_p = np.asarray(jnp.sum(w_p * rj[tri32.tri_verts[leaf_p]], -1))
    v_c = np.asarray(jnp.sum(w_c * rj[tri32.tri_verts[leaf_c]], -1))
    dv = np.max(np.abs(v_p - v_c))
    print(f"== pallas boundary T={T}: max|minw diff|={dmw:.3e} "
          f"max|value diff|={dv:.3e}", flush=True)


if mode == "2d":
    run_2d()
elif mode == "3d":
    run_3d(int(sys.argv[2]) if len(sys.argv) > 2 else 10_000)
elif mode == "pallas":
    run_pallas_boundary(int(sys.argv[2]) if len(sys.argv) > 2 else 50_000)
