"""Benchmarks against the BASELINE.md north-star configs (TPU v5e).

Headline (the ONE JSON line): barycentric query throughput over a 2k-site
Delaunay triangulation via the Pallas locate kernel, vs scipy's compiled-C
Qhull ``LinearNDInterpolator`` as the CPU-GSL stand-in.

The ``extra`` field carries the at-scale configs:
  * build_1m        — 1M-site 2D Delaunay device build (f32, chunked) vs
                      scipy Qhull ``Delaunay`` wall time            (config 1)
  * queries_100m    — 100M queries over the 1M-site triangulation via the
                      cell-candidate index                          (config 2)
  * tps_100k        — partition-of-unity thin-plate fit at 100k sites,
                      wall time + max interpolation residual        (config 3)
  * wendland_1m     — compactly-supported Wendland-C2 fit at 1M sites
                      (cell-list CG)                                (config 4)
  * cavity3d_10k    — 3D device cavity build at 10k sites, accuracy vs
                      scipy Qhull               (arbitrary-d, README:19)

Set GSI_BENCH_SKIP=build,qscale,tps,wendland,cavity,q3d,weights to skip
parts; at-scale parts are skipped automatically off-TPU.  Compile-cache
honesty: the persistent cache (.jax_cache) is WORKSPACE-local and
gitignored — a fresh clone pays ~100-400s of XLA compile per big program
through the axon tunnel on its first run; subsequent runs in the same
workspace execute from cache.  The ``compile_cache`` extra records which
regime a given run was in.
"""

import json
import os
import sys
import time

import numpy as np

SKIP = set(
    s.strip() for s in os.environ.get("GSI_BENCH_SKIP", "").split(",") if s
)


def _log(msg):
    print(f"# {msg}", file=sys.stderr, flush=True)


def _guard(extra, key):
    """Per-sub-config failure guard: one crashed config must never destroy
    the evidence of the others (BENCH_r03 lost queries_3d AND blame
    attribution to a single try/except around all of bench_cavity3d)."""

    def deco(fn):
        def run(*args, **kw):
            try:
                return fn(*args, **kw)
            except Exception as e:
                extra[key + "_error"] = repr(e)[:300]
                _log(f"{key} failed: {e!r}")
                return None

        return run

    return deco


def _cache_state():
    """Record whether this run had a warm persistent compile cache."""
    cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
    cache_dir = os.environ.get("GSI_TPU_CACHE_DIR", cache_dir)
    try:
        n = len(os.listdir(cache_dir))
    except OSError:
        n = 0
    return {"entries_at_start": n, "dir": os.path.basename(cache_dir)}


def headline():
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

    t0 = time.perf_counter()
    tree = ht.build(sites, flags=ht.NOSTANDARDIZE)
    build_s = time.perf_counter() - t0
    tri = dt.freeze(tree, grid_res=128).cast(jnp.float32)
    resp = dt.reindex_response(tree, values).astype(jnp.float32)
    # Per-triangle response triplets: one [B, 3] row gather at eval time
    # instead of the two-level vertex-id -> response gather (the same
    # precompute the 100M-query config uses; ~10% at this T).
    resp_tri = dt.vertex_responses(tri, resp)

    chunk = 1_000_000
    n_chunks = 10
    method = "pallas" if jax.devices()[0].platform == "tpu" else "dense"
    f = jax.jit(
        lambda q: dt.interp(tri, None, q, method=method, resp_tri=resp_tri)
    )
    Q = jnp.asarray(rng.uniform(-0.45, 0.45, size=(chunk, 2)), jnp.float32)
    out0 = f(Q)
    jax.block_until_ready(out0)  # compile
    if method != "dense":
        # agreement gate: a broken fast path must not report a plausible
        # throughput (same check as tools/exp_headline.py); the fast
        # path's f32 score can pick an adjacent triangle on boundary
        # queries — the linear extension there is continuous, so values
        # agree to O(score noise x gradient jump).
        ref0 = dt.interp(
            tri, None, Q[:100_000], method="dense", resp_tri=resp_tri
        )
        diff = float(
            jnp.max(jnp.abs(out0[:100_000] - ref0))
        )
        assert diff < 1e-3, f"{method} vs dense locate: diff {diff}"
    # salt each call (fresh operand) so axon result reuse cannot inflate
    # the number (CLAUDE.md microbenchmark trap)
    t0 = time.perf_counter()
    for i in range(n_chunks):
        out = f(Q + jnp.float32(i * 1e-9))
    jax.block_until_ready(out)
    dt_s = time.perf_counter() - t0
    qps = n_chunks * chunk / dt_s

    from scipy.interpolate import LinearNDInterpolator

    lin = LinearNDInterpolator(sites, values)
    qb = np.asarray(Q[:100_000], np.float64)
    lin(qb[:100])  # warm
    t0 = time.perf_counter()
    lin(qb)
    base_qps = len(qb) / (time.perf_counter() - t0)
    _log(
        f"headline: {n_chunks}x{chunk} queries in {dt_s:.2f}s; host build "
        f"{build_s:.1f}s; scipy {base_qps:.0f} q/s"
    )
    return qps, base_qps


def bench_build_and_queries(extra):
    """Configs 1 + 2 at scale: 1M-site build, then 100M queries over it."""
    import jax
    import jax.numpy as jnp

    from gsl_scattered_interpolation_tpu.models import (
        device_delaunay as dd,
        device_tri as dt,
        host_tree as ht,
    )

    N = 1_000_000
    rng = np.random.default_rng(7)
    sites = rng.uniform(-0.5, 0.5, size=(N, 2))
    values = np.sin(6 * sites[:, 0]) * np.cos(6 * sites[:, 1])

    state = {"tri": None, "shuf": None}

    @_guard(extra, "build")
    def run_build():
        t0 = time.perf_counter()
        tri, shuf = dd.triangulate(
            sites,
            flags=ht.NOSTANDARDIZE,
            dtype=jnp.float32,
            chunk_threshold=400_000,
            grid_res=512,
        )
        t_build = time.perf_counter() - t0
        # Steady-state build: the first build in a process additionally
        # pays ~10-15s of one-time executable loading through the axon
        # compile tunnel (see utils/aot.py); a service building many
        # triangulations per process runs at this rate.  Two steady
        # builds, best-of reported as the steady rate (axon server-side
        # variance is +-1.5s and occasionally several seconds — r4's
        # 17.1s was not reproducible in r5, which measured 8.8-9.3s);
        # both samples are recorded.
        steadies = []
        for _ in range(4):
            t0 = time.perf_counter()
            tri, shuf = dd.triangulate(
                sites,
                flags=ht.NOSTANDARDIZE,
                dtype=jnp.float32,
                chunk_threshold=400_000,
                grid_res=512,
            )
            steadies.append(time.perf_counter() - t0)
        t_steady = min(steadies)
        state["tri"], state["shuf"] = tri, shuf
        from scipy.spatial import Delaunay as ScipyDelaunay

        # best-of-2, same treatment as the TPU steady samples (the
        # 1-core host shows the same server-load variance)
        qh = []
        for _ in range(2):
            t0 = time.perf_counter()
            ScipyDelaunay(sites)
            qh.append(time.perf_counter() - t0)
        t_qhull = min(qh)
        extra["build_1m"] = {
            "tpu_s": round(t_build, 1),
            "tpu_steady_s": round(t_steady, 1),
            "tpu_steady_samples": [round(s, 1) for s in steadies],
            "qhull_s": round(t_qhull, 1),
            "vs_qhull": round(t_qhull / t_build, 3),
            "vs_qhull_steady": round(t_qhull / t_steady, 3),
        }
        _log(
            f"build_1m: tpu {t_build:.1f}s (steady {t_steady:.1f}s) "
            f"vs qhull {t_qhull:.1f}s"
        )

    @_guard(extra, "qscale")
    def run_qscale():
        tri, shuf = state["tri"], state["shuf"]
        if tri is None:
            tri, shuf = dd.triangulate(
                sites,
                flags=ht.NOSTANDARDIZE,
                dtype=jnp.float32,
                grid_res=512,
            )
        resp = dt.response_for_build(shuf, values).astype(jnp.float32)
        tri32 = tri.cast(jnp.float32)
        # Index-build cost is part of the end-to-end story (device-built
        # at this scale since r5): report it alongside the throughput.
        t0 = time.perf_counter()
        cells = dt.build_cell_index(tri32)
        jax.block_until_ready(cells.table)
        t_index = time.perf_counter() - t0
        # Steady sample: second build on a salted copy (axon reuses the
        # result of a bit-identical program+input — CLAUDE.md trap).
        # The first in-process build additionally pays the one-time
        # executable load of the device index program.
        import jax.numpy as _jnp

        tri_salt = tri32._replace(
            points_std=tri32.points_std + _jnp.float32(1e-8)
        )
        t0 = time.perf_counter()
        cells2 = dt.build_cell_index(tri_salt)
        jax.block_until_ready(cells2.table)
        t_index_steady = time.perf_counter() - t0
        del cells2, tri_salt
        # Per-triangle response triplets: one [B, 3] row gather at eval
        # instead of a two-level vertex-id -> response gather (~25%).
        resp_tri = dt.vertex_responses(tri32, resp)
        chunk = 5_000_000
        # big arrays must ride as jit ARGUMENTS — closing over them
        # serializes them into the axon remote-compile request (HTTP 413)
        f = jax.jit(
            lambda t, rt, q, c: dt.interp(
                t, None, q, method="cells", cells=c, resp_tri=rt
            )
        )
        Q = jnp.asarray(
            rng.uniform(-0.45, 0.45, size=(chunk, 2)), jnp.float32
        )
        jax.block_until_ready(f(tri32, resp_tri, Q, cells))
        n_chunks = 20  # 100M total
        # salt each call (fresh operand) so axon result reuse cannot
        # inflate the number; the added element-wise add is negligible
        t0 = time.perf_counter()
        for i in range(n_chunks):
            out = f(tri32, resp_tri, Q + jnp.float32(i * 1e-9), cells)
        jax.block_until_ready(out)
        dt_s = time.perf_counter() - t0
        extra["queries_100m"] = {
            "qps": round(n_chunks * chunk / dt_s),
            "total_s": round(dt_s, 1),
            "index_build_s": round(t_index, 1),
            "index_build_steady_s": round(t_index_steady, 1),
            "index_complete": bool(cells.complete),
        }
        _log(
            f"queries_100m: {n_chunks*chunk/dt_s/1e6:.1f} Mq/s "
            f"(index build {t_index:.1f}s, steady {t_index_steady:.1f}s)"
        )

    if "build" not in SKIP:
        run_build()
    if "qscale" not in SKIP:
        run_qscale()


def bench_cavity3d(extra):
    """3D device cavity build (the reference's planned arbitrary-d path,
    README:19): 10k sites, parallel Bowyer-Watson on TPU, accuracy vs
    scipy's Qhull-based linear interpolator."""
    import jax
    import jax.numpy as jnp

    from gsl_scattered_interpolation_tpu.models import (
        device_cavity as dc,
        device_tri as dt,
        host_tree as ht,
    )

    from scipy.interpolate import LinearNDInterpolator
    from scipy.spatial import Delaunay as ScipyDelaunay

    N = 10_000
    rng = np.random.default_rng(13)
    sites = rng.uniform(-0.5, 0.5, size=(N, 3))
    vals = np.sin(3 * sites[:, 0]) * np.cos(2 * sites[:, 1]) + sites[:, 2]
    state = {}

    @_guard(extra, "cavity")
    def run_cavity_build():
        t0 = time.perf_counter()
        tri, shuf = dc.triangulate(
            sites, flags=ht.NOSTANDARDIZE, dtype=jnp.float32
        )
        t_build = time.perf_counter() - t0
        # steady-state: best-of-2 rebuilds in-process (programs
        # AOT-loaded; salted sites against axon result reuse) — the
        # per-build cost a production fit loop actually pays.  Server
        # variance on this ~2.5s signal is ~+-1s (r5 samples 2.5-3.5s).
        steadies = []
        for k in (1, 2):
            t0 = time.perf_counter()
            tri, shuf = dc.triangulate(
                sites + k * 1e-7, flags=ht.NOSTANDARDIZE,
                dtype=jnp.float32,
            )
            jax.block_until_ready(tri.tri_verts)
            steadies.append(time.perf_counter() - t0)
        t_steady = min(steadies)
        resp = dt.response_for_build(shuf, vals, d=3).astype(jnp.float32)
        state["tri32"] = tri.cast(jnp.float32)
        state["resp"] = resp
        q = rng.uniform(-0.45, 0.45, size=(20_000, 3))
        out = np.asarray(
            dt.interp(
                state["tri32"], resp, jnp.asarray(q, jnp.float32),
                method="walk",
            )
        )
        t0 = time.perf_counter()
        ScipyDelaunay(sites)
        t_qhull = time.perf_counter() - t0
        ref = LinearNDInterpolator(sites + 2e-7, vals)(q)  # last rebuild
        ok = np.isfinite(ref)
        err = np.abs(out[ok] - ref[ok])
        extra["cavity3d_10k"] = {
            "tpu_s": round(t_build, 1),
            "tpu_steady_s": round(t_steady, 1),
            "tpu_steady_samples": [round(s, 1) for s in steadies],
            "qhull_s": round(t_qhull, 2),
            "p999_err_vs_scipy": float(f"{np.quantile(err, 0.999):.3e}"),
            "max_err_vs_scipy": float(f"{err.max():.3e}"),
            "n_err_gt_1e4": int((err > 1e-4).sum()),
            "n_err_gt_1e5": int((err > 1e-5).sum()),
        }
        _log(
            f"cavity3d_10k: tpu {t_build:.1f}s (steady {t_steady:.1f}s) "
            f"vs qhull {t_qhull:.2f}s, max err {err.max():.2e}, "
            f"p999 {np.quantile(err, 0.999):.2e}"
        )

    @_guard(extra, "cavity100k")
    def run_cavity_100k():
        # at-scale 3D build (VERDICT r3 item 2: "a 100k 3D build in BENCH")
        N2 = 100_000
        rng3 = np.random.default_rng(17)
        sites2 = rng3.uniform(-0.5, 0.5, size=(N2, 3))
        vals2 = (
            np.sin(3 * sites2[:, 0]) * np.cos(2 * sites2[:, 1])
            + sites2[:, 2]
        )
        t0 = time.perf_counter()
        tri2, shuf2 = dc.triangulate(
            sites2, flags=ht.NOSTANDARDIZE, dtype=jnp.float32
        )
        jax.block_until_ready(tri2.tri_verts)
        t_build = time.perf_counter() - t0
        # steady-state at 100k (VERDICT r4 item 2: record it)
        t0 = time.perf_counter()
        tri2, shuf2 = dc.triangulate(
            sites2 + 1e-7, flags=ht.NOSTANDARDIZE, dtype=jnp.float32
        )
        jax.block_until_ready(tri2.tri_verts)
        t_steady = time.perf_counter() - t0
        t0 = time.perf_counter()
        ScipyDelaunay(sites2)
        t_qhull = time.perf_counter() - t0
        resp2 = dt.response_for_build(shuf2, vals2, d=3).astype(jnp.float32)
        q = rng3.uniform(-0.45, 0.45, size=(20_000, 3))
        out = np.asarray(
            dt.interp(
                tri2.cast(jnp.float32), resp2, jnp.asarray(q, jnp.float32),
                method="walk",
            )
        )
        ref = LinearNDInterpolator(sites2, vals2)(q)
        ok = np.isfinite(ref)
        err = np.abs(out[ok] - ref[ok])
        extra["cavity3d_100k"] = {
            "tpu_s": round(t_build, 1),
            "tpu_steady_s": round(t_steady, 1),
            "qhull_s": round(t_qhull, 2),
            "p999_err_vs_scipy": float(f"{np.quantile(err, 0.999):.3e}"),
            "max_err_vs_scipy": float(f"{err.max():.3e}"),
            "n_tets": int(tri2.tri_verts.shape[0]),
        }
        _log(
            f"cavity3d_100k: tpu {t_build:.1f}s (steady {t_steady:.1f}s) "
            f"vs qhull {t_qhull:.2f}s, max err {err.max():.2e}"
        )

    @_guard(extra, "q3d")
    def run_queries_3d():
        # 3D at-scale queries: cell-candidate index + walk fallback.
        tri32, resp = state["tri32"], state["resp"]
        t0 = time.perf_counter()
        cells = dt.build_cell_index(tri32)
        jax.block_until_ready(cells.table)
        t_index = time.perf_counter() - t0
        tri_salt = tri32._replace(
            points_std=tri32.points_std + jnp.float32(1e-8)
        )
        t0 = time.perf_counter()
        cells2 = dt.build_cell_index(tri_salt)
        jax.block_until_ready(cells2.table)
        t_index_steady = time.perf_counter() - t0
        del cells2, tri_salt
        resp_tri = dt.vertex_responses(tri32, resp)
        chunk = 2_000_000
        f = jax.jit(
            lambda t, rt, q, c: dt.interp(
                t, None, q, method="cells", cells=c, resp_tri=rt
            )
        )
        rng2 = np.random.default_rng(14)
        Q = jnp.asarray(
            rng2.uniform(-0.45, 0.45, size=(chunk, 3)), jnp.float32
        )
        out0 = f(tri32, resp_tri, Q, cells)
        jax.block_until_ready(out0)
        # agreement gate vs scipy on a subsample before timing
        sub = np.asarray(Q[:20_000], np.float64)
        ref2 = LinearNDInterpolator(sites, vals)(sub)
        ok2 = np.isfinite(ref2)
        gate = np.max(np.abs(np.asarray(out0[:20_000])[ok2] - ref2[ok2]))
        assert gate < 1e-3, f"queries_3d gate vs scipy: {gate}"
        n_chunks = 10
        # salted (see queries_100m)
        t0 = time.perf_counter()
        for i in range(n_chunks):
            out = f(tri32, resp_tri, Q + jnp.float32(i * 1e-9), cells)
        jax.block_until_ready(out)
        dt_s = time.perf_counter() - t0
        extra["queries_3d"] = {
            "qps": round(n_chunks * chunk / dt_s),
            "total_s": round(dt_s, 2),
            "index_build_s": round(t_index, 1),
            "index_build_steady_s": round(t_index_steady, 1),
            "index_complete": bool(cells.complete),
            "max_err_gate": float(f"{gate:.3e}"),
        }
        _log(
            f"queries_3d: {n_chunks*chunk/dt_s/1e6:.1f} Mq/s "
            f"(gate {gate:.1e}, index build {t_index:.1f}s, "
            f"steady {t_index_steady:.1f}s)"
        )

    run_cavity_build()
    if "tri32" in state and "q3d" not in SKIP:
        run_queries_3d()
    if "cavity100k" not in SKIP:
        run_cavity_100k()


def bench_tps(extra):
    """Config 3: thin-plate at 100k sites in < 10 s."""
    import jax
    import jax.numpy as jnp

    from gsl_scattered_interpolation_tpu.models import rbf_pu

    N = 100_000
    rng = np.random.default_rng(3)
    sites = rng.uniform(-1.0, 1.0, size=(N, 2))
    values = np.sin(3 * sites[:, 0]) * np.cos(2 * sites[:, 1]) + sites[:, 1]

    t0 = time.perf_counter()
    model = rbf_pu.fit(sites, values, dtype=jnp.float32)
    jax.block_until_ready(model.lam)
    t_fit = time.perf_counter() - t0
    # interpolation residual at a site sample (exactness is the TPS
    # contract; PU patches solve exactly per cell)
    idx = rng.choice(N, 20_000, replace=False)
    pred = np.asarray(rbf_pu.evaluate(model, jnp.asarray(sites[idx])))
    resid = float(np.max(np.abs(pred - values[idx])))
    extra["tps_100k"] = {
        "fit_s": round(t_fit, 2),
        "max_site_resid": float(f"{resid:.3e}"),
        "target_s": 10.0,
    }
    _log(f"tps_100k: fit {t_fit:.2f}s, max site residual {resid:.2e}")


def bench_wendland(extra):
    """Config 4: compact Wendland-C2 at 1M sites."""
    import jax
    import jax.numpy as jnp

    from gsl_scattered_interpolation_tpu.models import rbf_compact

    N = 1_000_000
    rng = np.random.default_rng(4)
    sites = rng.uniform(-1.0, 1.0, size=(N, 2))
    values = np.sin(3 * sites[:, 0]) * np.cos(2 * sites[:, 1])

    t0 = time.perf_counter()
    m = rbf_compact.CompactRbf(
        sites, values, tol=1e-6, maxiter=400, dtype=jnp.float32
    )
    t_fit = time.perf_counter() - t0
    # Steady-state refit (salted sites: axon result reuse would report
    # ~0 for an identical refit) — separates the per-fit cost from the
    # first-fit executable-load / first-touch overhead that made r4's
    # single number unattributable (VERDICT r4 weak #4: 10.6s -> 21.0s
    # with identical residual and no rbf_compact change).
    t0 = time.perf_counter()
    m2 = rbf_compact.CompactRbf(
        sites + 1e-7, values, tol=1e-6, maxiter=400, dtype=jnp.float32
    )
    t_steady = time.perf_counter() - t0
    del m2
    idx = rng.choice(N, 10_000, replace=False)
    pred = np.asarray(m.eval(sites[idx]))
    resid = float(np.max(np.abs(pred - values[idx])))
    extra["wendland_1m"] = {
        "fit_s": round(t_fit, 1),
        "fit_steady_s": round(t_steady, 1),
        "max_site_resid": float(f"{resid:.3e}"),
    }
    _log(
        f"wendland_1m: fit {t_fit:.1f}s (steady {t_steady:.1f}s), "
        f"max site residual {resid:.2e}"
    )


def bench_weights(extra):
    """BASELINE.md row 3 on hardware: TPU-f32 fit weights vs the host
    f64 dense-solve oracle (tests/test_weight_accuracy.py measures the
    same on the CPU backend; this records the real-chip number)."""
    import jax
    import jax.numpy as jnp

    from gsl_scattered_interpolation_tpu.models import rbf_compact

    N = 4096
    rng = np.random.default_rng(21)
    sites = rng.uniform(-0.5, 0.5, size=(N, 2))
    values = np.sin(3 * sites[:, 0]) * np.cos(2 * sites[:, 1])
    eps = 1.0 / float(np.sqrt(40.0 / (np.pi * N)))
    t0 = time.perf_counter()
    m = rbf_compact.CompactRbf(
        sites, values, epsilon=eps, tol=1e-7, maxiter=4000,
        standardize=False, dtype=jnp.float32,
    )
    t_fit = time.perf_counter() - t0
    lam32 = np.asarray(m.lam, np.float64)
    # host f64 oracle (numpy; the TPU has no f64 LinAlg)
    diff = sites[:, None, :] - sites[None, :, :]
    t = eps * np.sqrt((diff**2).sum(-1))
    K = np.maximum(1.0 - t, 0.0) ** 4 * (4.0 * t + 1.0)
    lam64 = np.linalg.solve(K, values)
    rel32 = float(np.max(np.abs(lam32 - lam64)) / np.max(np.abs(lam64)))
    # mixed-precision iterative refinement (VERDICT r3 item 4): f32 TPU
    # PCG corrections against host-f64 residuals
    t0 = time.perf_counter()
    m.refine(iters=3)
    t_refine = time.perf_counter() - t0
    rel = float(np.max(np.abs(m.lam64 - lam64)) / np.max(np.abs(lam64)))
    resid = float(np.max(np.abs(K @ m.lam64 - values)))
    extra["weights_f32_vs_f64"] = {
        "max_rel_weight_err": float(f"{rel:.3e}"),
        "max_rel_weight_err_unrefined": float(f"{rel32:.3e}"),
        "max_system_resid": float(f"{resid:.3e}"),
        "refine_curve_max_resid": [float(f"{h:.3e}") for h in
                                   m.refine_history],
        "fit_s": round(t_fit, 2),
        "refine_s": round(t_refine, 2),
        "target": 1e-8,
    }
    _log(
        f"weights_f32: rel {rel32:.2e} -> refined {rel:.2e} "
        f"(curve {m.refine_history})"
    )


def bench_pallas_boundary(extra):
    """Driver-visible run of the on-TPU Pallas boundary assertions
    (tests/test_pallas_tpu.py self-skips without GSI_TEST_TPU=1; VERDICT
    r4 item 6): the real kernel at the claimed ~100k-triangle VMEM-cap
    boundary vs the XLA dense locate, value-level equivalence gate."""
    import jax
    import jax.numpy as jnp

    from scipy.spatial import Delaunay as ScipyDelaunay

    from gsl_scattered_interpolation_tpu.models import (
        device_tri as dt,
        geometry_extras as gx,
    )
    from gsl_scattered_interpolation_tpu.ops import pallas_locate as plx

    rng = np.random.default_rng(42)
    n_sites = 50_500  # ~2n triangles: just above the ~100k-tri claim
    sites = rng.uniform(-0.5, 0.5, size=(n_sites, 2))
    tri32 = gx.from_scipy_delaunay(ScipyDelaunay(sites), sites).cast(
        jnp.float32
    )
    assert tri32.n_tris >= 100_000, tri32.n_tris
    q = jnp.asarray(rng.uniform(-0.45, 0.45, size=(50_000, 2)), jnp.float32)
    idx_p = np.asarray(plx.locate_dense_pallas(tri32, q))
    idx_d = np.asarray(dt.locate_dense(tri32, q)[0])
    # Index ties on shared edges are legitimate; gate on the implied
    # interpolant instead (same checks as the opt-in test module).
    vals = np.sin(3 * sites[:, 0]) * np.cos(2 * sites[:, 1])
    resp = jnp.concatenate(
        [jnp.zeros(3, jnp.float32), jnp.asarray(vals, jnp.float32)]
    )
    resp_tri = np.asarray(dt.vertex_responses(tri32, resp))
    wp = np.asarray(dt._weights(tri32, jnp.asarray(idx_p), q))
    wd = np.asarray(dt._weights(tri32, jnp.asarray(idx_d), q))
    out_p = (resp_tri[idx_p] * wp).sum(-1)
    out_d = (resp_tri[idx_d] * wd).sum(-1)
    mism = float((idx_p != idx_d).mean())
    diff = float(np.max(np.abs(out_p - out_d)))
    assert mism < 0.01, f"index mismatch rate {mism:.3%}"
    assert diff < 1e-3, f"pallas vs dense interp diff {diff:.2e}"
    extra["pallas_boundary_ok"] = True
    extra["pallas_boundary"] = {
        "n_tris": int(tri32.n_tris),
        "mismatch_rate": float(f"{mism:.2e}"),
        "max_interp_diff": float(f"{diff:.2e}"),
    }
    _log(
        f"pallas_boundary: ok (T={int(tri32.n_tris)}, mism {mism:.2e}, "
        f"diff {diff:.2e})"
    )


def bench_kriging(extra):
    """LocalKriging at 100k sites (VERDICT r3 item 8): fit + 1M
    predictions with kriging variances, plus a variance-calibration
    check (squared errors vs predicted variances on noisy data)."""
    import jax
    import jax.numpy as jnp

    from gsl_scattered_interpolation_tpu.models import kriging

    N = 100_000
    rng = np.random.default_rng(23)
    x = rng.uniform(0.0, 10.0, size=(N, 2))
    noise_sd = 0.05
    f_true = np.sin(x[:, 0] * 0.8) + 0.5 * np.cos(x[:, 1] * 1.1)
    f = f_true + noise_sd * rng.standard_normal(N)
    t0 = time.perf_counter()
    m = kriging.LocalKriging(x, f, k_neighbors=24, dtype=jnp.float32)
    t_fit = time.perf_counter() - t0
    # Steady refit (salted): r4's 23.5s "fit" was one-time executable
    # loads + first-touch; the per-fit cost is ~0.5s (r5 profile).
    t0 = time.perf_counter()
    m2 = kriging.LocalKriging(
        x + 1e-9, f, k_neighbors=24, dtype=jnp.float32
    )
    t_fit_steady = time.perf_counter() - t0
    del m2
    B = 1_000_000
    q = rng.uniform(0.5, 9.5, size=(B, 2))
    mean, var = m.predict(jnp.asarray(q, jnp.float32), chunk=262_144)
    jax.block_until_ready(var)
    t0 = time.perf_counter()
    mean, var = m.predict(
        jnp.asarray(q + 1e-7, jnp.float32), chunk=262_144
    )
    jax.block_until_ready(var)
    t_pred = time.perf_counter() - t0
    ref = np.sin(q[:, 0] * 0.8) + 0.5 * np.cos(q[:, 1] * 1.1)
    err = np.asarray(mean, np.float64) - ref
    var_np = np.asarray(var, np.float64)
    # Calibration DEFINITION (VERDICT r4 weak #5): the kriging variance
    # (nugget included) predicts E[(mean - y_new)^2] for a fresh NOISY
    # observation y_new at the query — not the distance to the noise-free
    # truth.  Score it against simulated fresh observations ref + noise
    # (same noise law as the training data); a calibrated model scores
    # ~1.0.  The old metric divided MSE-vs-truth by the nugget-inclusive
    # variance and misread a calibrated model as a 4x miscalibration.
    y_new = ref + noise_sd * rng.standard_normal(B)
    ratio = float(
        np.mean((np.asarray(mean, np.float64) - y_new) ** 2)
        / max(np.mean(var_np), 1e-30)
    )
    # CPU stand-in (every other config has one): scipy's neighbors-based
    # RBFInterpolator — the same local gather-k-neighbors-and-solve
    # structure — fit on the full site set, timed on a 20k query slice.
    t_cpu_fit = t_cpu_pred = float("nan")
    try:
        from scipy.interpolate import RBFInterpolator

        t0 = time.perf_counter()
        cpu_m = RBFInterpolator(x, f, neighbors=24, kernel="linear")
        t_cpu_fit = time.perf_counter() - t0
        t0 = time.perf_counter()
        cpu_m(q[:20_000])
        t_cpu_pred = time.perf_counter() - t0
    except Exception as e:  # keep the TPU numbers regardless
        extra["kriging_cpu_error"] = repr(e)[:200]
    extra["kriging_100k"] = {
        "fit_s": round(t_fit, 2),
        "fit_steady_s": round(t_fit_steady, 2),
        "predict_1m_s": round(t_pred, 2),
        "qps": round(B / t_pred),
        "rmse": float(f"{np.sqrt(np.mean(err**2)):.3e}"),
        "mean_variance": float(f"{np.mean(var_np):.3e}"),
        "calibration": round(ratio, 3),
        "calibration_def": "mean((pred-y_noisy)^2)/mean(var), fresh noise",
        "cpu_scipy_fit_s": round(t_cpu_fit, 2),
        "cpu_scipy_qps": round(20_000 / t_cpu_pred)
        if t_cpu_pred == t_cpu_pred
        else None,
    }
    _log(
        f"kriging_100k: fit {t_fit:.2f}s, 1M predict {t_pred:.2f}s "
        f"({B/t_pred/1e6:.2f} Mq/s), rmse {np.sqrt(np.mean(err**2)):.2e}, "
        f"calibration {ratio:.2f} (scipy fit {t_cpu_fit:.1f}s, "
        f"{20_000/t_cpu_pred:.0f} q/s)"
    )


def main():
    import jax

    on_tpu = jax.devices()[0].platform == "tpu"
    qps, base_qps = headline()
    extra = {"compile_cache": _cache_state()}
    if on_tpu:
        for name, fn in [
            ("build/qscale", bench_build_and_queries),
            ("tps", bench_tps),
            ("wendland", bench_wendland),
            ("cavity", bench_cavity3d),
            ("weights", bench_weights),
            ("kriging", bench_kriging),
            ("pboundary", bench_pallas_boundary),
        ]:
            if all(p in SKIP for p in name.split("/")):
                continue
            try:
                fn(extra)
            except Exception as e:  # record, never sink the headline
                extra[name.split("/")[0] + "_error"] = repr(e)[:200]
                _log(f"{name} failed: {e!r}")
    else:
        _log("off-TPU: at-scale configs skipped")

    print(
        json.dumps(
            {
                "metric": "barycentric_interp_queries_per_sec_2k_sites",
                "value": round(qps),
                "unit": "queries/s",
                "vs_baseline": round(qps / base_qps, 2),
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
