"""Optimized-HLO kernel census of the production sweep / k_rounds programs.

Compiles (from the warm persistent cache) the exact production-shape
programs and prints, per program: #entry-computation ops by kind, the
fusion count (~kernel count), and XLA's cost analysis.

PYTHONPATH=/root/repo:/root/.axon_site python tools/hlo_census.py [sweep|kr]
"""

import collections
import re
import sys

import numpy as np
import jax
import jax.numpy as jnp

from gsl_scattered_interpolation_tpu.utils import config

config.enable_compile_cache()

from gsl_scattered_interpolation_tpu.models import device_delaunay as dd

N = 1_048_576  # bucket_size(1M)
M = 2 * N + 3
R = 524_288
DT = jnp.float32

pts = jnp.zeros((N + 3, 2), DT)
tri_v = jnp.zeros((M, 3), jnp.int32)
tri_n = jnp.zeros((M, 3), jnp.int32)
cc = jnp.zeros((M, 2), DT)
dirty = jnp.zeros(M, bool)


def census(label, lowered):
    compiled = lowered.compile()
    try:
        txt = compiled.as_text()
    except Exception as e:
        print(f"{label}: as_text failed: {e!r}")
        return
    # entry computation = the module's ENTRY block; count root-level ops
    ops = collections.Counter()
    in_entry = False
    fusion_kinds = collections.Counter()
    for line in txt.splitlines():
        if line.startswith("ENTRY"):
            in_entry = True
            continue
        if in_entry:
            if line.startswith("}"):
                in_entry = False
                continue
            m = re.search(r"=\s+\S+\s+([a-z0-9_-]+)\(", line)
            if m:
                op = m.group(1)
                ops[op] += 1
                if op == "fusion":
                    km = re.search(r'kind=([a-zA-Z]+)', line)
                    fusion_kinds[km.group(1) if km else "?"] += 1
    print(f"== {label}: entry ops:")
    for k, v in ops.most_common():
        print(f"   {k:28s} {v}")
    print(f"   fusion kinds: {dict(fusion_kinds)}")
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        keys = ["flops", "bytes accessed", "optimal_seconds"]
        print("   cost:", {k: ca.get(k) for k in keys if k in ca})
    except Exception as e:
        print(f"   cost_analysis failed: {e!r}")


which = sys.argv[1] if len(sys.argv) > 1 else "sweep"

if which in ("sweep", "both"):
    @jax.jit
    def sweep_one(pts, tri_v, tri_n, cc, dirty, k):
        return dd._flip_sweep_compact(
            pts, tri_v, tri_n, cc, dirty, R, k, rf_div=2
        )

    census(
        "sweep(R=524288, rf_div=2)",
        sweep_one.trace(pts, tri_v, tri_n, cc, dirty, jnp.int32(8)).lower(),
    )

if which in ("round", "both"):
    # ONE round body, no while_loop wrapper: the while_loop body is where
    # kernels live; this exposes it directly.
    arange_m = jnp.arange(M, dtype=jnp.int32)

    @jax.jit
    def round_body(pts, tri_v, tri_n, cc, dirty):
        didx = jnp.cumsum(dirty.astype(jnp.int32)) - 1
        sel = dirty & (didx < R)
        rows = jnp.full(R + 1, -1, jnp.int32).at[
            jnp.where(sel, didx, R)
        ].set(arange_m, mode="drop")[:R]
        rvalid = rows >= 0
        tv, tn, cand_ok = dd._edge_candidates(
            pts, tri_v, tri_n, cc, rows, rvalid
        )
        out = dd._match_and_flip(
            pts, tri_v, tri_n, cc, rows, rvalid, tv, tn, cand_ok,
            want_frec=False, rf_div=2,
        )
        tri_v, tri_n, cc2, flip_info, rep, repv, any_flip, n_exec = out[:8]
        dirty = dirty.at[jnp.where(rvalid, rows, M + 1)].set(
            jnp.any(cand_ok, axis=-1), mode="drop"
        )
        dirty = dirty.at[
            jnp.where(repv, rep, M + 1)
        ].set(True, mode="drop")
        return tri_v, tri_n, cc2, dirty, n_exec

    census(
        "round_body(R=524288, rf_div=2)",
        round_body.trace(pts, tri_v, tri_n, cc, dirty).lower(),
    )
