"""Ablate the 2D seed-init device program: grid fill vs pack vs walk.

Times each piece as its own salted jit at the 1M-build shapes (m = 131072
seed sites from a real Qhull run, 1.05M queries).

PYTHONPATH=/root/repo:/root/.axon_site python tools/ablate_seed.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from gsl_scattered_interpolation_tpu.utils import config

config.enable_compile_cache()

from gsl_scattered_interpolation_tpu.models import device_delaunay as dd
from gsl_scattered_interpolation_tpu.ops import geometry
from gsl_scattered_interpolation_tpu.utils import machine

from scipy.spatial import Delaunay as SciDelaunay

N = 1_048_576
m = N // 8
GRID = 1024
DT = jnp.float32

rng = np.random.default_rng(7)
sites = rng.uniform(-0.5, 0.5, size=(N, 2))
jit_mag = 8.0 * machine.eps(DT)
prng = np.random.default_rng(12345)
sites = sites + jit_mag * prng.uniform(-1, 1, sites.shape)
cage = geometry.cage_vertices(2, np.zeros(2), np.ones(2), np.float32)
rounded = sites[:m].astype(np.float32).astype(np.float64)
t0 = time.perf_counter()
sd = SciDelaunay(np.concatenate([np.asarray(cage, np.float64), rounded]))
print(f"qhull: {time.perf_counter()-t0:.2f}s", flush=True)
PK = 2 * m + 1
tv = np.full((PK, 3), -1, np.int32)
tv[: len(sd.simplices)] = sd.simplices
tn = np.full((PK, 3), -1, np.int32)
tn[: len(sd.simplices)] = sd.neighbors

pts = jnp.asarray(
    np.concatenate([np.asarray(cage, np.float64), sites]), DT
)
tv_d = jnp.asarray(tv)
tn_d = jnp.asarray(tn)


@jax.jit
def pack(pts, tv, tn, salt):
    return dd._pack_walk_rows(pts + salt, tv, tn)


# host hint grid: per-seed-site incident triangle (vertex_to_simplex)
v2s = np.asarray(sd.vertex_to_simplex, np.int32)[3:]
cells = np.clip(((rounded + 0.5) * GRID).astype(np.int64), 0, GRID - 1)
flat = cells[:, 0] * GRID + cells[:, 1]
gh = np.full(GRID * GRID, -1, np.int32)
gh[flat] = v2s
gh = gh.reshape(GRID, GRID)
while (gh < 0).any():
    for ax in (0, 1):
        for s in (1, -1):
            cand = np.roll(gh, s, axis=ax)
            if ax == 0:
                cand[0 if s == 1 else -1, :] = -1
            else:
                cand[:, 0 if s == 1 else -1] = -1
            gh = np.where(gh < 0, cand, gh)
g0 = jnp.asarray(gh)
packed0 = pack(pts, tv_d, tn_d, DT(0))
q = pts[3:]
qc = jnp.clip(((q + 0.5) * GRID).astype(jnp.int32), 0, GRID - 1)
start0 = g0.reshape(-1)[qc[:, 0] * GRID + qc[:, 1]]


# axon: block_until_ready can return before execution — only a value
# readback is a true sync (CLAUDE.md).  Each case runs REP times inside
# ONE jit via scan (salted per iteration) and reads ONE scalar back; the
# ~0.5 s readback constant is measured with an empty scan and subtracted.
REP = 8


def scan_time(name, body):
    @jax.jit
    def run(salt0):
        def step(acc, i):
            return acc + body(salt0 + i.astype(DT) * DT(1e-9)), None

        acc, _ = jax.lax.scan(
            step, DT(0.0), jnp.arange(REP, dtype=jnp.int32)
        )
        return acc

    float(run(DT(0.0)))  # compile + warm
    t0 = time.perf_counter()
    float(run(DT(1e-7)))
    dt = time.perf_counter() - t0
    return name, dt


base_name, base_s = scan_time("base", lambda s: s)

for name, body in [
    ("pack", lambda s: pack(pts, tv_d, tn_d, s).sum()),
    ("walk", lambda s: dd._locate_walk_exact(
        packed0, start0, q + s
    )[0].sum().astype(DT)),
    ("walk_nbad", lambda s: jnp.sum(
        ~dd._locate_walk_exact(packed0, start0, q + s)[1]
    ).astype(DT)),
]:
    _, dt = scan_time(name, body)
    ms = (dt - base_s) / REP * 1e3
    print(f"{name}: {ms:.1f} ms", flush=True)
print(f"(readback base: {base_s*1e3:.0f} ms)", flush=True)
