"""Per-round candidate fate stats for the 3D cavity build (CPU backend).

Why do rounds yield so few winners?  Runs the real _round with
want_stats=True on the f64 CPU backend (same structure as TPU) and
prints, per round: candidates, overflow, face-overflow, manifold
failures, ownership losses, winners, mean cavity/face sizes.

  python tools/cavity_stats.py [n] [cavity_cap]
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import functools
import numpy as np
import jax.numpy as jnp

from gsl_scattered_interpolation_tpu.models import device_cavity as dc
from gsl_scattered_interpolation_tpu.ops import geometry

n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
C = int(sys.argv[2]) if len(sys.argv) > 2 else 32
S = 2048
d = 3

rng = np.random.default_rng(13)
sites = rng.uniform(-0.5, 0.5, size=(n, d))
if os.environ.get("BOUNDARY_FIRST") == "1":
    # boundary-shell-first: sites near the data-box boundary insert
    # before the interior, while the cage-gap tets are still few/fat
    dist = np.minimum(sites + 0.5, 0.5 - sites).min(axis=1)
    shell = n ** (-1.0 / d)
    is_shell = dist < shell
    order = np.concatenate([
        rng.permutation(np.nonzero(is_shell)[0]),
        rng.permutation(np.nonzero(~is_shell)[0]),
    ])
    sites = sites[order]
    print(f"boundary-first: {int(is_shell.sum())} shell sites first")
shift = np.zeros(d)
scale = np.ones(d)
cage = geometry.cage_vertices(d, shift, scale, np.float64)
pts = jnp.asarray(np.concatenate([cage, sites]))
M = int(9.0 * n) + 64
st = dc.init_state(pts, n, M)


@functools.partial(jax.jit, static_argnums=(2, 3), donate_argnums=(1,))
def round_stats(pts, st, S, C):
    return dc._round(pts, st, S, C, want_stats=True)


def diagnose(st):
    """Integrity of the current state: orientations, reciprocity."""
    from gsl_scattered_interpolation_tpu.ops import robust

    tv = np.asarray(st.tri_v)
    tn = np.asarray(st.tri_n)
    alive = tv[:, 0] >= 0
    ids = np.nonzero(alive)[0]
    verts = np.asarray(pts)[tv[ids]]
    O = np.asarray(
        robust.orient3d_ds(
            jnp.asarray(verts[:, 0]), jnp.asarray(verts[:, 1]),
            jnp.asarray(verts[:, 2]), jnp.asarray(verts[:, 3]),
        )
    )
    n_deg = int((O == 0).sum())
    n_alive = len(ids)
    # neighbor reciprocity
    bad_recip = 0
    nb = tn[ids]
    for k in range(4):
        nk = nb[:, k]
        okm = nk >= 0
        back = tn[nk[okm]]
        bad_recip += int((~(back == ids[okm][:, None]).any(1)).sum())
    # dead neighbors
    dead_nbr = int((~alive[np.where(nb >= 0, nb, 0)] & (nb >= 0)).sum())
    print(
        f"  DIAG: alive={n_alive} degenerate={n_deg} "
        f"bad_recip={bad_recip} dead_nbr={dead_nbr}",
        flush=True,
    )
    # where are the stuck sites?
    stuck = np.asarray(st.site_tri)
    stuck_ids = np.nonzero(stuck >= 0)[0]
    seed = stuck[stuck_ids]
    seed_alive = alive[seed]
    print(
        f"  DIAG: stuck={len(stuck_ids)} seeds_alive={int(seed_alive.sum())}",
        flush=True,
    )
    # distance of stuck sites from their seed centroid
    cent = np.asarray(pts)[tv[seed[:50]]].mean(1)
    qq = np.asarray(pts)[stuck_ids[:50] + d + 1]
    print(
        f"  DIAG: seed-centroid dist (first 50): "
        f"{np.linalg.norm(cent - qq, axis=1).round(4)[:10]}", flush=True
    )


r = 0
stall = 0
while int(st.n_left) > 0 and r < 3000:
    st, n_w, stats = round_stats(pts, st, S, C)
    s = np.asarray(stats)
    cand, ovf, fov, manif, own, win, scav, sface = (int(x) for x in s)
    if r % 10 == 0 or win == 0:
        print(
            f"r{r:4d} left={int(st.n_left):6d} tris={int(st.n_tris):7d} "
            f"cand={cand:5d} ovf={ovf:5d} faceov={fov:4d} "
            f"manif={manif:4d} own={own:5d} win={win:5d} "
            f"cav/c={scav/max(cand,1):.1f} face/c={sface/max(cand,1):.1f}",
            flush=True,
        )
    if win == 0:
        stall += 1
        if stall >= 3:
            diagnose(st)
            break
    else:
        stall = 0
    r += 1
print(f"total rounds {r}")
