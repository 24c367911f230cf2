"""Data thinning: error-bounded site decimation (reference README:29).

"Data thinning" is one of the reference's two unstarted "possible
additions" (/root/reference/README:27-30): drop sites whose values the
remaining triangulation reproduces anyway.  TPU-native design — instead of
serial remove-one-retriangulate (quadratic and hostile to batching), run
the classic GREEDY-INSERTION decimation (Garland–Heckbert terrain
simplification), which is batched-friendly:

  1. seed a small subset of sites (plus the data-hull extremes so the
     kept triangulation covers every dropped site);
  2. build its Delaunay triangulation on device and evaluate ALL dropped
     sites in one batched interp pass;
  3. insert the worst offenders (a batch per round, geometrically grown)
     until every dropped site is reproduced within ``tol``.

The invariant at exit is exactly the thinning contract: for every dropped
site i, |interp_kept(x_i) - v_i| <= tol.  Rounds are O(log N); each round
is one device build at the (small) kept size plus one batched evaluation
over the dropped set — both existing fast paths.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from . import device_delaunay, device_tri
from ..utils import config, errors


class ThinResult(NamedTuple):
    keep: np.ndarray       # sorted indices of kept sites
    max_error: float       # max |interp - value| over dropped sites
    rounds: int
    tri: object            # DeviceTriangulation of the kept subset
    shuffle: np.ndarray    # insertion order of the kept build


def thin(
    sites,
    values,
    tol: float,
    seed_frac: float = 1.0 / 64.0,
    growth: float = 2.0,
    max_rounds: int = 64,
    key=0,
    builder: str = "device",
) -> ThinResult:
    """Thin (sites, values) to a subset reproducing all data within tol.

    Args:
      sites: [N, d] raw coordinates, any d >= 2.
      values: [N].
      tol: absolute reproduction tolerance at dropped sites.
      seed_frac: initial kept fraction (plus the 2d bbox extremes).
      growth: per-round growth factor of the insertion batch.
      key: shuffle key for the seed subset.
      builder: per-round triangulation source — "device" (the native 2D
        build; each distinct subset size compiles once) or "qhull"
        (scipy import via geometry_extras.from_scipy_delaunay: no
        per-size compile, preferable for many small rounds and the only
        builder for d > 2 — the thinning loop rebuilds at many distinct
        subset sizes, which would compile-storm the per-size cavity
        programs).  Evaluation always runs on the device query path.

    Returns ThinResult; ``keep`` indexes rows of ``sites``.
    """
    sites = np.asarray(sites, np.float64)
    values = np.asarray(values, np.float64)
    n, d = sites.shape
    if d != 2 and builder == "device":
        config.log.info("thin: d=%d routed to the qhull builder", d)
        builder = "qhull"
    if values.shape != (n,):
        raise errors.InvalidArgumentError("values shape mismatch")

    rng = np.random.default_rng(key)
    kept = np.zeros(n, bool)
    # Bbox extremes keep the hull wide so dropped sites stay covered
    # (fade-to-zero outside the kept hull would poison the error test).
    for ax in range(d):
        kept[np.argmin(sites[:, ax])] = True
        kept[np.argmax(sites[:, ax])] = True
    n_seed = max(4, int(n * seed_frac))
    kept[rng.choice(n, size=n_seed, replace=False)] = True

    batch = max(8, n_seed // 4)
    rounds = 0
    max_err = np.inf
    tri = shuffle = None
    while rounds < max_rounds:
        rounds += 1
        keep_idx = np.nonzero(kept)[0]
        if builder == "qhull":
            from scipy.spatial import Delaunay

            from . import geometry_extras

            tri = geometry_extras.from_scipy_delaunay(
                Delaunay(sites[keep_idx]), sites[keep_idx], grid_res=64
            )
            shuffle = np.arange(keep_idx.size)
        else:
            tri, shuffle = device_delaunay.triangulate(
                sites[keep_idx], key=None
            )
        resp = device_tri.response_for_build(shuffle, values[keep_idx], d=d)
        drop_idx = np.nonzero(~kept)[0]
        if drop_idx.size == 0:
            max_err = 0.0
            break
        est = np.asarray(
            device_tri.interp(tri, resp, jnp.asarray(sites[drop_idx]))
        )
        err = np.abs(est - values[drop_idx])
        max_err = float(err.max())
        if max_err <= tol:
            break
        worst = np.argsort(err)[::-1]
        bad = worst[err[worst] > tol][:batch]
        kept[drop_idx[bad]] = True
        batch = int(batch * growth)
        config.log.info(
            "thin round %d: kept %d, max err %.3g",
            rounds,
            int(kept.sum()),
            max_err,
        )

    return ThinResult(
        keep=np.nonzero(kept)[0],
        max_error=max_err,
        rounds=rounds,
        tri=tri,
        shuffle=shuffle,
    )


