"""Device-mesh helpers.

The reference is single-threaded CPU code with no distribution anywhere
(SURVEY.md §2e); scaling here is jax.sharding over a Mesh with XLA
collectives on ICI.  Two named axes cover this workload:

  * ``dp`` — data parallel over QUERY batches (the dominant axis: queries
    are embarrassingly parallel against a replicated triangulation);
  * ``tp`` — "tensor" parallel over SITE blocks of RBF/kriging kernel
    matrices (row-sharded assembly + all-gather/psum matvecs).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(dp: int | None = None, tp: int = 1, devices=None) -> Mesh:
    """Mesh over available devices with axes (dp, tp)."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // tp
    if dp * tp != n:
        raise ValueError(f"dp*tp = {dp}*{tp} != {n} devices")
    return Mesh(np.asarray(devices).reshape(dp, tp), ("dp", "tp"))
