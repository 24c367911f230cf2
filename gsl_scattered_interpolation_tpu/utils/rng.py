"""RNG utilities: TPU-native replacement for GSL's rng/randist closure.

The scattered engine uses exactly one piece of GSL randomness:
``gsl_ran_shuffle`` (Fisher-Yates, randist/shuffle.c:69) to randomize the
insertion order for randomized-incremental Delaunay construction
(linear_simplex.c:280-281).  Here that is ``jax.random.permutation`` over
the counter-based threefry PRNG — deterministic, splittable, reproducible
across hosts, which is what the reference's ``GSL_RNG_SEED`` env knob
(rng/default.c:31-76) was for.
"""

from __future__ import annotations

import jax
import numpy as np


def insertion_shuffle(key, n: int) -> np.ndarray:
    """A permutation of range(n) — the tree's ``shuffle`` (linear_simplex.h:50).

    ``key=None`` returns the identity permutation, matching the reference's
    behavior when no rng is passed to ``simplex_tree_init``
    (linear_simplex.c:269, 280-281).
    """
    if key is None:
        return np.arange(n, dtype=np.int64)
    if isinstance(key, int):
        key = jax.random.key(key)
    return np.asarray(jax.random.permutation(key, n))
