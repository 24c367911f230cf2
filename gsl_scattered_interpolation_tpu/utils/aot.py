"""Module-wide AOT-compiled executable cache.

A FRESH ``jax.jit`` instance's first ``__call__`` costs ~20 s for a large
program on this runtime even when the persistent compile cache is warm —
the explicit AOT path (``f.trace(...).lower().compile()``) loads the same
cached program in ~5 s (measured: trace 0.8 s + lower 0.6 s + compile-
from-cache 4.0 s vs 21.5 s via ``__call__``).  Model constructors and
per-build orchestrators therefore must never create jit wrappers per
call: route them through :func:`aot_compile` so each distinct program is
traced/lowered/loaded once per process.
"""

import time

import jax

from . import config

_CACHE: dict = {}


def aot_compile(label, make_jit, example_args):
    """Trace+lower+compile a jitted function explicitly, memoized.

    ``label`` (a hashable tuple: function name + every static the program
    depends on) plus the example args' shapes/dtypes form the memo key.
    The returned executable is called WITHOUT the static arguments
    declared via ``static_argnums``.
    """
    key = (label,) + tuple(
        (tuple(a.shape), str(a.dtype)) if hasattr(a, "shape") else a
        for a in jax.tree_util.tree_leaves(example_args)
    )
    ent = _CACHE.get(key)
    if ent is None:
        t0 = time.perf_counter()
        traced = make_jit().trace(*example_args)
        t1 = time.perf_counter()
        lowered = traced.lower()
        t2 = time.perf_counter()
        ent = lowered.compile()
        t3 = time.perf_counter()
        _CACHE[key] = ent
        config.log.info(
            "aot %s: trace %.1fs lower %.1fs compile/load %.1fs",
            label[0] if isinstance(label, tuple) else label,
            t1 - t0, t2 - t1, t3 - t2,
        )
    return ent
