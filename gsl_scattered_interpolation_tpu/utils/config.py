"""Environment configuration knobs.

The reference's env surface (SURVEY.md §5): ``GSL_RNG_SEED`` /
``GSL_RNG_TYPE`` (rng/default.c:31-104), ``GSL_IEEE_MODE``
(ieee-utils/env.c:26-28), ``GSL_TEST_VERBOSE`` (test/results.c:42-58).
TPU-native equivalents:

  GSI_TPU_SEED     default insertion-shuffle / subsample seed (int).
  GSI_TPU_X64      "1" enables float64 globally (the IEEE-mode analog:
                   required for GSL double-parity results).
  GSI_TPU_VERBOSE  "1" turns on info logging.
"""

from __future__ import annotations

import logging
import os

log = logging.getLogger("gsl_scattered_interpolation_tpu")


def env_seed(default: int | None = None):
    """Seed from GSI_TPU_SEED, like gsl_rng_env_setup (rng/default.c:31)."""
    v = os.environ.get("GSI_TPU_SEED")
    if v is None:
        return default
    return int(v)


def enable_compile_cache(path: str | None = None) -> None:
    """Turn on JAX's persistent compilation cache (on-disk).

    The device Delaunay build is a large XLA program whose TPU compile
    (through the axon remote-compile tunnel) costs ~400s at 100k sites —
    ~50x its execution time.  The persistent cache amortizes that to the
    first run per (program, shape).  Set ``GSI_TPU_NOCACHE=1`` to skip,
    ``GSI_TPU_CACHE_DIR`` to relocate (default ~/.cache/gsi_tpu_xla).
    """
    import os as _os

    if _os.environ.get("GSI_TPU_NOCACHE") == "1":
        return
    if path is None:
        # Default to the in-repo cache so compiled TPU programs (including
        # the expensive large-shape build programs) travel with a checkout.
        repo_cache = _os.path.join(
            _os.path.dirname(_os.path.dirname(_os.path.dirname(
                _os.path.abspath(__file__)
            ))),
            ".jax_cache",
        )
        path = _os.environ.get("GSI_TPU_CACHE_DIR", repo_cache)
    try:
        import jax

        _os.makedirs(path, exist_ok=True)
        # Seed from the COMMITTED warm cache (warm_cache/ at the repo
        # root holds the pruned set of compiled programs bench.py hits
        # — VERDICT r4 item 7): a fresh clone starts warm instead of
        # paying ~100-400s of tunnel compile per big program.  Hardlink
        # when possible (instant, same fs), else copy once.
        warm = _os.path.join(
            _os.path.dirname(_os.path.dirname(_os.path.dirname(
                _os.path.abspath(__file__)
            ))),
            "warm_cache",
        )
        if _os.path.isdir(warm) and _os.path.abspath(
            warm
        ) != _os.path.abspath(path):
            import shutil as _shutil

            for f in _os.listdir(warm):
                dst = _os.path.join(path, f)
                if not _os.path.exists(dst):
                    try:
                        _os.link(_os.path.join(warm, f), dst)
                    except OSError:
                        _shutil.copy2(_os.path.join(warm, f), dst)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 0.5
        )
    except Exception as e:  # cache is an optimization, never a failure
        log.info("compile cache unavailable: %s", e)


def env_setup() -> None:
    """Apply env configuration (call once, before first backend use)."""
    if os.environ.get("GSI_TPU_X64") == "1":
        import jax

        jax.config.update("jax_enable_x64", True)
        log.info("float64 enabled via GSI_TPU_X64")
    if os.environ.get("GSI_TPU_VERBOSE") == "1":
        logging.basicConfig(level=logging.INFO)
        log.setLevel(logging.INFO)
