"""gsl_scattered_interpolation_tpu — TPU-native scattered-data interpolation.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the
``smithzvk/gsl-scattered-interpolation`` GSL branch: incremental Delaunay
triangulation in arbitrary dimension, barycentric (piecewise-linear)
interpolation over the triangulation, the gsl_interp-style structured 1D/2D
interpolation API family, plus the reference's planned-but-unbuilt RBF
(thin-plate spline, Wendland) and ordinary-kriging paths, implemented for
real on TPU.

Layout:
  ops/       batched geometry + Pallas kernels
  models/    triangulation engines, interpolation families, RBF, kriging
  parallel/  jax.sharding mesh / pjit / shard_map scaling
  utils/     errors, machine constants, rng, testing, serialization
"""

from .version import __version__  # noqa: F401
from .utils import config as _config

# Persistent XLA compile cache: the big build programs compile ~50x
# slower than they run via the axon remote-compile path; cache them.
_config.enable_compile_cache()

from . import models, ops, parallel, utils  # noqa: F401
from .models.scattered import ScatteredInterp  # noqa: F401
from .models.interp1d import Interp1D, Spline1D, interp, spline  # noqa: F401
from .models.interp2d import Interp2D, Spline2D, interp2d, spline2d  # noqa: F401


def setup_x64() -> None:
    """Enable float64 — required for GSL double-precision parity (1e-10)."""
    import jax

    jax.config.update("jax_enable_x64", True)
