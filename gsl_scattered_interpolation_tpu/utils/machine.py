"""Machine-precision constants, parameterized by dtype.

TPU-native replacement for the reference's ``gsl_machine.h:17-21``
(``GSL_DBL_EPSILON``, ``GSL_SQRT_DBL_EPSILON``, ``GSL_ROOT5_DBL_EPSILON``),
all three of which are load-bearing in the scattered-interpolation engine's
tolerances (cage scale-up ``linear_simplex.c:251``, circumsphere tie-break
``linear_simplex.c:536``, Delaunay check slack
``linear_simplex_integrity_check.c:156``).

Unlike the C reference, which is double-only, every constant here is a
function of dtype so the same geometry code can run in float32 on the MXU
and float64 for GSL-parity validation.
"""

from __future__ import annotations

import numpy as np

# GSL's double constants (gsl_machine.h). We recompute rather than hard-code
# so float32 variants are consistent.
_EPS_CACHE: dict = {}


def eps(dtype) -> float:
    """Machine epsilon for dtype (GSL_DBL_EPSILON analog)."""
    dt = np.dtype(dtype)
    if dt not in _EPS_CACHE:
        _EPS_CACHE[dt] = float(np.finfo(dt).eps)
    return _EPS_CACHE[dt]


def sqrt_eps(dtype) -> float:
    """sqrt(machine epsilon) (GSL_SQRT_DBL_EPSILON analog)."""
    return float(np.sqrt(eps(dtype)))


def root5_eps(dtype) -> float:
    """eps**(1/5) (GSL_ROOT5_DBL_EPSILON analog).

    Used to size the caging simplex: reference scales the regular-simplex
    cage by ``1/(GSL_ROOT5_DBL_EPSILON * r)`` (linear_simplex.c:251) so its
    insphere dwarfs the data range, making the method robust to moderate
    outliers.
    """
    return float(eps(dtype) ** 0.2)


# Canonical double values, for tests asserting GSL parity.
DBL_EPSILON = eps(np.float64)            # 2.220446049250313e-16
SQRT_DBL_EPSILON = sqrt_eps(np.float64)  # 1.4901161193847656e-08
ROOT5_DBL_EPSILON = root5_eps(np.float64)
