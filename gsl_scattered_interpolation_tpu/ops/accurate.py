"""Accurate float32 transcendentals for TPU.

On the target TPU, ``jnp.log`` lowers to a fast approximation with ~2.4e-3
maximum relative error (bf16-class; measured — sqrt and multiply are exact
f32).  Kernel matrices built from such logs are perturbed at ~1% of their
entries' magnitude, which an ill-conditioned solve amplifies into O(1)
coefficient errors (observed: PU-TPS edge patches at 100k sites).

``log`` here reconstructs the exact-f32 logarithm from the float's bit
pattern: x = m * 2^e with m in [sqrt(1/2), sqrt(2)), then
log(m) = 2 atanh(s), s = (m-1)/(m+1) <= 0.1716, via an odd polynomial —
|s|^11 truncation keeps the series error below 1 ulp, and e*ln2 is added
in two pieces (hi exactly representable) to avoid cancellation.  Pure VPU
arithmetic: ~15 flops, fuses into surrounding elementwise code.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_LN2_HI = np.float32(0.693145751953125)  # 0x3F317200: low bits zero
_LN2_LO = np.float32(1.42860677e-06)     # ln2 - LN2_HI (fdlibm pair)


def log(x):
    """Accurate elementwise natural log (float32 path; f64 falls through).

    Matches IEEE log to ~1-2 ulps on normal positive floats.  x <= 0
    returns -inf (0) / nan (negative); denormals flush like the backend.
    """
    x = jnp.asarray(x)
    if x.dtype != jnp.float32:
        return jnp.log(x)
    bits = jax.lax.bitcast_convert_type(x, jnp.int32)
    e = ((bits >> 23) & 0xFF) - 127
    m_bits = (bits & jnp.int32(0x007FFFFF)) | jnp.int32(0x3F800000)
    m = jax.lax.bitcast_convert_type(m_bits, jnp.float32)  # [1, 2)
    # renormalize to [sqrt(1/2), sqrt(2)) so s stays small
    big = m > 1.4142135
    m = jnp.where(big, 0.5 * m, m)
    e = e + big.astype(jnp.int32)
    s = (m - 1.0) / (m + 1.0)
    z = s * s
    # 2*atanh(s) = 2s(1 + z/3 + z^2/5 + z^3/7 + z^4/9)
    p = 2.0 / 9.0
    p = p * z + 2.0 / 7.0
    p = p * z + 2.0 / 5.0
    p = p * z + 2.0 / 3.0
    p = p * z * s
    ef = e.astype(jnp.float32)
    out = ef * _LN2_HI + (2.0 * s + (p + ef * _LN2_LO))
    out = jnp.where(x > 0, out, jnp.where(x == 0, -jnp.inf, jnp.nan))
    return jnp.where(jnp.isinf(x) & (x > 0), jnp.inf, out)


def xlogy(x, y):
    """x * log(y) with the 0 * log(0) -> 0 convention (accurate-f32 log)."""
    safe = jnp.where(y > 0, y, 1.0)
    return jnp.where(x == 0, 0.0, x * log(safe))
