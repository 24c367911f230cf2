"""Error-code discipline, rebuilt the Python/JAX way.

The reference uses GSL's error module (``err/gsl_errno.h:40-50`` codes;
``GSL_ERROR*`` macros and a global handler that aborts by default,
``err/error.c:28-48``).  In a functional JAX library there are two calling
conventions, mirroring GSL's ``_e`` / non-``_e`` split
(``interp.c:131-151``):

* **Traced code** cannot raise: device functions return a status code (or
  NaN poison values) alongside results, like GSL's ``_e`` variants.
* **Host-facing wrappers** raise :class:`GslError` subclasses, like GSL's
  non-``_e`` variants invoking the error handler.
"""

from __future__ import annotations

# Status codes (values match err/gsl_errno.h for familiarity).
SUCCESS = 0
FAILURE = -1
EDOM = 1      # input domain error
ERANGE = 2    # output range error
EINVAL = 4    # invalid argument
ESING = 21    # apparent singularity
ETABLE = 23   # table limit exceeded (capacity overflow here)


class GslError(Exception):
    """Base for all library errors (GSL_ERROR analog)."""

    code = FAILURE


class DomainError(GslError):
    """Input outside the valid domain (GSL_EDOM)."""

    code = EDOM


class InvalidArgumentError(GslError):
    """Invalid argument supplied (GSL_EINVAL)."""

    code = EINVAL


class SingularError(GslError):
    """Apparent singularity detected (GSL_ESING)."""

    code = ESING


class CapacityError(GslError):
    """Fixed-capacity device buffer exhausted (GSL_ETABLE analog).

    The reference grows pools by realloc-doubling (linear_simplex.c:23-46);
    XLA requires static shapes, so we preallocate and raise this when a
    build would overflow, directing the user to a larger ``capacity``.
    """

    code = ETABLE


_CODE_TO_EXC = {
    EDOM: DomainError,
    EINVAL: InvalidArgumentError,
    ESING: SingularError,
    ETABLE: CapacityError,
}


def check_status(status: int, msg: str = "") -> None:
    """Raise the exception matching a device-returned status code."""
    status = int(status)
    if status == SUCCESS:
        return
    raise _CODE_TO_EXC.get(status, GslError)(msg or f"status={status}")


def strict_check(ok, exc: type[GslError], msg: str) -> None:
    """Raise ``exc`` on the host if any entry of ``ok`` is False.

    jit-safe: under tracing (jit/vmap/grad) the value cannot be inspected
    without a host sync, so the check silently no-ops — out-of-domain
    entries are still reported through the NaN/EDOM data path, matching
    GSL's ``_e`` convention (interp.c:131-151).  Eager callers get the
    exception, matching GSL's default error handler.
    """
    import jax
    import jax.numpy as jnp

    try:
        bad = not bool(jnp.all(ok))
    except jax.errors.TracerBoolConversionError:
        return
    if bad:
        raise exc(msg)
