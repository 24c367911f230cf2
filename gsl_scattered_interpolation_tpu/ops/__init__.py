from . import geometry, pallas_locate, tridiag  # noqa: F401
