from . import (  # noqa: F401
    datasets,
    errors,
    integrity,
    machine,
    rng,
    serialize,
    testing,
)
