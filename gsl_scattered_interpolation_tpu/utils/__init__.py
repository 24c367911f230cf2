from . import (  # noqa: F401
    config,
    datasets,
    errors,
    integrity,
    machine,
    profiling,
    rng,
    serialize,
    testing,
)
