from . import errors, machine, rng, testing  # noqa: F401
