from . import datasets, errors, integrity, machine, rng, testing  # noqa: F401
