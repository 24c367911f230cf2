from . import host_tree  # noqa: F401
