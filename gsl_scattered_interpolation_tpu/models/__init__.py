from . import (  # noqa: F401
    device_delaunay,
    geometry_extras,
    device_tri,
    host_tree,
    interp1d,
    interp2d,
    scattered,
)
