from .surface import (  # noqa: F401
    SurfaceConfig, optimize_surface_points, make_surface_points_fn,
    surface_inits_from_fragments)
from . import losses  # noqa: F401
