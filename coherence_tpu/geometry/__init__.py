"""Host-side geometry: paths, bezier subdivision, shape constructors, stroking.

This layer is irregular, per-scene-change work (not per-frame), so it runs on
the host in Python/NumPy; the per-frame raster work lives in
``coherence_tpu.raster`` on device.  (Reference: polygon.ml, shapes.ml.)
"""

from .path import (  # noqa: F401
    EVEN_ODD,
    NONZERO,
    Bezier,
    Straight,
    Path,
    Subpath,
    bezier_epsilon,
    bezier_split,
    bezier_subdivide,
    bounds_polygon,
    curve_accuracy,
    edgelist_of_path,
    path_of_pointlist,
    path_proper_bounds,
    points_on_path,
    transform_path,
)
from .shapes import (  # noqa: F401
    BevelJoin,
    ButtCap,
    MitredJoin,
    ProjectingCap,
    RoundCap,
    RoundJoin,
    StrokeSpec,
    arc,
    bounds_stroke,
    circle,
    kappa,
    rectangle,
    restrict_angle,
    rotation,
    strokepath,
    strokepath_polygon,
)
