"""Device raster layer: masks, sprites, rasterization, AA, fills, compositing.

TPU-native replacement for the reference's sparse span algebra
(``sprite.ml``): shapes are dense boolean coverage masks over a bounding box
(padded to hardware-friendly bucket sizes), sprites add premultiplied RGBA
int32 planes.  Set operations become mask logic, ``caf`` becomes a fused
masked compositing kernel, ``bloat``/``erode`` become max/min pooling — all
jitted XLA ops, with Pallas kernels for the per-frame hot paths.
"""

from .region import (  # noqa: F401
    NULL_SHAPE,
    NULL_SPRITE,
    Canvas,
    Shape,
    Sprite,
    bloat,
    boxshape,
    boxsprite,
    box_intersect,
    box_overlap,
    box_union,
    caf,
    erode,
    fillshape,
    flatten_sprite,
    is_null_shape,
    is_null_sprite,
    map_coords,
    newcanvasclear,
    pickup,
    point_in_shape,
    portion,
    sprite_of_mask_rgba,
    shape_any,
    shape_difference,
    shape_intersection,
    shape_intersects,
    shape_of_box,
    shape_of_mask,
    shape_of_sprite,
    shape_union,
    shapesize,
    sprite_map,
    spritesize,
    translate_shape,
    translate_sprite,
)
