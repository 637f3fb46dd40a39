"""Device-resident scene view: the production fast path for interaction.

Couples the scene model to the sparse tiled-scene Pallas compositor
(raster/tiled_scene): every object's full raster is computed once through
the general pipeline (interior fill + Gaussian-matte AA fringe, exactly as
render.ml:1198-1213), shattered into the frame-aligned atlas, and frames —
full or dirty-tile-restricted — re-render in one kernel dispatch.

Coherence operations:
  * translate an object: re-shatter its existing raster (a vmapped shift;
    no re-rasterization — the device analogue of cache.ml's
    TranslatedObject);
  * edit an object: re-rasterize just it, re-shatter;
  * any change marks the union of old+new tile footprints dirty; only those
    tiles composite on the next frame.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Set

import jax.numpy as jnp
import numpy as np

from .. import colour as C
from ..raster import region
from ..raster.pallas_compositor import TILE_H, TILE_W, pack_rgba, unpack_rgba
from ..raster.region import NULL_SPRITE, translate_sprite
from ..raster.tiled_scene import TiledScene
from . import render as R


def full_sprite_of_object(o: R.Obj, whole_scene=None):
    """An object's complete raster: direct-filled interior + AA fringe,
    composed with one fused caf (the spriteof pipeline of render.ml:1198-1213
    without the update-shape restriction)."""
    shp, minshp = R.shape_of_basicshape(o)
    if shp is None:
        return NULL_SPRITE
    maxshape = region.shape_difference(shp, minshp)
    fill = R.fillin_obj(o).transform(list(o.transform))
    fringe = (
        R.sprite_of_basicshape(o, maxshape, whole_scene or [o])
        if maxshape is not None
        else None
    )
    interior = region.fillshape(minshp, fill) if minshp is not None else None
    spr, _ = region.caf("nocover", "opaque", interior, fringe)
    return spr


class DeviceView:
    """A window-sized packed framebuffer + tiled scene with dirty tracking."""

    def __init__(self, width: int, height: int, bg_colour: int = None):
        # Round up to tile multiples; the logical window is (width, height).
        self.width, self.height = width, height
        self.pw = ((width + TILE_W - 1) // TILE_W) * TILE_W
        self.ph = ((height + TILE_H - 1) // TILE_H) * TILE_H
        self.ts = TiledScene(self.pw, self.ph)
        bg = bg_colour if bg_colour is not None else C.white
        bgvec = jnp.asarray(C.rgba_of_colour(bg), jnp.int32)
        self.background = pack_rgba(
            jnp.broadcast_to(bgvec, (self.ph, self.pw, 4)).astype(jnp.int32)
        )
        self.frame = self.background
        self.order: List[object] = []  # idsets front-to-back
        self.sprites: Dict[object, object] = {}
        self.dirty: Set[int] = set(range(self.ts.nty * self.ts.ntx))

    # --- scene maintenance ----------------------------------------------------

    def _tiles_of(self, key) -> Set[int]:
        return {tile for tile, _ in self.ts.pieces.get(key, ())}

    def set_scene(self, scene: List[R.Obj]):
        """(Re)build from a scene list (front-to-back)."""
        self.order = []
        for o in scene:
            self.add_object(o)

    def add_object(self, o: R.Obj, index: Optional[int] = None):
        spr = full_sprite_of_object(o)
        key = o.idset
        if spr is not None:
            self.ts.add_object(key, spr)
            self.sprites[key] = spr
        else:
            self.ts.pieces[key] = []
            self.sprites[key] = None
        if index is None:
            self.order.append(key)
        else:
            self.order.insert(index, key)
        self.dirty |= self._tiles_of(key)

    def translate_object(self, key, dx: int, dy: int):
        """Move an object by whole pixels: reuse its raster (box shift) and
        re-shatter — no re-rasterization."""
        old_tiles = self._tiles_of(key)
        spr = self.sprites.get(key)
        if spr is None:
            return
        moved = translate_sprite(dx, dy, spr)
        self.sprites[key] = moved
        self.ts.add_object(key, moved)  # replaces the piece list
        self.dirty |= old_tiles | self._tiles_of(key)

    def replace_object(self, key, o: R.Obj):
        """Re-rasterize an edited object in place."""
        old_tiles = self._tiles_of(key)
        spr = full_sprite_of_object(o)
        self.sprites[o.idset] = spr
        if spr is not None:
            self.ts.add_object(o.idset, spr)
        else:
            self.ts.pieces[o.idset] = []
        self.order = [o.idset if k == key else k for k in self.order]
        if key != o.idset:
            self.sprites.pop(key, None)
        self.dirty |= old_tiles | self._tiles_of(o.idset)

    def restack(self, new_order: List[object]):
        """Depth changes: tiles where relative order changed go dirty."""
        moved = {
            k
            for k, (a, b) in enumerate(zip(self.order, new_order))
            if a != b
        }
        for idx in moved:
            self.dirty |= self._tiles_of(self.order[idx])
            self.dirty |= self._tiles_of(new_order[idx])
        self.order = list(new_order)

    # --- rendering -------------------------------------------------------------

    def render(self, full: bool = False) -> None:
        """Composite dirty tiles (or everything) into the frame buffer."""
        if full:
            starts, idxs = self.ts.build_lists(self.order)
            self.frame = self.ts.render(self.background, starts, idxs)
        else:
            if not self.dirty:
                return
            # In-place dirty-tile re-render: the grid runs only over the
            # dirty list (frame is donated into the kernel).
            self.frame = self.ts.render_dirty(
                self.frame, self.background, self.order, sorted(self.dirty)
            )
        self.dirty.clear()

    def read(self) -> np.ndarray:
        """(height, width, 4) uint8 RGBA of the logical window."""
        rgba = unpack_rgba(self.frame)
        return np.asarray(rgba, dtype=np.uint8)[: self.height, : self.width]
