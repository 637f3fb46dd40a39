"""Sprite/shape persistence (parity: sprite.ml:377-400 — OCaml Marshal of
sprites/shapes to files for toplevel inspection).  Saved as .npz so numpy or
any tool can inspect them; also the checkpoint substrate for caches."""

from __future__ import annotations

import numpy as np

from ..raster import region


def save_sprite(path: str, spr) -> None:
    if spr is None:
        np.savez_compressed(path, null=np.array(True))
        return
    w, h = spr.wh
    np.savez_compressed(
        path,
        box=np.array(spr.box, dtype=np.int64),
        mask=np.asarray(spr.mask)[:h, :w],
        rgba=np.asarray(spr.rgba)[:h, :w].astype(np.int32),
    )


def load_sprite(path: str):
    d = np.load(path)
    if "null" in d:
        return region.NULL_SPRITE
    box = tuple(int(v) for v in d["box"])
    shp = region.shape_of_mask(box, d["mask"])
    if shp is None:
        return region.NULL_SPRITE
    H, W = shp.mask.shape
    import jax.numpy as jnp

    h, w = d["mask"].shape
    rgba = jnp.zeros((H, W, 4), dtype=jnp.int32).at[:h, :w].set(jnp.asarray(d["rgba"]))
    return region.sprite_of_mask_rgba(box, shp.mask, rgba)


def save_shape(path: str, shp) -> None:
    if shp is None:
        np.savez_compressed(path, null=np.array(True))
        return
    np.savez_compressed(
        path, box=np.array(shp.box, dtype=np.int64), mask=shp.mask_np()
    )


def load_shape(path: str):
    d = np.load(path)
    if "null" in d:
        return region.NULL_SHAPE
    return region.shape_of_mask(tuple(int(v) for v in d["box"]), d["mask"])
