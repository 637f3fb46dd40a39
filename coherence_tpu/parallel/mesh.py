"""Device-mesh sharded frame rendering.

Design (SURVEY.md §7 stage 10): the frame is a dense (H, W, 4) int32 plane
sharded over mesh axis ``y`` along rows (8-multiple tiles per shard).  The
per-frame pipeline is:

  1. composite: front-to-back masked `over` of object layers into the frame
     with an occupancy ("still open") plane — pointwise, zero communication;
  2. convolve (blur filters): separable convs whose halo exchange at shard
     borders XLA inserts automatically from the sharding annotations;
  3. readback of dirty tiles only.

No NCCL/MPI-style code: shardings + jit place `ppermute`-class collectives
on ICI (the scaling-book recipe).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import colour as C


def make_mesh(n_devices: Optional[int] = None, axis: str = "y") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if len(devs) < n:
        raise ValueError(
            f"make_mesh: {n} devices requested but only {len(devs)} available "
            f"(backend {jax.default_backend()!r}) — refusing to silently "
            "downsize; a degenerate 1-device mesh would vacuously pass "
            "multi-device assertions"
        )
    return Mesh(np.array(devs[:n]), (axis,))


def composite_step(frame, open_mask, rgba, mask):
    """One front-to-back composite step (the device core of
    render.ml:1291-1308): `frame` is accumulated output (premultiplied RGBA
    int32), `open_mask` the still-open (not yet opaque) plane; the object
    layer (rgba, mask) paints only open pixels; newly opaque pixels close.

    Pointwise — shards over any spatial partitioning with no communication.
    """
    paint = mask & open_mask
    blended = C.over_rgba(frame, rgba)  # frame is above: earlier objects win
    new_frame = jnp.where(paint[..., None], blended, frame)
    newly_opaque = paint & (new_frame[..., 3] == 255)
    return new_frame, open_mask & ~newly_opaque


def blur_pass(frame, weights, axis: int):
    """Separable integer blur pass (convolve.ml XYKernel semantics)."""
    total = int(np.sum(weights))
    n = len(weights)
    pad = (n - 1) // 2
    x = frame.astype(jnp.float32).transpose(2, 0, 1)[:, :, :, None]
    k = jnp.asarray(np.asarray(weights, np.float32))
    kern = k.reshape(n, 1, 1, 1) if axis == 0 else k.reshape(1, n, 1, 1)
    padding = ((pad, pad), (0, 0)) if axis == 0 else ((0, 0), (pad, pad))
    out = jax.lax.conv_general_dilated(
        x, kern, (1, 1), padding, dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    sums = jnp.round(out[:, :, :, 0].transpose(1, 2, 0)).astype(jnp.int32)
    return sums // total


def sharded_render_step(mesh: Mesh):
    """A jitted full frame step over the mesh: composite a stack of layers
    front-to-back with early-closing occupancy, then a separable blur.

    Returns (step_fn, make_example_args(h, w, n_layers))."""

    axis = mesh.axis_names[0]
    row_sharded = NamedSharding(mesh, P(axis, None, None))
    row_sharded2 = NamedSharding(mesh, P(axis, None))

    blur_weights = (1, 2, 4, 2, 1)

    @functools.partial(jax.jit, out_shardings=(row_sharded, row_sharded2))
    def step(frame, open_mask, layers_rgba, layers_mask):
        frame = jax.lax.with_sharding_constraint(frame, row_sharded)
        open_mask = jax.lax.with_sharding_constraint(open_mask, row_sharded2)

        def body(carry, layer):
            fr, op = carry
            rgba, mask = layer
            fr, op = composite_step(fr, op, rgba, mask)
            return (fr, op), None

        (frame, open_mask), _ = jax.lax.scan(body, (frame, open_mask), (layers_rgba, layers_mask))
        # Blur: conv halos across shard borders become ICI collectives.
        blurred = blur_pass(blur_pass(frame, blur_weights, 0), blur_weights, 1)
        return blurred, open_mask

    def make_example_args(h=64, w=256, n_layers=3, key=0):
        rng = np.random.default_rng(key)
        frame = jnp.zeros((h, w, 4), dtype=jnp.int32)
        open_mask = jnp.ones((h, w), dtype=bool)
        a = rng.integers(0, 256, size=(n_layers, h, w, 1))
        rgb = (rng.integers(0, 256, size=(n_layers, h, w, 3)) * a) // 255
        layers_rgba = jnp.asarray(np.concatenate([rgb, a], -1), dtype=jnp.int32)
        layers_mask = jnp.asarray(rng.random((n_layers, h, w)) < 0.7)
        frame = jax.device_put(frame, row_sharded)
        open_mask = jax.device_put(open_mask, row_sharded2)
        return frame, open_mask, layers_rgba, layers_mask

    return step, make_example_args


def sharded_composite_step(mesh: Mesh):
    step, mk = sharded_render_step(mesh)
    return step, mk


def sharded_blur(mesh: Mesh, frame, weights):
    axis = mesh.axis_names[0]
    sh = NamedSharding(mesh, P(axis, None, None))
    f = jax.device_put(frame, sh)

    @jax.jit
    def go(fr):
        fr = jax.lax.with_sharding_constraint(fr, sh)
        return blur_pass(blur_pass(fr, weights, 0), weights, 1)

    return go(f)
