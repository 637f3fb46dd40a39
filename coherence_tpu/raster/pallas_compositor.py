"""Pallas TPU kernel: front-to-back layer compositing with per-tile early
termination.

This is the device-native form of the paper's minimal-rendering idea
(render.ml:1310-1335): the frame is a grid of VPU-shaped tiles; each tile
walks the layer stack top-down and **stops issuing DMAs as soon as every
pixel in the tile is opaque** — occluded layers below are never read from
HBM.  The XLA scan compositor (composite_layers_xla / framepath) must stream
every layer; this kernel's traffic scales with visible depth complexity.

Layout: pixels are **packed premultiplied RGBA in one uint32**
(r | g<<8 | b<<16 | a<<24) — the last memref dimension stays at lane width
(a trailing dim of 4 cannot tile onto the TPU) and traffic is 4x less than
channel planes.  Layer pixels are zero outside their masks, which makes
`over` a no-op there, so no separate mask plane is needed; layer 0 is the
topmost.  Per-layer tiles are DMA'd on demand into a double-buffered VMEM
ring so the k+1 fetch overlaps the k composite.

Status / honest benchmark note (TPU v5e, 1080p): for dense layer stacks the
XLA scan is currently faster (~2.3ms vs ~14ms at K=96) — the while-loop +
per-layer DMA overhead dominates at this tile size, and scan's streaming is
near memory bound.  The kernel's structural win (skipping occluded HBM
reads; per-tile layer lists via scalar prefetch for sparse 1000-primitive
scenes where a dense (K, H, W) stack cannot even be materialized) is the
round-2 optimization target; the scene renderer uses the XLA path by
default.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 64
TILE_W = 128
N_BUF = 2  # DMA ring depth


def pack_rgba(rgba):
    """(..., 4) int32 (0..255) -> packed uint32."""
    r = rgba[..., 0].astype(jnp.uint32)
    g = rgba[..., 1].astype(jnp.uint32)
    b = rgba[..., 2].astype(jnp.uint32)
    a = rgba[..., 3].astype(jnp.uint32)
    return r | (g << 8) | (b << 16) | (a << 24)


def unpack_rgba(packed):
    """packed uint32 -> (..., 4) int32."""
    p = packed.astype(jnp.uint32)
    return jnp.stack(
        [
            (p & 0xFF).astype(jnp.int32),
            ((p >> 8) & 0xFF).astype(jnp.int32),
            ((p >> 16) & 0xFF).astype(jnp.int32),
            (p >> 24).astype(jnp.int32),
        ],
        axis=-1,
    )


def _prelerp(p, q, a):
    t = a * p + 128
    return p + q - (((t >> 8) + t) >> 8)


def _over_packed(acc, layer):
    """Porter/Duff over on packed uint32 planes; acc above layer.

    Bit-identical to colour.ml:314-328 for *valid premultiplied* colours:
    the reference's alpha==0 / alpha==255 early-out branches are redundant
    there (prelerp(p, q, 0) = p + q with q = 0 when acc is clear, and
    prelerp(p, q, 255) = q exactly), so they are skipped — fewer VPU ops on
    the hot path.  The accumulator is always valid (it starts clear and only
    accumulates `over`)."""
    aa = (acc >> 24).astype(jnp.int32)
    ar = (acc & 0xFF).astype(jnp.int32)
    ag = ((acc >> 8) & 0xFF).astype(jnp.int32)
    ab = ((acc >> 16) & 0xFF).astype(jnp.int32)
    lr = (layer & 0xFF).astype(jnp.int32)
    lg = ((layer >> 8) & 0xFF).astype(jnp.int32)
    lb = ((layer >> 16) & 0xFF).astype(jnp.int32)
    la = (layer >> 24).astype(jnp.int32)
    r = _prelerp(lr, ar, aa)
    g = _prelerp(lg, ag, aa)
    b = _prelerp(lb, ab, aa)
    a = _prelerp(la, aa, aa)
    return (
        r.astype(jnp.uint32)
        | (g.astype(jnp.uint32) << 8)
        | (b.astype(jnp.uint32) << 16)
        | (a.astype(jnp.uint32) << 24)
    )


def _kernel(bg_ref, layers_hbm, out_ref, scratch, sems):
    k_layers = layers_hbm.shape[0]
    ty = pl.program_id(0)
    tx = pl.program_id(1)

    def tile_copy(k, slot):
        return pltpu.make_async_copy(
            layers_hbm.at[k, pl.ds(ty * TILE_H, TILE_H), pl.ds(tx * TILE_W, TILE_W)],
            scratch.at[slot],
            sems.at[slot],
        )

    # Warm up the ring.
    for i in range(min(N_BUF, k_layers)):
        tile_copy(i, i).start()

    def cond(state):
        k, acc, open_any = state
        return jnp.logical_and(k < k_layers, open_any)

    def body(state):
        k, acc, _ = state
        slot = jax.lax.rem(k, N_BUF)
        tile_copy(k, slot).wait()
        layer = scratch[slot]

        # Refill the slot we just freed.
        @pl.when(k + N_BUF < k_layers)
        def _():
            tile_copy(k + N_BUF, slot).start()

        open_mask = (acc >> 24) != 255
        acc = jnp.where(open_mask, _over_packed(acc, layer), acc)
        open_any = jnp.any((acc >> 24) != 255)
        return k + 1, acc, open_any

    acc0 = jnp.zeros((TILE_H, TILE_W), dtype=jnp.uint32)
    k_fin, acc, _ = jax.lax.while_loop(cond, body, (0, acc0, jnp.bool_(True)))

    # On early exit, DMAs for [k_fin, min(k_fin + N_BUF, K)) are in flight;
    # drain them before the next grid step reuses the slots.
    def drain(j, _):
        tile_copy(j, jax.lax.rem(j, N_BUF)).wait()
        return 0

    jax.lax.fori_loop(k_fin, jnp.minimum(k_fin + N_BUF, k_layers), drain, 0)

    out_ref[:] = _over_packed(acc, bg_ref[:])


@functools.partial(jax.jit, static_argnames=("interpret",))
def composite_layers_packed(background, layers, *, interpret: bool = False):
    """Composite a (K, H, W) packed-uint32 layer stack (layer 0 topmost)
    over a (H, W) packed background.  H, W must be tile multiples."""
    K, H, W = layers.shape
    assert H % TILE_H == 0 and W % TILE_W == 0, (H, W)
    grid = (H // TILE_H, W // TILE_W)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_H, TILE_W), lambda ty, tx: (ty, tx), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (TILE_H, TILE_W), lambda ty, tx: (ty, tx), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((N_BUF, TILE_H, TILE_W), jnp.uint32),
            pltpu.SemaphoreType.DMA((N_BUF,)),
        ],
        interpret=interpret,
    )(background, layers)


def composite_layers_xla(background, layers):
    """XLA scan implementation (same semantics and bit-identical results, no
    per-tile early exit) — the production default."""

    def body(acc, layer):
        open_mask = (acc >> 24) != 255
        acc = jnp.where(open_mask, _over_packed(acc, layer), acc)
        return acc, None

    acc0 = jnp.zeros_like(background)
    acc, _ = jax.lax.scan(body, acc0, layers)
    return _over_packed(acc, background)
