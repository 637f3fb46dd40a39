"""Sparse tiled-scene compositor: per-tile front-to-back object lists.

The dense layer-stack compositors (framepath, pallas_compositor) need a
(K, H, W) stack — impossible for a 1000-primitive 4K scene (that would be
~33 GB).  The scene is sparse: each object covers a few tiles.  So:

* each object's cached raster is **shattered once** into frame-aligned
  TILE_H x TILE_W pieces of packed-u32 RGBA (one vmapped shift per object),
  appended to a device **atlas** of shape (n_pieces, TILE_H, TILE_W);
* per frame the host builds, with pure box arithmetic, each tile's
  front-to-back list of atlas entries (a few thousand int32s);
* ONE Pallas kernel walks every tile's list with scalar-prefetched indices,
  DMA-ing exactly the pieces that exist, double-buffered, and **stopping
  early when the tile is opaque** — the device form of render_scene's
  update-shape early termination (render.ml:1310-1335) at tile granularity.

Work and traffic scale with Σ(per-tile visible depth), not scene size times
frame size.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_compositor import TILE_H, TILE_W, _over_packed, pack_rgba
from .region import Box, Sprite

N_BUF = 2


def _default_interpret() -> bool:
    """Pallas TPU kernels must run in interpret mode off-TPU (the CPU
    backend rejects compiled mode outright); on real TPU, compiled."""
    return jax.default_backend() != "tpu"


@functools.partial(jax.jit, static_argnames=())
def _shatter_kernel(packed, oys, oxs):
    """packed (H, W) u32; offsets (n,) each: piece[r, c] =
    packed[r + oy, c + ox] (zero padded)."""

    def one(oy, ox):
        hs, ws = packed.shape
        iy = jnp.arange(TILE_H) + oy
        ix = jnp.arange(TILE_W) + ox
        vy = (iy >= 0) & (iy < hs)
        vx = (ix >= 0) & (ix < ws)
        g = packed[jnp.clip(iy, 0, hs - 1), :][:, jnp.clip(ix, 0, ws - 1)]
        return jnp.where(vy[:, None] & vx[None, :], g, jnp.uint32(0))

    return jax.vmap(one)(oys, oxs)


@functools.partial(jax.jit, donate_argnums=(0,))
def _shatter_into_kernel(atlas, rgba, oys, oxs, base):
    """Pack `rgba` and shatter it into len(oys) tile pieces written into the
    (donated) atlas at slots [base, base+len).  One fused dispatch — the
    per-frame atlas update of an animated object (packing happens in-kernel
    so an unchanged raster costs no eager ops and no re-upload)."""
    block = _shatter_kernel.__wrapped__(pack_rgba(rgba), oys, oxs)
    return jax.lax.dynamic_update_slice(atlas, block, (base, 0, 0))


@functools.partial(jax.jit, donate_argnums=(0,))
def _paste_block_kernel(atlas, block, base):
    """Write a pre-built (k, TILE_H, TILE_W) piece block into the (donated)
    atlas buffer at slots [base, base+k)."""
    return jax.lax.dynamic_update_slice(atlas, block, (base, 0, 0))


def warmup_paste_programs(cap: int, block_ns=(8, 16, 32, 64, 128, 256)) -> None:
    """Load the per-block paste programs for a `cap`-slot atlas, one thread
    per block shape so the loads overlap (CLAUDE.md program-load
    economics).  add_rastered pastes one dispatch PER BLOCK exactly so its
    program set is {(cap, n) : n a fixed chunk or pow2 bucket} — closed and
    scene-independent — instead of one program per (cap, block-shape TUPLE)
    whose key changes with the scene's chunk mix (a first-visit zoom scale
    then paid a fresh ~0.5 s program load inside the interactive step)."""
    import threading

    def one(n):
        _paste_block_kernel(
            jnp.zeros((cap, TILE_H, TILE_W), jnp.uint32),
            jnp.zeros((n, TILE_H, TILE_W), jnp.uint32),
            0,
        )

    threads = [
        threading.Thread(target=one, args=(n,), daemon=True)
        for n in dict.fromkeys(block_ns)
        if n <= cap
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()


@functools.partial(jax.jit, donate_argnums=(0,), static_argnames=("newcap",))
def _grow_atlas_kernel(atlas, *, newcap: int):
    """Grow the atlas buffer to `newcap` slots; the new tail slots are zero
    (the spare-capacity invariant reserve_slots relies on)."""
    pad = jnp.zeros((newcap - atlas.shape[0],) + atlas.shape[1:], atlas.dtype)
    return jnp.concatenate([atlas, pad], axis=0)


@jax.jit
def _box_pieces_kernel(meta):
    """meta (n, 8) int32 [ox, oy, w, h, r, g, b, a]: piece[r, c] = packed
    colour where the (tile-relative) box [ox, ox+w) x [oy, oy+h) covers it."""

    def one(m):
        ox, oy, w, h = m[0], m[1], m[2], m[3]
        col = (
            m[4].astype(jnp.uint32)
            | (m[5].astype(jnp.uint32) << 8)
            | (m[6].astype(jnp.uint32) << 16)
            | (m[7].astype(jnp.uint32) << 24)
        )
        rows = jnp.arange(TILE_H)[:, None]
        cols = jnp.arange(TILE_W)[None, :]
        inside = (rows >= oy) & (rows < oy + h) & (cols >= ox) & (cols < ox + w)
        return jnp.where(inside, col, jnp.uint32(0))

    return jax.vmap(one)(meta)


@functools.partial(jax.jit, donate_argnums=(0,))
def _box_pieces_into_kernel(atlas, meta, base):
    """Synthesize every box piece and write them into the (donated) atlas
    at slots [base, base+n) in one dispatch."""
    block = _box_pieces_kernel.__wrapped__(meta)
    return jax.lax.dynamic_update_slice(atlas, block, (base, 0, 0))


def _kernel(starts_ref, idxs_ref, bg_ref, atlas_hbm, out_ref, scratch, sems):
    t = pl.program_id(0)
    lo = starts_ref[t]
    hi = starts_ref[t + 1]

    def piece_copy(k, slot):
        return pltpu.make_async_copy(
            atlas_hbm.at[idxs_ref[k]], scratch.at[slot], sems.at[slot]
        )

    # Prime the full ring: with only 2 slots primed the pipeline never got
    # deeper than 2 regardless of N_BUF (the body issues k+N_BUF only after
    # waiting k).
    for j in range(N_BUF):
        @pl.when(lo + j < hi)
        def _(j=j):
            piece_copy(lo + j, jax.lax.rem(lo + j, N_BUF)).start()

    def cond(state):
        k, acc, open_any = state
        return jnp.logical_and(k < hi, open_any)

    def body(state):
        k, acc, _ = state
        slot = jax.lax.rem(k, N_BUF)
        piece_copy(k, slot).wait()
        layer = scratch[slot]

        @pl.when(k + N_BUF < hi)
        def _():
            piece_copy(k + N_BUF, slot).start()

        open_mask = (acc >> 24) != 255
        acc = jnp.where(open_mask, _over_packed(acc, layer), acc)
        return k + 1, acc, jnp.any((acc >> 24) != 255)

    acc0 = jnp.zeros((TILE_H, TILE_W), dtype=jnp.uint32)
    k_fin, acc, _ = jax.lax.while_loop(cond, body, (lo, acc0, jnp.bool_(True)))

    # Drain in-flight prefetches after an early exit.
    def drain(j, _):
        piece_copy(j, jax.lax.rem(j, N_BUF)).wait()
        return 0

    jax.lax.fori_loop(k_fin, jnp.minimum(k_fin + N_BUF, hi), drain, 0)

    out_ref[:] = _over_packed(acc, bg_ref[:])


@functools.partial(jax.jit, static_argnames=("nty", "ntx", "interpret"))
def _render_tiles(starts, idxs, background, atlas, *, nty: int, ntx: int,
                  interpret: bool = False):
    grid = (nty * ntx,)
    return pl.pallas_call(
        _kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (TILE_H, TILE_W),
                    lambda t, starts, idxs: (t // ntx, t % ntx),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (TILE_H, TILE_W),
                lambda t, starts, idxs: (t // ntx, t % ntx),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((N_BUF, TILE_H, TILE_W), jnp.uint32),
                pltpu.SemaphoreType.DMA((N_BUF,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(background.shape, jnp.uint32),
        interpret=interpret,
    )(starts, idxs, background, atlas)


# Layers fetched per DMA in the run-contiguous full-frame kernel: the
# per-tile piece list becomes ONE contiguous range of a tile-major gather,
# so each DMA moves _RUN_CHUNK pieces (128 KB) instead of one (32 KB) —
# at the typical visible depth of ~2, one DMA + one loop trip per tile
# replaces two of each (per-piece DMA issue + while-loop scalar overhead
# is what holds the full-frame recomposite under the HBM roofline).
_RUN_CHUNK = 4
# First-chunk DMA lookahead depth of the row kernel (tiles in flight).
_RUN_AHEAD = 3


@jax.jit
def _gather_runs_kernel(atlas, idxs):
    """Tile-major piece runs: runs[k] = atlas[idxs[k]], padded with
    _RUN_CHUNK - 1 zero pieces so the kernel's fixed-size chunk DMAs may
    overfetch past the end of the buffer safely."""
    gathered = atlas[idxs]
    pad = jnp.zeros((_RUN_CHUNK - 1, TILE_H, TILE_W), jnp.uint32)
    return jnp.concatenate([gathered, pad])


def _kernel_runs_row(starts_ref, bg_ref, runs_hbm, out_ref, scratch, sems, *, ntx):
    """Full-frame composite over tile-major contiguous piece runs: tile
    t's front-to-back pieces are runs[starts[t]:starts[t+1]], fetched in
    _RUN_CHUNK-piece chunk DMAs; a scalar switch composites exactly the
    chunk's valid layer count, and early termination between chunks keeps
    render.ml:1322's update-shape semantics at tile granularity.

    Each grid step processes a whole TILE ROW: the
    ~1 us/grid-step orchestration cost (block fetch/flush bookkeeping on
    the scalar core) dominated the per-tile kernel at typical depth ~2, so
    each step now composites ntx tiles (statically unrolled), keeping the
    same cross-tile first-chunk DMA prefetch — tile t's first chunk is
    issued while tile t-1 composites, across row boundaries included."""
    ty = pl.program_id(0)
    n_rows = pl.num_programs(0)
    C = _RUN_CHUNK

    def chunk_copy(base, slot):
        return pltpu.make_async_copy(
            runs_hbm.at[pl.ds(base, C)], scratch.at[slot], sems.at[slot]
        )

    # Row 0 primes the first _RUN_AHEAD tiles; every other row's leading
    # tiles were prefetched by the previous row's trailing iterations.
    n_tiles = n_rows * ntx
    for a in range(_RUN_AHEAD):
        @pl.when(jnp.logical_and(ty == 0, a < n_tiles))
        def _(a=a):
            @pl.when(starts_ref[a] < starts_ref[a + 1])
            def _():
                chunk_copy(starts_ref[a], a % _RUN_AHEAD).start()

    for tx in range(ntx):  # static unroll
        t = ty * ntx + tx
        lo = starts_ref[t]
        hi = starts_ref[t + 1]
        slot_self = jax.lax.rem(t, _RUN_AHEAD)

        def cond(state):
            base, acc, open_any = state
            return jnp.logical_and(base < hi, open_any)

        def body(state, lo=lo, hi=hi, slot_self=slot_self):
            base, acc, _ = state
            is_first = base == lo
            slot = jnp.where(is_first, slot_self, _RUN_AHEAD)

            @pl.when(jnp.logical_not(is_first))
            def _():
                chunk_copy(base, _RUN_AHEAD).start()

            chunk_copy(base, slot).wait()
            chunk = scratch[slot]

            # Composite exactly the chunk's VALID layer count (a scalar
            # branch), not C masked layers — at typical depth ~2 the two
            # masked no-op composites were half the kernel's VPU work.
            def upto(k):
                def f(a):
                    for j in range(k):
                        open_mask = (a >> 24) != 255
                        a = jnp.where(open_mask, _over_packed(a, chunk[j]), a)
                    return a

                return f

            v = jnp.clip(hi - base, 0, C)
            acc = jax.lax.switch(v, [upto(k) for k in range(C + 1)], acc)
            return base + C, acc, jnp.any((acc >> 24) != 255)

        acc0 = jnp.zeros((TILE_H, TILE_W), dtype=jnp.uint32)
        _, acc, _ = jax.lax.while_loop(cond, body, (lo, acc0, jnp.bool_(True)))

        # Prefetch the first chunk of the tile _RUN_AHEAD ahead — AFTER
        # this tile consumed its own chunk, because slot (t + _RUN_AHEAD)
        # mod _RUN_AHEAD IS slot t: issuing earlier would overwrite the
        # buffer this tile is about to read.  In-flight tiles are then
        # t+1 .. t+_RUN_AHEAD (distinct slots), and each DMA has
        # _RUN_AHEAD composites of time to complete before its wait.
        @pl.when(t + _RUN_AHEAD < n_tiles)
        def _():
            nlo = starts_ref[t + _RUN_AHEAD]
            nhi = starts_ref[t + _RUN_AHEAD + 1]

            @pl.when(nlo < nhi)
            def _():
                chunk_copy(nlo, jax.lax.rem(t + _RUN_AHEAD, _RUN_AHEAD)).start()

        out_ref[:, tx * TILE_W : (tx + 1) * TILE_W] = _over_packed(
            acc, bg_ref[:, tx * TILE_W : (tx + 1) * TILE_W]
        )


@functools.partial(jax.jit, static_argnames=("nty", "ntx", "interpret"))
def _render_tiles_runs(starts, background, runs, *, nty: int, ntx: int,
                       interpret: bool = False):
    grid = (nty,)
    return pl.pallas_call(
        functools.partial(_kernel_runs_row, ntx=ntx),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (TILE_H, ntx * TILE_W),
                    lambda ty, starts: (ty, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (TILE_H, ntx * TILE_W),
                lambda ty, starts: (ty, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((_RUN_AHEAD + 1, _RUN_CHUNK, TILE_H, TILE_W), jnp.uint32),
                pltpu.SemaphoreType.DMA((_RUN_AHEAD + 1,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(background.shape, jnp.uint32),
        interpret=interpret,
    )(starts, background, runs)


# Piece-DMA lookahead of the gather-free full-frame kernel: pieces in
# flight across tile AND row boundaries (scratch persists across the
# sequential grid).  8 x 64 KB = 512 KB VMEM.
_PP_AHEAD = 8
# Pieces composited per while-loop trip (amortizes the scalar-core cost of
# sem-wait / DMA-issue / loop bookkeeping over several pieces).
_PP_TRIP = 4


def _kernel_atlas_row(starts_ref, idxs_ref, bg_ref, atlas_hbm, out_ref,
                      scratch, sems, *, ntx):
    """Full-frame composite reading pieces DIRECTLY from the atlas — no
    gather pass.  The run-contiguous kernel's tile-major gather re-reads
    and re-writes every listed piece padded to the atlas-capacity idx
    bucket (2x the listed bytes on the 4K config), which measured ~0.8 ms
    of pure HBM traffic against the row walk's 0.4 ms; fetching each piece
    once from its atlas slot puts the whole composite at the listed-bytes
    floor (piece + background + frame ≈ 185 MB ≈ 0.23 ms on v5e).

    Pipeline: consumption is the contiguous global piece order
    k = 0..starts[-1]) (tiles chain within a row, rows chain through the
    persistent scratch), so piece k+_PP_AHEAD is issued into the slot
    piece k just drained — a static modular double-buffer that crosses
    tile and row boundaries.  Each while trip waits/composites/reissues
    up to _PP_TRIP pieces with a switch on the valid count.

    NO early termination: at the shallow per-tile depths this kernel is
    for (full-frame recomposites, depth ~2) an opaque-saturation test
    costs more VPU work than it saves in DMAs (compositing onto an opaque
    accumulator is already an exact no-op of `_over_packed`); deep stacks
    where termination pays keep `render`/`render_runs` — `render_full`
    picks by average depth."""
    ty = pl.program_id(0)
    n_rows = pl.num_programs(0)
    A, C = _PP_AHEAD, _PP_TRIP
    K = starts_ref[n_rows * ntx]

    def piece_copy(k, slot):
        return pltpu.make_async_copy(
            atlas_hbm.at[idxs_ref[k]], scratch.at[slot], sems.at[slot]
        )

    # Row 0 primes the pipeline with the first A pieces of the frame.
    for a in range(A):
        @pl.when(jnp.logical_and(ty == 0, a < K))
        def _(a=a):
            piece_copy(a, a % A).start()

    for tx in range(ntx):  # static unroll
        t = ty * ntx + tx
        lo = starts_ref[t]
        hi = starts_ref[t + 1]

        def cond(state):
            k, _ = state
            return k < hi

        def body(state, hi=hi):
            k, acc = state
            v = jnp.minimum(hi - k, C)
            for c in range(C):
                @pl.when(c < v)
                def _(c=c):
                    piece_copy(k + c, jax.lax.rem(k + c, A)).wait()

            def upto(m):
                def f(a):
                    for j in range(m):
                        a = _over_packed(a, scratch[jax.lax.rem(k + j, A)])
                    return a

                return f

            acc = jax.lax.switch(v, [upto(m) for m in range(C + 1)], acc)
            # Refill the slots this trip drained: slot (k+c+A) mod A IS
            # slot (k+c) mod A, free now that piece k+c is composited.
            for c in range(C):
                @pl.when(jnp.logical_and(c < v, k + c + A < K))
                def _(c=c):
                    piece_copy(k + c + A, jax.lax.rem(k + c, A)).start()
            return k + v, acc

        acc0 = jnp.zeros((TILE_H, TILE_W), dtype=jnp.uint32)
        _, acc = jax.lax.while_loop(cond, body, (lo, acc0))
        out_ref[:, tx * TILE_W : (tx + 1) * TILE_W] = _over_packed(
            acc, bg_ref[:, tx * TILE_W : (tx + 1) * TILE_W]
        )


@functools.partial(jax.jit, static_argnames=("nty", "ntx", "interpret"))
def _render_tiles_atlas(starts, idxs, background, atlas, *, nty: int,
                        ntx: int, interpret: bool = False):
    return pl.pallas_call(
        functools.partial(_kernel_atlas_row, ntx=ntx),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nty,),
            in_specs=[
                pl.BlockSpec(
                    (TILE_H, ntx * TILE_W),
                    lambda ty, starts, idxs: (ty, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (TILE_H, ntx * TILE_W),
                lambda ty, starts, idxs: (ty, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((_PP_AHEAD, TILE_H, TILE_W), jnp.uint32),
                pltpu.SemaphoreType.DMA((_PP_AHEAD,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(background.shape, jnp.uint32),
        interpret=interpret,
    )(starts, idxs, background, atlas)


def _kernel_subset(coords_ref, spans_ref, idxs_ref, bg_ref, frame_ref, atlas_hbm, out_ref, scratch, sems):
    """Like _kernel but the grid runs over a compacted dirty-tile list; the
    tile position comes from scalar-prefetched coords (block index maps read
    them) and each slot carries its own [lo, hi) span into idxs.  Padding
    slots duplicate the LAST dirty tile's coords+span, so they idempotently
    re-composite identical content — safe under Pallas' deferred output
    flush / input-refetch elision when consecutive grid steps map the same
    block (a passthrough padding slot would race the aliased frame buffer
    and could overwrite a freshly rendered tile with stale pixels).

    A NEGATIVE span (lo < 0) marks a pure passthrough slot: the tile's
    current frame block is copied to the output unchanged.  This is how the
    sharded path parks idle bands without touching their (possibly
    deliberately stale) pixels — a span of (0, 0) would instead composite
    bare background, and re-compositing from the atlas would eagerly
    refresh a tile the caller never marked dirty.  frame_ref is the same
    buffer as the aliased output, fetched per-slot; only passthrough slots
    read it, and their tiles are written by no other slot, so the read
    cannot race a pending flush."""
    t = pl.program_id(0)
    # coords/spans are FLAT (2 * n_slots,) int32, slot t at [2t, 2t+1]:
    # Pallas pads each ROW of a prefetched SMEM operand to ~512 B, so a
    # (1024, 2) operand costs 512 KB of the ~1 MB SMEM budget (observed
    # RESOURCE_EXHAUSTED at the 4K grid's 1024-slot bucket); flat 1-D
    # operands stay at payload size.
    lo = spans_ref[2 * t]
    hi = spans_ref[2 * t + 1]

    @pl.when(lo < 0)
    def _():
        out_ref[:] = frame_ref[:]

    @pl.when(lo >= 0)
    def _():
        def piece_copy(k, slot):
            return pltpu.make_async_copy(
                atlas_hbm.at[idxs_ref[k]], scratch.at[slot], sems.at[slot]
            )

        for j in range(N_BUF):  # prime the full ring (see _kernel)
            @pl.when(lo + j < hi)
            def _(j=j):
                piece_copy(lo + j, jax.lax.rem(lo + j, N_BUF)).start()

        def cond(state):
            k, acc, open_any = state
            return jnp.logical_and(k < hi, open_any)

        def body(state):
            k, acc, _ = state
            slot = jax.lax.rem(k, N_BUF)
            piece_copy(k, slot).wait()
            layer = scratch[slot]

            @pl.when(k + N_BUF < hi)
            def _():
                piece_copy(k + N_BUF, slot).start()

            open_mask = (acc >> 24) != 255
            acc = jnp.where(open_mask, _over_packed(acc, layer), acc)
            return k + 1, acc, jnp.any((acc >> 24) != 255)

        acc0 = jnp.zeros((TILE_H, TILE_W), dtype=jnp.uint32)
        k_fin, acc, _ = jax.lax.while_loop(cond, body, (lo, acc0, jnp.bool_(True)))

        def drain(j, _):
            piece_copy(j, jax.lax.rem(j, N_BUF)).wait()
            return 0

        jax.lax.fori_loop(k_fin, jnp.minimum(k_fin + N_BUF, hi), drain, 0)

        out_ref[:] = _over_packed(acc, bg_ref[:])


@functools.partial(
    jax.jit, static_argnames=("n_slots", "interpret"), donate_argnums=(4,)
)
def _render_dirty_tiles(coords, spans, idxs, background, frame, atlas, *,
                        n_slots: int, interpret: bool = False):
    """Re-render only the listed tiles in-place in `frame` (donated).

    coords: FLAT (2 * n_slots,) int32 [tile_y, tile_x] per slot; spans:
    FLAT (2 * n_slots,) int32 [lo, hi) into idxs, or (-1, -1) for a
    frame-passthrough slot (1-D because Pallas pads each ROW of a
    prefetched SMEM operand to ~512 B — see _kernel_subset).  Padding
    slots must duplicate the last real slot (idempotent re-render)."""
    grid = (n_slots,)
    tile_block = pl.BlockSpec(
        (TILE_H, TILE_W),
        lambda t, coords, spans, idxs: (coords[2 * t], coords[2 * t + 1]),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        _kernel_subset,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=[
                tile_block,  # background
                tile_block,  # frame (aliased with the output; see kernel)
                pl.BlockSpec(memory_space=pl.ANY),  # atlas
            ],
            out_specs=pl.BlockSpec(
                (TILE_H, TILE_W),
                lambda t, coords, spans, idxs: (coords[2 * t], coords[2 * t + 1]),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((N_BUF, TILE_H, TILE_W), jnp.uint32),
                pltpu.SemaphoreType.DMA((N_BUF,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(frame.shape, jnp.uint32),
        input_output_aliases={4: 0},  # frame (3 prefetch + bg, frame)
        interpret=interpret,
    )(coords, spans, idxs, background, frame, atlas)


class PieceMap(dict):
    """``key -> [(tile, entry), ...]`` with a maintained reverse index
    ``by_tile: tile -> {key: [entries]}``.

    Every mutation path assigns whole entry lists (``pieces[key] = ...``),
    so __setitem__ is the single place the index updates.  The index is
    what makes per-frame host work scale with the DIRTY area instead of
    the scene: ``_dirty_args``/sharded builders query only the dirty
    tiles' key sets rather than walking every object's piece list."""

    def __init__(self):
        super().__init__()
        self.by_tile: Dict[int, Dict[object, List[int]]] = {}
        self.version = 0  # bumps on every assignment (cache invalidation)

    def __setitem__(self, key, entries):
        self.version += 1
        old = super().get(key)
        if old:
            for tile, _ in old:
                d = self.by_tile.get(tile)
                if d is not None:
                    d.pop(key, None)
                    if not d:
                        del self.by_tile[tile]
        entries = list(entries)
        super().__setitem__(key, entries)
        for tile, entry in entries:
            self.by_tile.setdefault(tile, {}).setdefault(key, []).append(entry)

    def __delitem__(self, key):
        self[key] = []
        super().__delitem__(key)

    def pop(self, key, *default):
        if key in self:
            got = self[key]
            del self[key]
            return got
        if default:
            return default[0]
        raise KeyError(key)

    def tile_entries(self, tile: int, pos: Dict[object, int],
                     skip=None) -> List[Tuple[int, int]]:
        """(order_pos, entry) pairs of every ordered key covering `tile`
        (unsorted; callers sort once after merging overrides)."""
        out = []
        d = self.by_tile.get(tile)
        if d:
            for key, es in d.items():
                if skip is not None and key in skip:
                    continue
                p = pos.get(key)
                if p is not None:
                    for e in es:
                        out.append((p, e))
        return out


class TiledScene:
    """Frame-grid atlas of object raster pieces + per-frame tile lists."""

    def __init__(self, width: int, height: int):
        assert width % TILE_W == 0 and height % TILE_H == 0
        self.width, self.height = width, height
        self.ntx = width // TILE_W
        self.nty = height // TILE_H
        # Capacity model: ONE (cap, TH, TW) u32 buffer, cap a pow2 >=
        # _n_pieces, slots >= _n_pieces zero.  Adds paste into spare
        # capacity (amortized-doubling growth) instead of concatenating
        # chunks, so (a) scene edits cost one in-place dispatch, not an
        # O(atlas) rebuild, and (b) every downstream program's shape key
        # (full render, dirty render, fused animated frame) stays stable
        # across edits within a capacity bucket — no recompiles/reloads.
        self._data: Optional[jnp.ndarray] = None
        self._n_pieces = 0
        # Free pool: sorted disjoint coalesced (start, len) runs of slots
        # below _n_pieces whose objects were replaced/removed.  Recycled by
        # later allocations (every ingest kernel fully overwrites each
        # allocated slot before its entry is installed, so stale content is
        # never visible); without it, dragging a non-animated object or
        # repeatedly editing a scene grows the atlas without bound.
        self._free_runs: List[Tuple[int, int]] = []
        # object id -> list of (tile_index, atlas_entry), with reverse index
        self.pieces: PieceMap = PieceMap()
        # animated objects: key -> (slot base, capacity)
        self._reserved: Dict[object, Tuple[int, int]] = {}
        # order -> position cache (invalidated by list identity/length; the
        # view layer always installs a NEW list on reorder, and in-place
        # inserts change the length, so both changes are caught)
        self._order_cache: Optional[Tuple[object, int, Dict[object, int]]] = None

    def reset(self) -> None:
        """Clear the scene but KEEP the atlas buffer's capacity: the slots
        re-zero in one device op (restoring the spare-capacity invariant)
        and pieces/reservations/caches clear.  An in-place scene swap —
        interactive zoom re-rasterizes the whole transformed scene
        (engine.ml:1015-1057) — then reuses the allocation and every
        loaded program (the shape keys are capacity-bucketed)."""
        if self._data is not None:
            self._data = jnp.zeros(self._data.shape, jnp.uint32)
        self._n_pieces = 0
        self._free_runs = []
        self.pieces = PieceMap()
        self._reserved = {}
        self._order_cache = None
        # Drop any cached BandedAtlas: the fresh PieceMap's version counter
        # restarts at 0, and a rebuild with the same assignment count would
        # otherwise COLLIDE with the old cache's version — _banded_of would
        # serve the previous scene's sharded atlas.
        self._banded = None

    def _ensure(self, k: int) -> None:
        """Guarantee spare capacity for `k` more pieces beyond _n_pieces.
        New capacity is the next pow2 (amortized doubling); fresh slots are
        zero — the invariant every paste/shatter path relies on."""
        need = self._n_pieces + k
        if self._data is None:
            cap = 8
            while cap < need:
                cap *= 2
            self._data = jnp.zeros((cap, TILE_H, TILE_W), jnp.uint32)
        elif need > self._data.shape[0]:
            cap = int(self._data.shape[0])
            while cap < need:
                cap *= 2
            self._data = _grow_atlas_kernel(self._data, newcap=cap)

    def _alloc(self, k: int) -> int:
        """Allocate `k` contiguous atlas slots: best-fit from the free pool
        (exact fits are common — a drag replaces an object with an
        identical piece count), else append beyond _n_pieces.  The caller
        MUST fully overwrite slots [base, base+k) before installing
        entries that reference them."""
        best = None
        for i, (start, ln) in enumerate(self._free_runs):
            if ln >= k and (best is None or ln < self._free_runs[best][1]):
                best = i
                if ln == k:
                    break
        if best is not None:
            start, ln = self._free_runs[best]
            if ln == k:
                self._free_runs.pop(best)
            else:
                self._free_runs[best] = (start + k, ln - k)
            return start
        self._ensure(k)
        base = self._n_pieces
        self._n_pieces += k
        return base

    def _free_entries(self, entries) -> None:
        """Return entries' atlas slots to the free pool (coalesced runs).
        _n_pieces never shrinks — slots >= _n_pieces must stay ZERO (the
        spare-capacity invariant reserve_slots and _grow rely on), and
        freed slots may hold stale content."""
        slots = sorted(e for _, e in entries)
        if not slots:
            return
        runs = []
        s0 = prev = slots[0]
        for s in slots[1:]:
            if s == prev + 1:
                prev = s
            else:
                runs.append((s0, prev - s0 + 1))
                s0 = prev = s
        runs.append((s0, prev - s0 + 1))
        merged = sorted(self._free_runs + runs)
        out: List[Tuple[int, int]] = []
        for start, ln in merged:
            if out and start <= out[-1][0] + out[-1][1]:
                pe = out[-1][0] + out[-1][1]
                assert start == pe, "double-free of atlas slots"
                out[-1] = (out[-1][0], start + ln - out[-1][0])
            else:
                out.append((start, ln))
        self._free_runs = out

    def _free_object(self, key) -> None:
        """Free `key`'s current slots ahead of replacement: the whole
        reserved run for an animated object, else its piece entries."""
        res = self._reserved.get(key)
        if res is not None:
            base, cap = res
            del self._reserved[key]
            self._free_entries([(0, base + j) for j in range(cap)])
            self.pieces.pop(key, None)
        else:
            old = self.pieces.pop(key, None)
            if old:
                self._free_entries(old)

    def remove_object(self, key) -> None:
        """Delete an object from the scene: its slots (and any reserved
        run) return to the free pool for reuse by later adds.  The caller
        is responsible for dirtying its tiles and dropping it from the
        compositing order."""
        self._free_object(key)

    def set_empty(self, key) -> None:
        """Install an empty piece list for `key`, freeing any slots its
        previous pieces held (offscreen-translated objects)."""
        self._free_object(key)
        self.pieces[key] = []

    def _order_pos(self, order) -> Dict[object, int]:
        cached = self._order_cache
        if cached is not None and cached[0] is order and cached[1] == len(order):
            return cached[2]
        pos = {k: i for i, k in enumerate(order)}
        self._order_cache = (order, len(order), pos)
        return pos

    def add_object(self, key, spr: Sprite) -> None:
        """Shatter a sprite's raster into frame-aligned tile pieces
        (one-time per object; frame coords are 1-based boxes)."""
        x0, y0, x1, y1 = spr.box
        # Frame pixel p (1-based) lives in tile (p-1)//TILE.
        tx_lo = max(0, (x0 - 1) // TILE_W)
        tx_hi = min(self.ntx - 1, (x1 - 1) // TILE_W)
        ty_lo = max(0, (y0 - 1) // TILE_H)
        ty_hi = min(self.nty - 1, (y1 - 1) // TILE_H)
        coords = [
            (ty, tx)
            for ty in range(ty_lo, ty_hi + 1)
            for tx in range(tx_lo, tx_hi + 1)
        ]
        # Replacing a non-reserved key: recycle its old slots (freeing
        # FIRST gives the usual same-piece-count drag an exact-fit reuse).
        if key not in self._reserved:
            old = self.pieces.get(key)
            if old:
                self._free_entries(old)
                self.pieces[key] = []
        if not coords:
            self.pieces[key] = []
            return
        # piece[r, c] = packed[(ty*TH + r) - (y0-1), (tx*TW + c) - (x0-1)]
        oys = np.asarray([ty * TILE_H - (y0 - 1) for ty, _ in coords], np.int32)
        oxs = np.asarray([tx * TILE_W - (x0 - 1) for _, tx in coords], np.int32)
        base = self._alloc(len(coords))
        # ONE fused dispatch (pack + shatter + paste) — the same program the
        # animated in-place update uses, so it is usually already loaded.
        self._data = _shatter_into_kernel(self._data, spr.rgba, oys, oxs, base)
        entries = []
        for j, (ty, tx) in enumerate(coords):
            entries.append((ty * self.ntx + tx, base + j))
        self.pieces[key] = entries

    def add_boxes(self, items) -> None:
        """Bulk-ingest plain-colour rectangle layers:
        ``items = [(key, (x0, y0, x1, y1), (r, g, b, a)), ...]`` (1-based
        inclusive boxes, premultiplied 0..255 channels).

        The batched form of add_object for box sprites: every piece of every
        box is synthesized directly in ONE device call (no per-object sprite
        construction, packing, or shattering) — e.g. a 1000-primitive scene
        ingests in a single kernel instead of ~4000 round trips."""
        metas: List[List[int]] = []
        regs: List[Tuple[object, List[Tuple[int, int]]]] = []
        for key, box, rgba in items:
            if key not in self._reserved and self.pieces.get(key):
                self._free_entries(self.pieces[key])
                self.pieces[key] = []
            x0, y0, x1, y1 = box
            tx_lo = max(0, (x0 - 1) // TILE_W)
            tx_hi = min(self.ntx - 1, (x1 - 1) // TILE_W)
            ty_lo = max(0, (y0 - 1) // TILE_H)
            ty_hi = min(self.nty - 1, (y1 - 1) // TILE_H)
            entries = []
            for ty in range(ty_lo, ty_hi + 1):
                for tx in range(tx_lo, tx_hi + 1):
                    entries.append((ty * self.ntx + tx, len(metas)))
                    metas.append(
                        [
                            (x0 - 1) - tx * TILE_W,
                            (y0 - 1) - ty * TILE_H,
                            x1 - x0 + 1,
                            y1 - y0 + 1,
                            *(int(v) for v in rgba),
                        ]
                    )
            regs.append((key, entries))
        if not metas:
            for key, entries in regs:
                self.pieces[key] = entries
            return
        # pow2-pad the piece count so the kernel compiles per bucket; padding
        # rows have w == h == 0 and occupy (unreferenced) atlas slots.
        n = len(metas)
        nb = 8
        while nb < n:
            nb *= 2
        meta = np.zeros((nb, 8), dtype=np.int32)
        meta[:n] = np.asarray(metas, dtype=np.int32)
        base = self._alloc(nb)
        # padding rows (w == h == 0) write zero pieces into their slots —
        # full-slot writes, so a recycled run is safe here too.
        self._data = _box_pieces_into_kernel(self._data, meta, base)
        for key, entries in regs:
            self.pieces[key] = [(tile, base + e) for tile, e in entries]

    def add_rastered(self, registry, blocks) -> None:
        """Ingest pieces produced by the tile-normalized batched rasterizer
        (raster/tile_raster): `blocks` is a list of (n, TILE_H, TILE_W) u32
        device arrays, `registry` maps key -> [(tile, block_id, slot)]."""
        for key in registry:
            if key not in self._reserved and self.pieces.get(key):
                self._free_entries(self.pieces[key])
                self.pieces[key] = []
        sizes = [int(blk.shape[0]) for blk in blocks]
        total = sum(sizes)
        # ONE contiguous run for all blocks (exact-fit reuse when a scene
        # content of the same piece count was just replaced).
        off = self._alloc(total) if total else 0
        base = []
        for sz in sizes:
            base.append(off)
            off += sz
        if total:
            # One paste dispatch per block (donated chain): the program set
            # is {(cap, block_n)} — block_n a fixed chunk or pow2 bucket —
            # so it is closed and warmup_paste_programs can preload it.  A
            # variadic all-blocks paste keyed on the block-shape TUPLE
            # minted a fresh program whenever the scene's chunk mix
            # changed (e.g. the first visit of a zoom scale).  Dispatches
            # are ~0.4 ms each; the loads were ~0.5 s.
            data = self._data
            for blk, b in zip(blocks, base):
                data = _paste_block_kernel(data, blk, b)
            self._data = data
        for key, pieces in registry.items():
            self.pieces[key] = [
                (tile, base[b] + slot) for tile, b, slot in pieces
            ]

    def reserve_slots(self, key, cap: int) -> None:
        """Reserve `cap` fixed atlas slots for an ANIMATED object: its
        pieces update in place every frame (update_object_inplace) instead
        of appending a fresh block per move — the atlas stays fixed-size
        and no per-frame concatenation/upload happens."""
        # Append-only (never _alloc from the free pool): reserved slots
        # must start ZERO — nothing writes them until the first in-place
        # update — and recycled slots hold stale content.
        base = self._n_pieces
        self._ensure(cap)  # reserved slots start zero (spare-capacity invariant)
        self._n_pieces += cap
        self._reserved[key] = (base, cap)
        self.pieces[key] = []

    def _inplace_args(self, key, spr: Sprite):
        """Host-side args for the in-place shatter of an animated object:
        (oys, oxs, base, entries), or None for an off-grid sprite.  Updates
        no state; the caller runs the kernel and installs `entries`."""
        base, cap = self._reserved[key]
        x0, y0, x1, y1 = spr.box
        tx_lo = max(0, (x0 - 1) // TILE_W)
        tx_hi = min(self.ntx - 1, (x1 - 1) // TILE_W)
        ty_lo = max(0, (y0 - 1) // TILE_H)
        ty_hi = min(self.nty - 1, (y1 - 1) // TILE_H)
        coords = [
            (ty, tx)
            for ty in range(ty_lo, ty_hi + 1)
            for tx in range(tx_lo, tx_hi + 1)
        ]
        if len(coords) > cap:
            raise ValueError(f"update_object_inplace: {len(coords)} pieces > cap {cap}")
        if not coords:
            return None
        # Pad to cap by repeating the last piece (unreferenced duplicates
        # are harmless; a fixed count keeps one XLA program).
        padded = coords + [coords[-1]] * (cap - len(coords))
        # np (not device) arrays: jit argument conversion rides the dispatch
        # instead of paying a standalone eager transfer round trip.
        oys = np.asarray([ty * TILE_H - (y0 - 1) for ty, _ in padded], np.int32)
        oxs = np.asarray([tx * TILE_W - (x0 - 1) for _, tx in padded], np.int32)
        entries = [
            (ty * self.ntx + tx, base + j) for j, (ty, tx) in enumerate(coords)
        ]
        return oys, oxs, base, entries

    def update_object_inplace(self, key, spr: Sprite) -> None:
        """Move/replace an animated object's raster: shatter into its
        reserved slots with ONE fused dispatch (donated atlas).  The
        sprite must fit the reserved capacity ((tiles_y+?) x (tiles_x+?)
        of the sprite that was reserved for)."""
        got = self._inplace_args(key, spr)
        if got is None:
            self.pieces[key] = []
            return
        oys, oxs, base, entries = got
        self._data = _shatter_into_kernel(self._data, spr.rgba, oys, oxs, base)
        self.pieces[key] = entries

    def atlas(self) -> jnp.ndarray:
        if self._data is None:
            self._ensure(0)  # empty scene: minimal all-zero buffer
        return self._data

    def build_lists(self, order: List[object], dirty_tiles=None):
        """Per-tile front-to-back entry lists for objects in `order`
        (topmost first).  Pure host box arithmetic.  `dirty_tiles` optionally
        restricts which tiles get content (others render background only)."""
        n_tiles = self.ntx * self.nty
        per_tile: List[List[int]] = [[] for _ in range(n_tiles)]
        allowed = None if dirty_tiles is None else set(dirty_tiles)
        for key in order:
            for tile, entry in self.pieces.get(key, ()):
                if allowed is None or tile in allowed:
                    per_tile[tile].append(entry)
        starts = np.zeros(n_tiles + 1, dtype=np.int32)
        for t in range(n_tiles):
            starts[t + 1] = starts[t] + len(per_tile[t])
        # pow2 padding keeps the kernel's jit shape key stable across frames;
        # rounding up to the atlas CAPACITY keeps it stable across SCENES
        # too (a zoom step culls offscreen pieces, and a smaller pow2 bucket
        # would mint fresh gather/row-kernel program shapes — a multi-second
        # program load inside an interactive step).  Padding entries are
        # zeros; the row kernel never walks past starts[-1].
        n_idx = 8
        while n_idx < starts[-1]:
            n_idx *= 2
        if self._data is not None:
            n_idx = max(n_idx, int(self._data.shape[0]))
        idxs = np.zeros(n_idx, dtype=np.int32)
        pos = 0
        for t in range(n_tiles):
            for e in per_tile[t]:
                idxs[pos] = e
                pos += 1
        return jnp.asarray(starts), jnp.asarray(idxs)

    def render(self, background, starts, idxs) -> jnp.ndarray:
        """Composite all listed pieces over `background` ((H, W) packed u32)."""
        return _render_tiles(
            starts, idxs, background, self.atlas(), nty=self.nty, ntx=self.ntx,
            interpret=_default_interpret(),
        )

    def render_runs(self, background, starts, idxs) -> jnp.ndarray:
        """Full-frame composite via the run-contiguous kernel: gather the
        listed pieces tile-major ONCE (one fused device op), then fetch
        each tile's whole front-to-back list in _RUN_CHUNK-piece DMAs.
        Pixel-identical to `render` (same fold, same pieces); faster for
        full frames because per-piece DMA issue + loop overhead is the
        bottleneck at typical visible depth ~2.  The gather re-reads the
        listed pieces (~depth x frame bytes), so the dirty path — whose
        piece lists change every frame anyway — keeps the in-place
        per-piece kernel."""
        runs = _gather_runs_kernel(self.atlas(), idxs)
        return _render_tiles_runs(
            starts, background, runs, nty=self.nty, ntx=self.ntx,
            interpret=_default_interpret(),
        )

    def render_full(self, background, starts, idxs) -> jnp.ndarray:
        """Full-frame composite via the gather-free atlas kernel: each
        listed piece is DMA'd once from its atlas slot (no tile-major
        gather materialization — see _kernel_atlas_row).  Pixel-identical
        to `render`/`render_runs`.  Scenes whose average visible depth is
        deep enough for opaque early-termination to pay (the atlas kernel
        deliberately has none) fall back to the per-piece kernel."""
        n_tiles = self.ntx * self.nty
        # Depth heuristic from the host-side piece map (reading starts[-1]
        # off the device would be a ~73 ms tunnel sync).
        n_listed = sum(len(v) for v in self.pieces.values())
        if n_listed > 8 * n_tiles:
            return self.render(background, starts, idxs)
        return _render_tiles_atlas(
            starts, idxs, background, self.atlas(), nty=self.nty,
            ntx=self.ntx, interpret=_default_interpret(),
        )

    def _dirty_args(self, order, dirty_tiles, pieces_override=None):
        """Host-side (coords, spans, idxs, n_slots) for the compacted
        dirty-tile grid, or None when nothing is dirty.  `pieces_override`
        maps key -> entries to use INSTEAD of self.pieces[key] (the fused
        animated step passes the moved object's new entries before they
        are installed)."""
        dirty = sorted(set(dirty_tiles))
        if not dirty:
            return None
        # O(dirty-tiles x depth log depth) via the PieceMap reverse index —
        # never a walk of every object's piece list (scene-size independent).
        pos = self._order_pos(order)
        over_by_tile: Optional[Dict[int, List[Tuple[int, int]]]] = None
        if pieces_override:
            over_by_tile = {}
            for key, entries in pieces_override.items():
                p = pos.get(key)
                if p is None:
                    continue
                for tile, entry in entries:
                    over_by_tile.setdefault(tile, []).append((p, entry))
        per_tile = {}
        for t in dirty:
            cand = self.pieces.tile_entries(t, pos, skip=pieces_override)
            if over_by_tile and t in over_by_tile:
                cand.extend(over_by_tile[t])
            cand.sort()
            per_tile[t] = [e for _, e in cand]
        n = len(dirty)
        n_slots = 8
        while n_slots < n:
            n_slots *= 2
        # FLAT (2 * n_slots,) slot arrays (SMEM row padding; see
        # _kernel_subset): slot j lives at [2j, 2j+1].
        coords = np.zeros(2 * n_slots, np.int32)
        spans = np.zeros(2 * n_slots, np.int32)
        idxs_list = []
        for j, t in enumerate(dirty):
            coords[2 * j] = t // self.ntx
            coords[2 * j + 1] = t % self.ntx
            lo = len(idxs_list)
            idxs_list.extend(per_tile[t])
            spans[2 * j] = lo
            spans[2 * j + 1] = len(idxs_list)
        # Padding slots duplicate the last dirty tile: an idempotent
        # re-render is correct under any Pallas block flush/fetch timing,
        # where a frame passthrough would not be (see _kernel_subset).
        coords[2 * n :: 2] = coords[2 * n - 2]
        coords[2 * n + 1 :: 2] = coords[2 * n - 1]
        spans[2 * n :: 2] = spans[2 * n - 2]
        spans[2 * n + 1 :: 2] = spans[2 * n - 1]
        # Pad the entry list to a pow2 length so the jitted kernel's shape
        # key is stable across frames (no retraces as lists grow/shrink).
        n_idx = 8
        while n_idx < len(idxs_list):
            n_idx *= 2
        idxs = np.zeros(n_idx, np.int32)
        idxs[: len(idxs_list)] = idxs_list
        return coords, spans, idxs, n_slots

    def render_dirty(self, frame, background, order, dirty_tiles) -> jnp.ndarray:
        """Re-render ONLY `dirty_tiles` in-place in `frame` (donated): the
        grid runs over the compacted dirty list, so work scales with the
        dirty area, not the frame (render.ml's minimality, device-side)."""
        got = self._dirty_args(order, dirty_tiles)
        if got is None:
            return frame
        coords, spans, idxs, n_slots = got
        # np arrays ride the jit dispatch; eager jnp.asarray would cost a
        # standalone transfer round trip each per frame.
        return _render_dirty_tiles(
            coords,
            spans,
            idxs,
            background,
            frame,
            self.atlas(),
            n_slots=n_slots,
            interpret=_default_interpret(),
        )


class BandedAtlas:
    """Per-band sharded atlas: band d's local atlas holds ONLY the pieces
    whose tiles fall in band d, plus every reserved (animated) block — so
    per-device atlas memory is ~1/n_dev of the replicated global atlas
    instead of a full copy on every chip (SURVEY §5.8 scale-out).

    Layout: reserved blocks first at IDENTICAL local offsets on every band
    (animated objects roam across bands, and a band-invariant base lets the
    per-frame in-place update address every band the same way), then each
    band's static pieces.  ``g2l[d]`` maps global atlas entries to band-d
    local slots; entries a band never references are absent."""

    def __init__(self, ts: "TiledScene", n_dev: int):
        assert ts.nty % n_dev == 0, (ts.nty, n_dev)
        self.n_dev = n_dev
        self.version = ts.pieces.version
        band_tiles = ts.ntx * (ts.nty // n_dev)

        # Reserved blocks first, globally ordered by base slot.
        res = sorted(ts._reserved.items(), key=lambda kv: kv[1][0])
        self.reserved_local: Dict[object, int] = {}
        res_g2l: Dict[int, int] = {}
        off = 0
        for key, (base, cap) in res:
            self.reserved_local[key] = off
            for j in range(cap):
                res_g2l[base + j] = off + j
            off += cap
        n_res = off

        per_band_static: List[List[int]] = []
        for d in range(n_dev):
            seen = set()
            for t in range(d * band_tiles, (d + 1) * band_tiles):
                for es in ts.pieces.by_tile.get(t, {}).values():
                    for e in es:
                        if e not in res_g2l:
                            seen.add(e)
            per_band_static.append(sorted(seen))

        local_cap = n_res + max((len(s) for s in per_band_static), default=0)
        cap = 8
        while cap < local_cap:
            cap *= 2  # pow2 pad: stable kernel shapes as the scene grows
        self.local_cap = cap

        gidx = np.zeros((n_dev, cap), np.int32)
        self.g2l: List[Dict[int, int]] = []
        for d, statics in enumerate(per_band_static):
            m = dict(res_g2l)
            for key, (base, cap_r) in res:
                for j in range(cap_r):
                    gidx[d, self.reserved_local[key] + j] = base + j
            for j, g in enumerate(statics):
                m[g] = n_res + j
                gidx[d, n_res + j] = g
            self.g2l.append(m)

        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh = getattr(ts, "_banded_mesh", None)
        take = jnp.take(ts.atlas(), jnp.asarray(gidx), axis=0)
        if mesh is not None:
            take = jax.device_put(
                take, NamedSharding(mesh, P(mesh.axis_names[0], None, None, None))
            )
        self.data = take  # (n_dev, local_cap, TILE_H, TILE_W) u32

    def map_entries(self, d: int, entries: List[int]) -> List[int]:
        g = self.g2l[d]
        return [g[e] for e in entries]

    def update_inplace(self, ts: "TiledScene", key, rgba, entries, oys, oxs,
                       mesh) -> None:
        """Per-frame animated update: write the moved object's pieces into
        every band's reserved slots with ONE sharded dispatch (banded data
        donated).  Band-active pieces (tile in the band) write real
        content; the rest write zero tiles via out-of-range offsets —
        harmless because a band's tile lists only reference reserved slots
        whose tiles lie in that band.  Keeps per-frame cost O(cap) per
        device instead of an O(atlas) gather rebuild.

        Callers must sync ``self.version = ts.pieces.version`` after the
        piece-list install so the cache stays valid."""
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        rb = self.reserved_local[key]
        base, cap = ts._reserved[key]
        band_tiles = ts.ntx * (ts.nty // self.n_dev)
        OOB = np.int32(1 << 20)  # beyond any raster: shatter yields zeros
        oys_b = np.full((self.n_dev, cap), OOB, np.int32)
        oxs_b = np.full((self.n_dev, cap), OOB, np.int32)
        for tile, g_entry in entries:
            j = g_entry - base
            d = tile // band_tiles
            oys_b[d, j] = oys[j]
            oxs_b[d, j] = oxs[j]

        axis = mesh.axis_names[0]

        def band_upd(atlas_l, oys_l, oxs_l):
            return _shatter_into_kernel.__wrapped__(
                atlas_l[0], rgba, oys_l[0], oxs_l[0], rb
            )[None]

        fn = shard_map(
            band_upd,
            mesh=mesh,
            in_specs=(P(axis, None, None, None), P(axis, None), P(axis, None)),
            out_specs=P(axis, None, None, None),
            check_vma=False,
        )
        self.data = jax.jit(fn, donate_argnums=(0,))(self.data, oys_b, oxs_b)


def _banded_of(ts: TiledScene, mesh) -> BandedAtlas:
    """Cached per-band atlas for `mesh` (rebuilt when pieces change)."""
    n_dev = mesh.devices.size
    cached = getattr(ts, "_banded", None)
    if (
        cached is not None
        and cached.n_dev == n_dev
        and cached.version == ts.pieces.version
    ):
        return cached
    ts._banded_mesh = mesh
    banded = BandedAtlas(ts, n_dev)
    ts._banded = banded
    return banded


def render_sharded(ts: TiledScene, background, order, mesh, interpret: bool = False):
    """Multi-chip frame render: tile ROWS shard over the mesh; each device
    runs the tiled kernel on its band with its own per-tile lists.

    The atlas is BANDED, not replicated: `BandedAtlas` repacks each band's
    referenced pieces into a per-device shard (~1/n_dev of the global atlas
    bytes) and the per-band scalar lists index BAND-LOCAL slots.  The lists
    are built host-side and stacked with padding.  Compositing is
    spatially local, so there is no cross-device communication at all —
    scale-out is embarrassingly parallel until filters need halos
    (parallel/mesh.blur_pass handles those via sharded convs).
    """
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    assert ts.nty % n_dev == 0, (ts.nty, n_dev)
    band_ty = ts.nty // n_dev
    banded = _banded_of(ts, mesh)
    # Per-band lists (atlas entries in BAND-LOCAL slots).
    all_starts = []
    all_idxs = []
    max_entries = 1
    bands = []
    pos = ts._order_pos(order)
    for d in range(n_dev):
        tiles = [
            ty * ts.ntx + tx
            for ty in range(d * band_ty, (d + 1) * band_ty)
            for tx in range(ts.ntx)
        ]
        starts_np = [0]
        idxs_np = []
        g2l = banded.g2l[d]
        for t in tiles:
            cand = ts.pieces.tile_entries(t, pos)
            cand.sort()
            idxs_np.extend(g2l[e] for _, e in cand)
            starts_np.append(len(idxs_np))
        bands.append((starts_np, idxs_np))
        max_entries = max(max_entries, len(idxs_np))
    for starts_np, idxs_np in bands:
        all_starts.append(np.asarray(starts_np, np.int32))
        padded = np.zeros(max_entries, np.int32)
        padded[: len(idxs_np)] = idxs_np
        all_idxs.append(padded)
    starts = jnp.asarray(np.stack(all_starts))  # (n_dev, T_local+1)
    idxs = jnp.asarray(np.stack(all_idxs))  # (n_dev, max_entries)
    band_h = band_ty * TILE_H

    # Each band composites with the gather-free atlas row kernel (the
    # full-frame fast path — one DMA per listed piece); deep scenes keep
    # the terminating per-piece kernel, mirroring render_full's heuristic.
    deep = max_entries > 8 * band_ty * ts.ntx

    def band_render(starts_l, idxs_l, bg_l, atlas_l):
        atlas = atlas_l[0]
        ntx = ts.ntx
        if not deep:
            return pl.pallas_call(
                functools.partial(_kernel_atlas_row, ntx=ntx),
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=2,
                    grid=(band_ty,),
                    in_specs=[
                        pl.BlockSpec(
                            (TILE_H, ntx * TILE_W),
                            lambda ty, starts, idxs: (ty, 0),
                            memory_space=pltpu.VMEM,
                        ),
                        pl.BlockSpec(memory_space=pl.ANY),
                    ],
                    out_specs=pl.BlockSpec(
                        (TILE_H, ntx * TILE_W),
                        lambda ty, starts, idxs: (ty, 0),
                        memory_space=pltpu.VMEM,
                    ),
                    scratch_shapes=[
                        pltpu.VMEM((_PP_AHEAD, TILE_H, TILE_W), jnp.uint32),
                        pltpu.SemaphoreType.DMA((_PP_AHEAD,)),
                    ],
                ),
                out_shape=jax.ShapeDtypeStruct((band_h, ts.width), jnp.uint32),
                interpret=interpret,
            )(starts_l[0], idxs_l[0], bg_l, atlas)
        grid = (band_ty * ts.ntx,)
        return pl.pallas_call(
            _kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=grid,
                in_specs=[
                    pl.BlockSpec(
                        (TILE_H, TILE_W),
                        lambda t, starts, idxs: (t // ntx, t % ntx),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(memory_space=pl.ANY),
                ],
                out_specs=pl.BlockSpec(
                    (TILE_H, TILE_W),
                    lambda t, starts, idxs: (t // ntx, t % ntx),
                    memory_space=pltpu.VMEM,
                ),
                scratch_shapes=[
                    pltpu.VMEM((N_BUF, TILE_H, TILE_W), jnp.uint32),
                    pltpu.SemaphoreType.DMA((N_BUF,)),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((band_h, ts.width), jnp.uint32),
            interpret=interpret,
        )(starts_l[0], idxs_l[0], bg_l, atlas)

    fn = shard_map(
        band_render,
        mesh=mesh,
        in_specs=(
            P(axis, None),
            P(axis, None),
            P(axis, None),
            P(axis, None, None, None),
        ),
        out_specs=P(axis, None),
        check_vma=False,
    )
    bg = jax.device_put(background, NamedSharding(mesh, P(axis, None)))
    return jax.jit(fn)(starts, idxs, bg, banded.data)


def render_dirty_sharded(
    ts: TiledScene, frame, background, order, dirty_tiles, mesh, interpret: bool = False
):
    """Multi-chip IN-PLACE dirty-tile re-render: the frame shards by tile
    rows over the mesh; each device re-renders its band's dirty tiles with
    the compacted-grid kernel (_kernel_subset).  The atlas is BANDED
    (`BandedAtlas`, ~1/n_dev bytes per device, band-local slot ids); the
    per-band scalar lists are built host-side and stacked.  No cross-device
    communication — dirty tiles are spatially local to their band.

    Bands with no dirty tiles get one PASSTHROUGH slot (span (-1, -1))
    parked on their local tile 0: the kernel copies the tile's current
    frame block back out, leaving the band's pixels untouched — an empty
    (0, 0) span would composite bare background, and re-compositing from
    the atlas would eagerly refresh content the caller never marked dirty
    (breaking pixel-equality with the unsharded path when the scene
    changed under a still-clean tile).  Returns the updated sharded frame
    (donated)."""
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    assert ts.nty % n_dev == 0, (ts.nty, n_dev)
    band_ty = ts.nty // n_dev
    band_h = band_ty * TILE_H

    dirty = sorted(set(dirty_tiles))
    banded = _banded_of(ts, mesh)
    pos = ts._order_pos(order)
    per_tile = {}
    band_tiles = (ts.nty // n_dev) * ts.ntx
    for t in dirty:
        cand = ts.pieces.tile_entries(t, pos)
        cand.sort()
        g2l = banded.g2l[t // band_tiles]
        per_tile[t] = [g2l[e] for _, e in cand]

    by_band: List[List[int]] = [[] for _ in range(n_dev)]
    for t in dirty:
        by_band[t // (band_ty * ts.ntx)].append(t)
    n_slots = 8
    while n_slots < max((len(b) for b in by_band), default=1):
        n_slots *= 2

    all_coords, all_spans, all_idxs = [], [], []
    max_idx = 8
    staged = []
    for d in range(n_dev):
        tiles = by_band[d]
        # FLAT (2 * n_slots,) slot arrays (SMEM row padding; see
        # _kernel_subset).
        coords = np.zeros(2 * n_slots, np.int32)
        spans = np.zeros(2 * n_slots, np.int32)
        idxs_list: List[int] = []
        if tiles:
            for j, t in enumerate(tiles):
                ty_local = t // ts.ntx - d * band_ty
                coords[2 * j] = ty_local
                coords[2 * j + 1] = t % ts.ntx
                lo = len(idxs_list)
                idxs_list.extend(per_tile[t])
                spans[2 * j] = lo
                spans[2 * j + 1] = len(idxs_list)
            k = len(tiles)
            coords[2 * k :: 2] = coords[2 * k - 2]
            coords[2 * k + 1 :: 2] = coords[2 * k - 1]
            spans[2 * k :: 2] = spans[2 * k - 2]
            spans[2 * k + 1 :: 2] = spans[2 * k - 1]
        else:
            spans[:] = -1  # idle band: every slot passes tile (0, 0) through
        staged.append((coords, spans, idxs_list))
        while max_idx < len(idxs_list):
            max_idx *= 2
    for coords, spans, idxs_list in staged:
        idxs = np.zeros(max_idx, np.int32)
        idxs[: len(idxs_list)] = idxs_list
        all_coords.append(coords)
        all_spans.append(spans)
        all_idxs.append(idxs)

    def band_dirty(coords_l, spans_l, idxs_l, bg_l, fr_l, atlas_l):
        atlas = atlas_l[0]
        tile_block = pl.BlockSpec(
            (TILE_H, TILE_W),
            lambda t, coords, spans, idxs: (coords[2 * t], coords[2 * t + 1]),
            memory_space=pltpu.VMEM,
        )
        return pl.pallas_call(
            _kernel_subset,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=(n_slots,),
                in_specs=[
                    tile_block,  # background
                    tile_block,  # frame (aliased with the output)
                    pl.BlockSpec(memory_space=pl.ANY),  # atlas
                ],
                out_specs=pl.BlockSpec(
                    (TILE_H, TILE_W),
                    lambda t, coords, spans, idxs: (coords[2 * t], coords[2 * t + 1]),
                    memory_space=pltpu.VMEM,
                ),
                scratch_shapes=[
                    pltpu.VMEM((N_BUF, TILE_H, TILE_W), jnp.uint32),
                    pltpu.SemaphoreType.DMA((N_BUF,)),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((band_h, ts.width), jnp.uint32),
            input_output_aliases={4: 0},
            interpret=interpret,
        )(coords_l[0], spans_l[0], idxs_l[0], bg_l, fr_l, atlas)

    fn = shard_map(
        band_dirty,
        mesh=mesh,
        in_specs=(
            P(axis, None),
            P(axis, None),
            P(axis, None),
            P(axis, None),
            P(axis, None),
            P(axis, None, None, None),
        ),
        out_specs=P(axis, None),
        check_vma=False,
    )
    sh = NamedSharding(mesh, P(axis, None))
    coords_all = jax.device_put(np.stack(all_coords), sh)
    spans_all = jax.device_put(np.stack(all_spans), sh)
    idxs_all = jax.device_put(np.stack(all_idxs), sh)
    bg = jax.device_put(background, sh)
    fr = jax.device_put(frame, sh)
    return jax.jit(fn, donate_argnums=(4,))(
        coords_all, spans_all, idxs_all, bg, fr, banded.data
    )


def render_scene_xla_reference(ts: TiledScene, background, order):
    """Slow reference: per-object sequential over-composite (host loop),
    same semantics as the tiled kernel, for testing."""
    from .pallas_compositor import unpack_rgba

    H, W = background.shape
    # Front-to-back accumulation per tile — equivalently, composite the
    # whole frame back-to-front under the usual over-fold reversal... the
    # tiled kernel folds top-down per tile; replicate exactly:
    acc = jnp.zeros((H, W), jnp.uint32)
    atlas = ts.atlas()
    for key in order:
        for tile, entry in ts.pieces.get(key, ()):
            ty, tx = tile // ts.ntx, tile % ts.ntx
            r0, c0 = ty * TILE_H, tx * TILE_W
            window = acc[r0 : r0 + TILE_H, c0 : c0 + TILE_W]
            open_mask = (window >> 24) != 255
            blended = _over_packed(window, atlas[entry])
            acc = acc.at[r0 : r0 + TILE_H, c0 : c0 + TILE_W].set(
                jnp.where(open_mask, blended, window)
            )
    return _over_packed(acc, background)
