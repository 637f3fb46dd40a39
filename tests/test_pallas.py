"""Pallas compositor: interpret-mode equality with the XLA scan and with the
general caf-over renderer semantics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import coherence_tpu.colour as C
from coherence_tpu.raster import pallas_compositor as PC

RNG = np.random.default_rng(2)


def random_layers(K, H, W, density=0.6):
    a = RNG.integers(0, 256, (K, H, W, 1))
    rgb = (RNG.integers(0, 256, (K, H, W, 3)) * a) // 255
    layers4 = np.concatenate([rgb, a], -1).astype(np.int32)
    m = RNG.random((K, H, W)) < density
    layers4 = np.where(m[..., None], layers4, 0)
    return layers4


def test_pack_unpack_roundtrip():
    rgba = random_layers(2, 8, 128)
    packed = PC.pack_rgba(jnp.asarray(rgba))
    back = PC.unpack_rgba(packed)
    assert np.array_equal(np.asarray(back), rgba)


def test_pallas_interpret_matches_xla():
    K, H, W = 5, PC.TILE_H * 2, PC.TILE_W * 2
    layers4 = random_layers(K, H, W)
    layers = PC.pack_rgba(jnp.asarray(layers4))
    bg4 = random_layers(1, H, W, density=1.0)[0]
    bg4[..., 3] = 255
    bg = PC.pack_rgba(jnp.asarray(bg4))
    out_x = PC.composite_layers_xla(bg, layers)
    out_p = PC.composite_layers_packed(bg, layers, interpret=True)
    assert np.array_equal(np.asarray(out_p), np.asarray(out_x))


def test_xla_compositor_matches_scalar_over_fold():
    """The packed compositor equals a left fold of the exact scalar `over`."""
    K, H, W = 4, PC.TILE_H, PC.TILE_W
    layers4 = random_layers(K, H, W)
    bg4 = random_layers(1, H, W, density=1.0)[0]
    bg4[..., 3] = 255
    out = np.asarray(
        PC.unpack_rgba(
            PC.composite_layers_xla(
                PC.pack_rgba(jnp.asarray(bg4)), PC.pack_rgba(jnp.asarray(layers4))
            )
        )
    )
    # Scalar reference on a sample of pixels.
    ys = RNG.integers(0, H, 30)
    xs = RNG.integers(0, W, 30)
    for y, x in zip(ys, xs):
        acc = C.colour_of_rgba(0, 0, 0, 0)
        for k in range(K):
            if C.alpha_of_colour(acc) == 255:
                break
            layer = C.colour_of_rgba(*(int(v) for v in layers4[k, y, x]))
            acc = C.over(acc, layer)
        expect = C.over(acc, C.colour_of_rgba(*(int(v) for v in bg4[y, x])))
        assert tuple(out[y, x]) == C.rgba_of_colour(expect), (y, x)


def test_early_exit_semantics_opaque_top():
    """A fully opaque top layer must make lower layers irrelevant."""
    K, H, W = 3, PC.TILE_H, PC.TILE_W
    layers4 = random_layers(K, H, W)
    layers4[0, :, :, 3] = 255  # top opaque
    layers = PC.pack_rgba(jnp.asarray(layers4))
    bg = PC.pack_rgba(jnp.zeros((H, W, 4), jnp.int32))
    out1 = PC.composite_layers_xla(bg, layers)
    # Scramble everything below the top layer: result must not change.
    layers4b = layers4.copy()
    layers4b[1:] = random_layers(K - 1, H, W)
    out2 = PC.composite_layers_xla(bg, PC.pack_rgba(jnp.asarray(layers4b)))
    top = PC.pack_rgba(jnp.asarray(layers4[0]))
    assert np.array_equal(np.asarray(out1), np.asarray(top))
    assert np.array_equal(np.asarray(out2), np.asarray(top))
