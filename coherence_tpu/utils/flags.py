"""Config/flag registry (parity: SURVEY.md §5.6 — the reference scatters
compile-time booleans and mutable refs; here one place, overridable from the
environment as ``COHERENCE_<NAME>``)."""

from __future__ import annotations

import os
from typing import Any, Dict

_REGISTRY: Dict[str, Any] = {}


def define(name: str, default, doc: str = ""):
    env = os.environ.get(f"COHERENCE_{name.upper()}")
    if env is not None:
        if isinstance(default, bool):
            val = env.lower() in ("1", "true", "yes", "on")
        elif isinstance(default, int):
            val = int(env)
        elif isinstance(default, float):
            val = float(env)
        else:
            val = env
    else:
        val = default
    _REGISTRY[name] = val
    return val


def get(name: str):
    return _REGISTRY[name]


def set_flag(name: str, value):
    _REGISTRY[name] = value


def all_flags() -> Dict[str, Any]:
    return dict(_REGISTRY)


# The reference's knobs (engine.ml:8-12, sprite.ml:16, cache.ml:10,73,
# render.ml:6-8, polygon.ml:19-26, coord.ml:23), surfaced in one place:
debug = define("debug", False, "open the redraw debug window")
frag_debug = define("frag_debug", False, "open the sprite-fragment debug window")
cache_debug = define("cache_debug", False, "open the cache statistics window")
debug_spritecheck = define(
    "debug_spritecheck", False, "verify raster invariants on every major op"
)
cachemaxsize = define("cachemaxsize", 100 * 1024 * 1024, "coherence cache bytes")
pdf_debug = define("pdf_debug", False, "accumulate renderer debug PDFs")
pdf_filter_debug = define("pdf_filter_debug", False, "accumulate filter debug PDFs")
batch_group_raster = define(
    "batch_group_raster",
    True,
    "pre-rasterize group members with one fused dispatch per bucket group "
    "(trades group-internal early termination for dispatch count)",
)
