"""Compute-placement policy: where the general (scalar) renderer runs.

The scalar renderer's per-event work — the reference's interactive paint
path (engine.ml:208-252: render the dirty window, plot, refresh) — is many
*small* jitted region ops over dirty windows.  That workload is
dispatch-latency bound, not FLOP bound: a drag event touches a few hundred
kilobytes of raster and a few dozen device programs.  On a host-attached
TPU a dispatch is ~100 us and the accelerator wins outright; over a
network-tunneled device (the axon transport) every dispatch and every
readback is a ~0.4-70 ms round trip, so an interactive engine session pays
seconds per event for microseconds of math.

The TPU-native answer is placement, not translation: pin the engine's
DEFAULT placement to the in-process CPU backend when (and only when) the
default backend is remote.  Every uncommitted array creation and every jit
dispatch in the scalar path then executes locally — the exact same programs
the CPU test suite proves bit-identical to the TPU path (the AA coverage
GEMM switches its weight dtype per execution platform; see
``raster/aa.py``).  The fused serving paths (``scene/fastframe``,
``raster/tiled_scene``) place their arrays explicitly and keep the
accelerator: throughput work stays where the FLOPs are, latency work stays
where the events are.

Scoping is thread-local (``jax.default_device`` is a thread-local config
context), so one process can serve an engine session on the host and a
fused fast session on the TPU at once (``benchmarks/session.py all``).
"""

from __future__ import annotations

import contextlib
from typing import Optional

from . import flags

engine_host_compute_flag = flags.define(
    "engine_host_compute",
    True,
    "run the general renderer's device programs on the in-process CPU "
    "backend when the default backend is a remote/tunneled accelerator "
    "(interactive latency is dispatch-bound; the fused serving paths keep "
    "the accelerator)",
)


def host_cpu_device():
    """The in-process CPU device, or None if the CPU backend is unavailable."""
    import jax

    try:
        return jax.devices("cpu")[0]
    except Exception:  # noqa: BLE001 — platform registries vary by build
        return None


def compute_platform() -> str:
    """Platform jit dispatch targets for uncommitted operands RIGHT NOW:
    the thread-local default device if one is set, else the default backend."""
    import jax

    dd = jax.config.jax_default_device
    if dd is not None:
        return dd.platform
    return jax.default_backend()


def tunneled() -> bool:
    """True when the default backend is an accelerator (any non-CPU default
    counts: placement only matters when dispatch leaves the process)."""
    import jax

    return jax.default_backend() != "cpu"


@contextlib.contextmanager
def engine_host_compute(enabled: Optional[bool] = None, device=None):
    """Context manager scoping the engine's scalar compute to the host CPU
    backend.  Yields True when host placement is active, False when the
    policy is a no-op (already on CPU, disabled by flag, or no CPU backend).

    ``enabled=None`` (the default) applies policy: on iff the
    ``engine_host_compute`` flag is set and the default backend is remote.
    ``device`` overrides the target (tests pin a NON-default virtual CPU
    device to prove the scalar path is placement-neutral end-to-end).
    """
    if enabled is None:
        enabled = bool(flags.get("engine_host_compute")) and tunneled()
    cpu = device if device is not None else (host_cpu_device() if enabled else None)
    if cpu is None:
        yield False
        return
    import jax

    with jax.default_device(cpu):
        yield True
