import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
import numpy as np
import jax.numpy as jnp
from jax import lax
import coherence_tpu.colour as C
import coherence_tpu.ident as ident
from coherence_tpu.geometry import shapes as gshapes
from coherence_tpu.raster import fills as rfills
from coherence_tpu.scene import render as R
from coherence_tpu.scene.fastframe import DeviceView
from coherence_tpu.raster import tiled_scene as TS

W, H = 3840, 2160
rng = np.random.default_rng(0)
objs = []
for k in range(1000):
    cx = float(rng.integers(60, W - 60)); cy = float(rng.integers(60, H - 60))
    alpha = 255 if k % 3 else 150
    col = C.dissolve(C.colour_of_rgba(*(int(v) for v in rng.integers(0, 256, 3)), 255), delta=alpha)
    if k % 2 == 0:
        geom = R.PathShape(gshapes.circle(cx, cy, float(rng.integers(6, 30))))
    else:
        geom = R.rectangle(cx, cy, float(rng.integers(8, 56)), float(rng.integers(8, 56)))
    objs.append(R.Obj(ident.new_ids(), R.Basic(rfills.plain(col), geom), (), R.OVER))

view = DeviceView(W, H)
view.set_scene(objs, tiled=True)
ts = view.ts
starts, idxs = ts.build_lists(list(view.order))
bg = view.background
atlas = ts.atlas()
nty, ntx = ts.nty, ts.ntx
N = 100

a = ts.render(bg, starts, idxs)
b = ts.render_runs(bg, starts, idxs)
assert (np.asarray(a) == np.asarray(b)).all()
print("## equality OK on TPU", flush=True)

import functools

@jax.jit
def loop_perpiece(bg, starts, idxs, atlas):
    def body(i, x):
        return TS._render_tiles(starts, idxs, x, atlas, nty=nty, ntx=ntx)
    return lax.fori_loop(0, N, body, bg)

@jax.jit
def loop_runs(bg, starts, runs):
    def body(i, x):
        return TS._render_tiles_runs(starts, x, runs, nty=nty, ntx=ntx)
    return lax.fori_loop(0, N, body, bg)

runs = TS._gather_runs_kernel(atlas, jnp.asarray(idxs))

def force(x):
    return int(jnp.sum(x[::128, ::128] & 0xFF))

for name, call in (("per-piece", lambda: loop_perpiece(bg, starts, jnp.asarray(idxs), atlas)),
                   ("runs", lambda: loop_runs(bg, starts, runs))):
    x = call(); force(x)  # compile+load
    meds = []
    for rep in range(3):
        t0 = time.time()
        force(call())
        meds.append(time.time() - t0)
    meds.sort()
    dt = meds[1]
    print(f"## {name}: {N/dt:.0f} fps  {W*H*N/dt/1e9:.1f} Gpix/s  per-frame {dt/N*1e3:.3f} ms (runs3: {[f'{v:.3f}' for v in meds]})", flush=True)
