"""coherence_tpu — a TPU-native 2D rendering framework with frame-to-frame coherence.

A from-scratch reimplementation of the capabilities of
johnwhitington/coherence-renderer (the renderer of arXiv:2411.00131) designed
for TPUs: dense tile rasters instead of span lists, JAX/XLA/Pallas kernels for
the hot compositing/AA/convolution paths, and `jax.sharding` meshes for
multi-chip scale-out.

Layer map (mirrors reference layers, see SURVEY.md §1):
  colour / coord / id / transform      — foundation (ref: colour.ml, coord.ml, id.ml)
  geometry/                            — paths, bezier, stroking (ref: polygon.ml, shapes.ml)
  raster/                              — masks, scanline rasterizer, AA, fills,
                                         compositing, convolution, brushes, CPG
                                         (ref: sprite.ml, polygon.ml, fill.ml,
                                          convolve.ml, brush.ml)
  scene/                               — renderobjects, HSR render loop, cache,
                                         filters, examples (ref: render.ml,
                                         cache.ml, filters.ml, examples.ml)
  io/                                  — PDF read/write (ref: pdfgraphics.ml)
  gui/                                 — windows, wire protocol, engine app
                                         (ref: wxgui.ml, camlpy.ml, pytalk.ml,
                                          main.py, engine.ml)
  parallel/                            — device-mesh sharded rendering (new; the
                                         reference is single-threaded)
"""

__version__ = "0.1.0"
