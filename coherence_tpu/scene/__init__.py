"""Scene model, hidden-surface-removal renderer, coherence cache, filters.

Parity targets: render.ml, cache.ml, filters.ml, examples.ml.
"""
