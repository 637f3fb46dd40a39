"""Multi-chip scale-out: device-mesh sharded tile rendering.

The reference is single-threaded (SURVEY.md §2: no parallelism); scaling is
ours to design.  The natural decomposition is **spatial**: the frame's tile
grid shards across devices along rows (`jax.sharding.Mesh` + NamedSharding);
compositing is pointwise (no communication), convolution/blur needs halo
pixels at shard borders, which XLA inserts automatically as collectives when
the convs are jitted with sharding constraints.
"""

from .mesh import (  # noqa: F401
    make_mesh,
    sharded_blur,
    sharded_composite_step,
    sharded_render_step,
)
