"""Multi-chip parallelism: shard the camera/view axis over a device mesh.

The reference is strictly single-GPU (SURVEY §2.5); its only per-step
parallelism surface is the fan-out over cameras (4 SDS views + GT passes).
The TPU-native scaling story follows directly: surfel/field state replicates,
the per-step view batch shards across ICI-connected chips on a 1-D
``jax.sharding.Mesh`` axis, and XLA's GSPMD partitioner inserts the gradient
all-reduce (psum over the view axis) — no hand-written collectives needed at
this scale.

Usage: build the mesh, pass ``view_sharder(mesh)`` into
``make_train_step(..., shard_views=...)``, jit inside ``jax.set_mesh`` /
with replicated params.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

VIEW_AXIS = "view"


def make_view_mesh(devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    import numpy as np

    return Mesh(np.array(devices), (VIEW_AXIS,))


def view_sharder(mesh: Mesh) -> Callable:
    """Returns f(pytree) that constrains the leading (view) axis of every
    leaf to be sharded over the mesh's view axis."""
    sharding = NamedSharding(mesh, P(VIEW_AXIS))

    def shard(tree):
        return jax.tree_util.tree_map(
            lambda x: jax.lax.with_sharding_constraint(x, sharding), tree
        )

    return shard


def replicate(mesh: Mesh, tree):
    """Place a pytree fully replicated on the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def row_sharder(mesh: Mesh) -> Callable:
    """Returns f(render_dict) that constrains every image-space leaf
    ([H, W, ...]) to be row-sharded over the mesh axis — the GT-pass
    parallelism of SURVEY §2.5 ("4 SDS views + 3 GT passes").

    The GT rgb and normal-F/B renders have a batch size of ONE camera, so
    the view axis cannot split them; instead the OUTPUT image rows carry
    the sharding and GSPMD propagates it backwards through the untile
    reshape into the whole per-tile pipeline — the [NT, pixels, K]
    composite, its gathers, and the cumprod all partition over the tile-row
    axis (verified in HLO: the dominant composite tensors shard NT/D per
    device), while the surfel preprocess + sort stay replicated (they are
    ~MBs vs ~GBs).  The backward all-reduces the surfel gradients exactly
    like the view-sharded gen pass.  1-D leaves (overflow counters,
    scalars) pass through unconstrained."""
    sharding = NamedSharding(mesh, P(VIEW_AXIS))

    def shard(tree):
        return jax.tree_util.tree_map(
            lambda x: jax.lax.with_sharding_constraint(x, sharding)
            if getattr(x, "ndim", 0) >= 2
            else x,
            tree,
        )

    return shard
