"""Device-mesh sharding for batched multi-stream decode.

Streams are independent, so the only sharded axis is `stream`; every tensor
in the reconstruction program carries it as the leading dimension.  With
NamedSharding over a 1-D mesh, XLA compiles one SPMD program per chip with
zero inter-chip communication — scaling is linear over ICI and DCN alike.
"""

from __future__ import annotations

import functools


def make_stream_mesh(devices=None):
    """A 1-D mesh over all (or the given) devices, axis name 'stream'."""
    import jax
    from jax.sharding import Mesh

    if devices is None:
        devices = jax.devices()
    import numpy as np

    return Mesh(np.asarray(devices), ("stream",))


def shard_reconstruct_fn(mesh, h: int, w: int, packed=False):
    """A jitted, stream-sharded batched reconstruction program.

    All inputs/outputs are sharded on their leading stream axis; the batch
    size must be divisible by the mesh size.  packed=True/"u32" shards the
    combined-u32 packed transport program, packed="split" the large-picture
    split transport (int32 positions + int16 values), False the dense one.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..decoder.reconstruct import (
        reconstruct_frame_batched,
        reconstruct_frame_packed_split,
        reconstruct_frame_packed_u32,
    )

    stream_sharding = NamedSharding(mesh, P("stream"))
    if packed == "split":
        fn, n_in = reconstruct_frame_packed_split, 7
    elif packed:
        fn, n_in = reconstruct_frame_packed_u32, 6
    else:
        fn, n_in = reconstruct_frame_batched, 11
    return jax.jit(
        fn,
        in_shardings=(stream_sharding,) * n_in,
        out_shardings=(stream_sharding,) * 3,
    )
