"""Mesh-sharded incremental global voxel map (`sp` axis for the MAPPING
product).

ops/voxel_map.py caps the global map at one chip's HBM (one hash table's
worth of cells). This module shards the CELL SPACE over the mesh instead:
each device owns the cells whose ownership hash lands on it and keeps a
full private `VoxelMapState` for them, so the aggregate capacity is
`n_shards * table_size` cells and a survey-scale map can exceed any
single chip's memory. Inserts broadcast the (deskewed, world-frame) scan
group to every device — a scan is small; the MAP is what grows without
bound — and each device runs the production dedup-first insert
(ops/voxel_map.voxel_map_insert) on the subset of points it owns. No
collective is needed per insert at all: ownership is a pure function of
the cell id, so the shards stay disjoint by construction and the union
of their cells IS the single-device map, cell-exact (every point lands
on exactly one shard, in exactly the cell the single-table insert would
pick).

This is the mapping-product counterpart of parallel/map_shard.py's
sharded registration (which reads a sharded map; this WRITES one).
Reference scope note: the reference accumulates its global map in one
process's RAM (map_data_save_node.cpp:60-99, merge at
global_map_frames_manager.cpp:110-151) — sharding it is the TPU-native
extension for maps past one chip's memory, not a parity item.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from slam_sensor_fusion_tpu.ops.voxel_map import (
    VoxelMapConfig,
    VoxelMapState,
    voxel_map_centroids_numpy,
    voxel_map_init,
    voxel_map_insert,
)

Array = jax.Array


_OWNER_MULT = np.uint32(0x9E3779B1)  # distinct odd mix from _HASH_MULT


def _owner(key: Array, n_shards: int) -> Array:
    """Shard owning a packed cell id (pure function of the id).

    Mixes with a constant DIFFERENT from ops/voxel_map._HASH_MULT so the
    ownership choice stays decorrelated from _probe_slot's slot choice —
    sharing the mix would partially correlate shard and slot bits and
    skew per-shard table occupancy (n_dropped remains the backstop).
    """
    return (
        ((key.astype(jnp.uint32) * _OWNER_MULT) >> jnp.uint32(20))
        % jnp.uint32(n_shards)
    ).astype(jnp.int32)


def sp_voxel_map_init(
    config: VoxelMapConfig, origin: Array, mesh: Mesh
) -> VoxelMapState:
    """A VoxelMapState whose table leaves carry a leading `sp`-sharded
    shard axis: shard s's slice is a complete private store for the cells
    it owns. `config.table_size` is PER SHARD — total capacity is
    n_shards * table_size cells."""
    axis = mesh.axis_names[0]
    n = int(np.prod(mesh.devices.shape))
    single = voxel_map_init(config, jnp.asarray(origin, jnp.float32))

    def rep(x):
        return jnp.broadcast_to(x[None], (n,) + x.shape)

    state = VoxelMapState(
        keys=rep(single.keys),
        sums=rep(single.sums),
        counts=rep(single.counts),
        origin=rep(single.origin),
        n_dropped=rep(single.n_dropped),
        n_oob=rep(single.n_oob),
    )
    sharding = jax.sharding.NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), state
    )


@functools.partial(jax.jit, static_argnames=("config", "mesh"))
def sp_voxel_map_insert_chunk(
    state: VoxelMapState,  # leading shard axis, sp-sharded
    points: Array,  # (T, S, 3) world-frame insert groups, replicated
    mask: Array,  # (T, S)
    config: VoxelMapConfig,
    mesh: Mesh,
) -> VoxelMapState:
    """Absorb T insert groups into the sharded store (lax.scan inside
    shard_map). Each device masks every group down to the cells it owns —
    by the ownership hash of the points' PACKED CELL IDS, so a cell's
    points always converge on one shard — and runs the production
    single-device insert on its private table. Collective-free: shards
    are disjoint by construction."""
    axis = mesh.axis_names[0]
    n = int(np.prod(mesh.devices.shape))

    # ownership is decided on packed ids; reuse the production packer so
    # binning is bit-identical to the single-table path
    from slam_sensor_fusion_tpu.ops.voxel_map import _pack_ids

    def body(st, pts, msk):
        st = jax.tree_util.tree_map(lambda x: x[0], st)  # local block
        me = jax.lax.axis_index(axis).astype(jnp.int32)

        def step(carry, frame):
            p, m = frame
            key, _, _ = _pack_ids(p, m, carry.origin, config)
            mine = m & (_owner(key, n) == me)
            # n_oob stays exact: an out-of-extent point's clipped id still
            # maps it to exactly one shard, so exactly one shard counts it
            return voxel_map_insert(carry, p, mine, config), None

        st, _ = jax.lax.scan(step, st, (pts, msk))
        return jax.tree_util.tree_map(lambda x: x[None], st)

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis), P(), P()),
        out_specs=P(axis),
        check_vma=False,
    )(state, points, mask)


def sp_voxel_map_centroids_numpy(state: VoxelMapState) -> np.ndarray:
    """Host extraction: concatenate every shard's centroids (disjoint
    cell sets) — the same cloud the single-device store yields, up to
    row order."""
    shards = jax.device_get(state)
    n = shards.keys.shape[0]
    outs = [
        voxel_map_centroids_numpy(
            VoxelMapState(*(np.asarray(leaf[s]) for leaf in shards))
        )
        for s in range(n)
    ]
    return np.concatenate([o for o in outs if len(o)] or [np.zeros((0, 3))])


def sp_voxel_map_flags(state: VoxelMapState) -> tuple[int, int, np.ndarray]:
    """(total dropped, total oob, per-shard live-cell counts) — the same
    must-stay-zero observability as the single-device store, summed over
    shards."""
    from slam_sensor_fusion_tpu.ops.voxel_map import _EMPTY

    keys = np.asarray(state.keys)
    return (
        int(np.asarray(state.n_dropped).sum()),
        int(np.asarray(state.n_oob).sum()),
        (keys != _EMPTY).sum(axis=1),
    )
