"""Incremental global voxel map as a SORTED cell array (sort-merge).

Second device-resident implementation of the mapping product's global-map
accumulation (reference semantics: map_data_save_node.cpp:60-99 host
accumulate loop + global_map_frames_manager.cpp:143-146 pcl::VoxelGrid at
merge time — here the grid is maintained incrementally, cell-exactly, on
device). Same contract as ops/voxel_map (the open-addressing hash form):
running (sum, count) per voxel cell, loud n_dropped/n_oob counters, a
fixed anchor origin.

Why a second implementation: the hash insert's cost centers are exactly
the primitives the TPU dislikes. Measured on v5e (131k-point groups,
2M-slot table, 65k unique width): each claim round's random scatter-min
is 1.9 ms, the random moment scatter-adds 3.6 ms, and every
`jnp.nonzero` compaction lowers to a ~4-11 ms program (10.9 ms at 327k
rows) — the insert spends ~15 ms/group, almost all of it in random
scatters and nonzero. The same budget in SORT-SHAPED work is tiny: a
5-operand 327k-row `lax.sort` is 1.05 ms and an elementwise
shift-compare-add over the same rows 0.54 ms.

So this store keeps the map as a flat array of (cell key, moment) rows
and makes insertion a SORT-MERGE — the classic streaming/LSM shape,
which on TPU means: no random-access table, no probe rounds, no nonzero.
Per insert group:

1. pack cell ids, sort the group's (key, x, y, z) rows by key
   (0.55 ms @131k);
2. segment-reduce the sorted run to one (sum3, count) moment per
   distinct cell: ONE (S,4) scatter-add with `indices_are_sorted=True`
   (1.6 ms — the only scatter left, and it is the sorted kind) plus a
   sorted scatter-min to collect each segment's key;
3. concatenate the store's row array with the group's unique rows and
   `lax.sort` the lot by key (1.26 ms @393k) — one stable merge;
4. combine duplicate neighbours elementwise: both inputs hold at most
   one row per key, so every run has length <= 2 and a single
   shift-compare-add folds the store row into the group row
   (`a + b` — f32 addition is commutative, so this is bit-identical
   to the hash table's `table += group` accumulate);
5. mark absorbed rows EMPTY and slice the first `capacity +
   unique_capacity` rows. No compaction pass at all: absorbed rows
   carry key EMPTY = int32 max, so the NEXT insert's sort pushes them
   to the tail — the slice only ever cuts EMPTY rows while the live
   cell count stays within `capacity` (and cut live rows are COUNTED
   in n_dropped, the usual loud-overflow rule).

State width is therefore `capacity + unique_capacity` rows with the
invariant "live rows unique by key; dead rows EMPTY; EMPTY tail at
least `unique_capacity` long after every insert". Extraction sorts
once (O(V log V) at finalize, not per frame).

Cell-exactness: the per-cell (sum, count) moments are identical to the
hash store's and to the host merge's (ops/cloud.voxel_downsample_numpy
anchored at the same origin) — all three add the same group moments in
the same per-group order. test_voxel_map_sorted.py asserts both
equalities.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from slam_sensor_fusion_tpu.ops.voxel_map import (
    _EMPTY,
    _pack_ids,
    VoxelMapConfig,
)

Array = jax.Array


class SortedVoxelMapConfig(NamedTuple):
    """Static geometry/capacity of the sorted-array voxel store."""

    voxel_size: float = 0.1
    #: max LIVE cells the store holds; the (capacity+unique_capacity)-row
    #: array never cuts a live row while the cell count stays under this
    capacity: int = 1 << 18
    #: max distinct cells one insert group may touch (the group dedup
    #: width); cells past it are counted in n_dropped, same rule as the
    #: hash store's unique_capacity
    unique_capacity: int = 1 << 16
    #: grid extents in CELLS; dim_xy^2 * dim_z must stay under int32
    #: (the top id is the EMPTY sentinel)
    dim_xy: int = 2048
    dim_z: int = 256

    def validate(self) -> "SortedVoxelMapConfig":
        if self.dim_xy * self.dim_xy * self.dim_z >= 2**31:
            raise ValueError(
                "voxel grid id space exceeds int32 (the top id is the "
                f"empty sentinel): {self.dim_xy}^2 * {self.dim_z} >= 2^31"
            )
        return self

    def as_hash_geometry(self) -> VoxelMapConfig:
        """The equivalent hash-store geometry (for _pack_ids reuse)."""
        return VoxelMapConfig(
            voxel_size=self.voxel_size,
            dim_xy=self.dim_xy,
            dim_z=self.dim_z,
        )


class SortedVoxelMapState(NamedTuple):
    """The scan-carry: a flat (key, moment) row array.

    Row layout: `keys` nondecreasing after every insert EXCEPT rows
    absorbed by that insert's combine step, which sit at their old
    position with key EMPTY until the next sort sweeps them tailward.
    `moments` columns are (sum_x, sum_y, sum_z, count).
    """

    keys: Array  # (M,) i32, M = capacity + unique_capacity
    moments: Array  # (M, 4) f32
    origin: Array  # (3,) f32 grid anchor (min corner)
    n_dropped: Array  # () i32 capacity overflows (must stay 0)
    n_oob: Array  # () i32 out-of-extent points (must stay 0)

    def n_cells(self) -> Array:
        return jnp.sum((self.keys != _EMPTY).astype(jnp.int32))


def sorted_voxel_map_init(
    config: SortedVoxelMapConfig, origin: Array
) -> SortedVoxelMapState:
    """Empty store anchored at `origin` (fixed for the map's lifetime,
    same exact-incremental-centroid argument as voxel_map_init)."""
    config.validate()
    M = config.capacity + config.unique_capacity
    return SortedVoxelMapState(
        keys=jnp.full((M,), _EMPTY, jnp.int32),
        moments=jnp.zeros((M, 4), jnp.float32),
        origin=jnp.asarray(origin, jnp.float32),
        n_dropped=jnp.int32(0),
        n_oob=jnp.int32(0),
    )


@functools.partial(jax.jit, static_argnames=("config",))
def sorted_voxel_map_insert(
    state: SortedVoxelMapState,
    points: Array,  # (S, 3) f32 MAP/world-frame points
    mask: Array,  # (S,) bool
    config: SortedVoxelMapConfig,
) -> SortedVoxelMapState:
    """Absorb one scan (or frame group) by sort-merge. Pure carry update
    (scan-compatible); unplaceable points are counted, never silently
    dropped into a wrong cell."""
    S = points.shape[0]
    U = min(config.unique_capacity, S)
    M = state.keys.shape[0]

    key, active, n_oob = _pack_ids(
        points, mask, state.origin, config.as_hash_geometry()
    )
    key = jnp.where(active, key, _EMPTY)

    # ---- group dedup: sort by cell id, segment-reduce to per-cell
    # moments. The ONLY scatters in the whole insert, both with sorted
    # indices (masked rows alias U-1 with zero payload).
    k_s, px, py, pz = jax.lax.sort(
        (key, points[:, 0], points[:, 1], points[:, 2]), num_keys=1
    )
    valid = k_s != _EMPTY
    first = jnp.concatenate([valid[:1], valid[1:] & (k_s[1:] != k_s[:-1])])
    seg = jnp.cumsum(first.astype(jnp.int32)) - 1
    over = valid & (seg >= U)  # group touched more cells than U
    use = valid & ~over
    seg_c = jnp.clip(seg, 0, U - 1)
    payload = jnp.stack(
        [px, py, pz, jnp.ones_like(px)], axis=1
    ) * use[:, None].astype(jnp.float32)
    g_mom = jnp.zeros((U, 4), jnp.float32).at[seg_c].add(
        payload, indices_are_sorted=True
    )
    g_key = jnp.full((U,), _EMPTY, jnp.int32).at[seg_c].min(
        jnp.where(use, k_s, _EMPTY), indices_are_sorted=True
    )
    n_dropped = jnp.sum(over.astype(jnp.int32))

    # ---- merge: one stable sort of store rows + group rows. Equal keys
    # keep concat order (store row immediately before its group row);
    # EMPTY rows (store tail + absorbed-last-round + masked) go tailward.
    zk, m0, m1, m2, m3 = jax.lax.sort(
        (
            jnp.concatenate([state.keys, g_key]),
            jnp.concatenate([state.moments[:, 0], g_mom[:, 0]]),
            jnp.concatenate([state.moments[:, 1], g_mom[:, 1]]),
            jnp.concatenate([state.moments[:, 2], g_mom[:, 2]]),
            jnp.concatenate([state.moments[:, 3], g_mom[:, 3]]),
        ),
        num_keys=1,
    )
    zm = jnp.stack([m0, m1, m2, m3], axis=1)

    # ---- combine runs (length <= 2: both inputs are unique-by-key):
    # fold row i-1 into row i where keys match, then kill row i-1.
    dup = jnp.concatenate(
        [jnp.zeros((1,), bool), (zk[1:] == zk[:-1]) & (zk[1:] != _EMPTY)]
    )
    prev = jnp.concatenate([jnp.zeros((1, 4), jnp.float32), zm[:-1]], axis=0)
    zm = zm + jnp.where(dup[:, None], prev, 0.0)
    killed = jnp.concatenate([dup[1:], jnp.zeros((1,), bool)])
    zk = jnp.where(killed, _EMPTY, zk)
    zm = jnp.where(killed[:, None], 0.0, zm)

    # ---- slice back to M rows. The cut tail rows are EMPTY whenever the
    # live cell count fits `capacity` (live <= cap, absorbed-this-round
    # <= U, so non-EMPTY rows <= cap + U = M); if the map outgrew its
    # capacity the cut rows hold the LARGEST keys — count their points.
    cut = zk[M:]
    cut_pts = jnp.sum(jnp.where(cut != _EMPTY, zm[M:, 3], 0.0))
    n_dropped = n_dropped + cut_pts.astype(jnp.int32)

    return SortedVoxelMapState(
        keys=zk[:M],
        moments=zm[:M],
        origin=state.origin,
        n_dropped=state.n_dropped + n_dropped,
        n_oob=state.n_oob + n_oob,
    )


@functools.partial(jax.jit, static_argnames=("config",))
def sorted_voxel_map_insert_chunk(
    state: SortedVoxelMapState,
    points: Array,  # (T, S, 3)
    mask: Array,  # (T, S)
    config: SortedVoxelMapConfig,
) -> SortedVoxelMapState:
    """lax.scan of sorted_voxel_map_insert over a chunk of frames."""

    def body(carry, frame):
        p, m = frame
        return sorted_voxel_map_insert(carry, p, m, config), None

    out, _ = jax.lax.scan(body, state, (points, mask))
    return out


def sorted_voxel_map_centroids_numpy(
    state: SortedVoxelMapState,
) -> np.ndarray:
    """Host extraction of all centroids in packed-id order — the same
    cloud (same order) voxel_map_centroids_numpy yields from the hash
    store, and the host merge yields sorted."""
    keys = np.asarray(state.keys)
    occ = keys != np.int32(np.iinfo(np.int32).max)
    order = np.argsort(keys[occ], kind="stable")
    mom = np.asarray(state.moments)[occ][order]
    return (mom[:, :3] / mom[:, 3:4]).astype(np.float32)
