"""Incremental on-device global voxel map (hash-scatter accumulator).

TPU-native equivalent of the mapping product's global-map accumulation:
the reference accumulates registered scans on the host and voxel-grids
them once at merge time (map_data_save_node.cpp:60-99 accumulate loop,
global_map_frames_manager.cpp:143-146 pcl::VoxelGrid). Here the map is a
DEVICE-RESIDENT open-addressing hash table over voxel cells that absorbs
one scan per step under `lax.scan` — BASELINE config 5's "voxel
downsampling" literally in the device inner loop — and yields, at any
point, exactly the centroid-per-voxel cloud the host merge would:
running (sum, count) per cell is an exact incremental centroid.

Why a hash table and not the sort+segment form (ops/cloud.voxel_downsample)?
The sort form is right for one-shot downsampling, but an incremental
update would re-sort the WHOLE store every frame (O((V+S) log(V+S)) on
V ~ 10^6 cells). Here only the SCAN is sorted (S log S on S ~ 10^5,
measured 0.7 ms for 131k points on v5e) and segment-reduced to one
(sum, count) row per touched CELL; every table-width gather/scatter then
runs at the unique-cell width U << S. On v5e the scatter-adds are the
insert's cost center and scale super-linearly with width (131k -> 32k
indices = 6x cheaper), so dedup-first is a measured 3.4x over probing at
scan width (27.8 -> 8.2 ms per 131k-point group; the earlier dead end —
unique-index scatters still at FULL scan width — was slower than
duplicate scatters because the argsort bought no width reduction).
After dedup: two claim rounds at width U place ~all cells (per-round
miss rate ~ table occupancy), the few collision losers are COMPACTED and
finish the deep probe budget on a small array, and each phase lands ONE
scatter-add of the per-cell moments. No host round-trip, O(S log S) per
frame with tiny constants.

Collision policy (deterministic, masked, observability-first):

* a cell's packed id claims a slot via `scatter-min` against an EMPTY
  sentinel (int32 max). Occupied slots can never be displaced: losers
  contribute min-candidates of EMPTY, a no-op. Contenders that lose a
  claim re-probe (double hashing) up to `max_probes` times;
* points still unplaced after the probe budget are counted in
  `n_dropped`, points outside the grid extents in `n_oob` — both must
  stay 0 in healthy runs (the same silent-truncation-is-forbidden rule
  as the pair-list overflow flags).

Grid ids pack (x, y, z) cells into one int32, so the extents must satisfy
dim_xy^2 * dim_z <= 2^31 (defaults 2048 x 2048 x 256 cells = a
205 x 205 x 26 m survey at 0.1 m voxels; size to the site, or shard the
map — parallel/map_shard — past one table's reach).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from slam_sensor_fusion_tpu.ops.cloud import Cloud

Array = jax.Array

_EMPTY = np.int32(np.iinfo(np.int32).max)
# Knuth multiplicative hash constant (2^32 / phi), uint32 wrap-around
_HASH_MULT = np.uint32(2654435761)


class VoxelMapConfig(NamedTuple):
    """Static geometry/capacity of the device voxel store."""

    voxel_size: float = 0.1
    #: hash-table slots; keep occupancy (live cells / slots) under ~0.5
    #: or probe failures (n_dropped) start firing
    table_size: int = 1 << 21
    #: total probe rounds. Per-point placement failure is ~occupancy^probes,
    #: so over millions of inserts the budget must stay deep (8 at 0.25
    #: occupancy ~ 1.5e-5 per point); n_dropped observably catches any
    #: residue
    max_probes: int = 8
    #: probe rounds at FULL scan width before compacting the stragglers
    #: (see voxel_map_insert: rounds are the dominant insert cost, and
    #: after 2 rounds only ~occupancy^2 of the scan is still unplaced)
    full_width_probes: int = 2
    #: capacity of the compacted straggler pass; cells past it (never at
    #: sane occupancy) are counted dropped, not silently lost
    straggler_capacity: int = 1024
    #: grid extents in CELLS; dim_xy^2 * dim_z must fit int31
    dim_xy: int = 2048
    dim_z: int = 256
    #: width of the per-insert unique-cell stage (the dedup scratch and
    #: every claim/add). 0 = scan width (always complete). Real scans
    #: touch FAR fewer cells than they have points (a 131k-point group
    #: lands in ~29k cells at 0.2 m), and scatter cost scales
    #: super-linearly with width, so size this to ~1.5x the measured
    #: per-insert unique-cell count; points in cells past it are counted
    #: in n_dropped (same silent-truncation-is-forbidden rule)
    unique_capacity: int = 0

    def validate(self) -> "VoxelMapConfig":
        # >=: id 2^31-1 (int32 max) is the _EMPTY sentinel — a point in
        # the far-corner cell would silently read as masked otherwise
        if self.dim_xy * self.dim_xy * self.dim_z >= 2**31:
            raise ValueError(
                "voxel grid id space exceeds int32 (the top id is the "
                f"empty sentinel): {self.dim_xy}^2 * {self.dim_z} >= 2^31"
            )
        return self


class VoxelMapState(NamedTuple):
    """The scan-carry: one open-addressing table of voxel cells."""

    keys: Array  # (H,) int32 packed cell id, _EMPTY where free
    sums: Array  # (H, 3) f32 running point sums
    counts: Array  # (H,) f32 running point counts
    origin: Array  # (3,) f32 grid anchor (min corner)
    n_dropped: Array  # () i32 probe-budget failures (must stay 0)
    n_oob: Array  # () i32 out-of-extent points (must stay 0)

    def n_cells(self) -> Array:
        return jnp.sum((self.keys != _EMPTY).astype(jnp.int32))


def voxel_map_init(config: VoxelMapConfig, origin: Array) -> VoxelMapState:
    """Empty store anchored at `origin` (the grid's min corner).

    The anchor is FIXED for the map's lifetime — the incremental centroid
    is only exact when every insert bins against the same grid, so pick
    the survey site's min corner (with margin) up front. The host merge
    (ops/cloud.voxel_downsample_numpy) anchors at the global min the same
    way, which is what the equality tests rely on.
    """
    config.validate()
    H = config.table_size
    return VoxelMapState(
        keys=jnp.full((H,), _EMPTY, jnp.int32),
        sums=jnp.zeros((H, 3), jnp.float32),
        counts=jnp.zeros((H,), jnp.float32),
        origin=jnp.asarray(origin, jnp.float32),
        n_dropped=jnp.int32(0),
        n_oob=jnp.int32(0),
    )


def _pack_ids(
    points: Array, mask: Array, origin: Array, config: VoxelMapConfig
) -> tuple[Array, Array, Array]:
    """(packed ids, in-bounds mask, oob count) for one scan."""
    ijk = jnp.floor((points - origin[None, :]) / config.voxel_size).astype(
        jnp.int32
    )
    dims = jnp.asarray(
        [config.dim_xy, config.dim_xy, config.dim_z], jnp.int32
    )
    inb = jnp.all((ijk >= 0) & (ijk < dims[None, :]), axis=-1)
    n_oob = jnp.sum((mask & ~inb).astype(jnp.int32))
    ok = mask & inb
    ijk = jnp.clip(ijk, 0, dims[None, :] - 1)  # keep packed ids in range
    key = (ijk[:, 0] * config.dim_xy + ijk[:, 1]) * config.dim_z + ijk[:, 2]
    return key, ok, n_oob


def _probe_slot(key: Array, probe: int, table_size: int) -> Array:
    """Double-hashed slot index for probe round `probe` (uint32 wrap)."""
    k = key.astype(jnp.uint32)
    h1 = (k * _HASH_MULT) >> jnp.uint32(8)
    h2 = (k ^ (k >> jnp.uint32(13))) | jnp.uint32(1)  # odd stride
    return ((h1 + jnp.uint32(probe) * h2) % jnp.uint32(table_size)).astype(
        jnp.int32
    )


@functools.partial(jax.jit, static_argnames=("config",))
def voxel_map_insert(
    state: VoxelMapState,
    points: Array,  # (S, 3) f32 MAP/world-frame points
    mask: Array,  # (S,) bool
    config: VoxelMapConfig,
) -> VoxelMapState:
    """Absorb one scan: each point joins its voxel cell's running mean.

    Pure carry-update (scan-compatible). Unplaceable points are COUNTED,
    never silently dropped into a wrong cell.
    """
    S = points.shape[0]
    key, active, n_oob = _pack_ids(points, mask, state.origin, config)
    key = jnp.where(active, key, _EMPTY)
    U = config.unique_capacity or S
    U = min(U, S)

    # ---- dedup: sort the scan by cell id (masked points sort last as
    # _EMPTY = int32 max), segment-reduce to one (sum, count) per cell.
    # All subsequent table traffic runs at unique-cell width U, where the
    # scatter cost lives (see module docstring for the v5e measurements).
    k_s, px, py, pz = jax.lax.sort(
        (key, points[:, 0], points[:, 1], points[:, 2]), num_keys=1
    )
    p_s = jnp.stack([px, py, pz], axis=1)
    valid = k_s != _EMPTY
    first = jnp.concatenate([valid[:1], valid[1:] & (k_s[1:] != k_s[:-1])])
    seg = jnp.cumsum(first.astype(jnp.int32)) - 1
    over = valid & (seg >= U)  # unique-capacity overflow: counted below
    use = valid & ~over
    seg_c = jnp.clip(seg, 0, U - 1)
    cell_sum = jnp.zeros((U, 3), jnp.float32).at[seg_c].add(
        jnp.where(use[:, None], p_s, 0.0), indices_are_sorted=True
    )
    cell_cnt = jnp.zeros((U,), jnp.float32).at[seg_c].add(
        use.astype(jnp.float32), indices_are_sorted=True
    )
    (starts,) = jnp.nonzero(first, size=U, fill_value=S - 1)
    n_uniq = jnp.sum(first.astype(jnp.int32))
    uvalid = jnp.arange(U) < n_uniq
    ukey = jnp.where(uvalid, k_s[starts], _EMPTY)

    keys = state.keys

    def claim(keys, ck, act, lo, hi):
        """Probe rounds claiming one slot per (distinct) cell key.

        Occupied slots only ever receive _EMPTY min-candidates (a no-op),
        so history is never displaced; same-round contenders for a free
        slot resolve by scatter-min and the losers re-probe.
        """
        owned = jnp.zeros_like(ck)
        placed = jnp.zeros_like(act)
        for probe in range(lo, hi):
            slot = _probe_slot(ck, probe, config.table_size)
            contend = act & (keys[slot] == _EMPTY)
            keys = keys.at[slot].min(jnp.where(contend, ck, _EMPTY))
            own = act & (keys[slot] == ck)
            owned = jnp.where(own, slot, owned)
            placed = placed | own
            act = act & ~own
        return keys, owned, placed, act

    def add_at(sums, counts, owned, placed, c_sum, c_cnt):
        # ONE scatter-add per phase: unplaced lanes alias slot 0 with a
        # zero contribution
        slot = jnp.where(placed, owned, 0)
        sums = sums.at[slot].add(c_sum * placed[:, None])
        counts = counts.at[slot].add(c_cnt * placed)
        return sums, counts

    # phase 1: a couple of rounds at unique width place ~all cells
    # (per-round miss rate ~ table occupancy)
    fw = min(config.full_width_probes, config.max_probes)
    keys, owned, placed, rem = claim(keys, ukey, uvalid, 0, fw)
    sums, counts = add_at(
        state.sums, state.counts, owned, placed, cell_sum, cell_cnt
    )

    n_dropped = jnp.sum(over.astype(jnp.int32))
    if config.max_probes > fw:
        # phase 2: compact the straggler cells (collision losers) and
        # finish the probe budget on the small array — deep-probe
        # correctness at a fraction of the width-U scatter cost
        r_cap = min(config.straggler_capacity, U)
        n_rem = jnp.sum(rem.astype(jnp.int32))
        (idx,) = jnp.nonzero(rem, size=r_cap, fill_value=0)
        r_act = jnp.arange(r_cap) < n_rem
        rkey = jnp.where(r_act, ukey[idx], _EMPTY)
        keys, r_owned, r_placed, _ = claim(
            keys, rkey, r_act, fw, config.max_probes
        )
        r_cnt = cell_cnt[idx]
        sums, counts = add_at(
            sums, counts, r_owned, r_placed, cell_sum[idx], r_cnt
        )
        # dropped POINTS: everything in cells that were still unplaced
        # after phase 1 minus what phase 2 landed (covers both deep-probe
        # exhaustion and cells past the straggler cap)
        n_dropped = n_dropped + (
            jnp.sum(cell_cnt * rem) - jnp.sum(r_cnt * r_placed)
        ).astype(jnp.int32)
    else:
        n_dropped = n_dropped + jnp.sum(cell_cnt * rem).astype(jnp.int32)

    return VoxelMapState(
        keys=keys,
        sums=sums,
        counts=counts,
        origin=state.origin,
        n_dropped=state.n_dropped + n_dropped,
        n_oob=state.n_oob + n_oob,
    )


@functools.partial(jax.jit, static_argnames=("config",))
def voxel_map_insert_chunk(
    state: VoxelMapState,
    points: Array,  # (T, S, 3)
    mask: Array,  # (T, S)
    config: VoxelMapConfig,
) -> VoxelMapState:
    """lax.scan of voxel_map_insert over a chunk of frames — the mapping
    product's device-resident accumulate loop."""

    def body(carry, frame):
        p, m = frame
        return voxel_map_insert(carry, p, m, config), None

    out, _ = jax.lax.scan(body, state, (points, mask))
    return out


@functools.partial(jax.jit, static_argnames=("config", "out_capacity"))
def voxel_map_centroids(
    state: VoxelMapState, config: VoxelMapConfig, out_capacity: int
) -> Cloud:
    """The map cloud: one centroid per occupied cell, packed id order.

    Ordering by packed id makes the output deterministic (independent of
    hash layout and insert order) — the same cloud the host merge
    produces, sorted. O(H log H) once at extraction, not per frame.
    """
    occ = state.keys != _EMPTY
    sort_key = jnp.where(occ, state.keys, _EMPTY)
    order = jnp.argsort(sort_key)[:out_capacity]
    cent = state.sums[order] / jnp.maximum(state.counts[order], 1.0)[:, None]
    n = jnp.minimum(jnp.sum(occ.astype(jnp.int32)), out_capacity)
    msk = jnp.arange(out_capacity) < n
    return Cloud(jnp.where(msk[:, None], cent, 0.0), msk)


def voxel_map_centroids_numpy(state: VoxelMapState) -> np.ndarray:
    """Host extraction of all centroids (packed id order), for finalize()
    paths and tests."""
    keys = np.asarray(state.keys)
    occ = keys != _EMPTY
    order = np.argsort(keys[occ], kind="stable")
    sums = np.asarray(state.sums)[occ][order]
    counts = np.asarray(state.counts)[occ][order]
    return (sums / counts[:, None]).astype(np.float32)
