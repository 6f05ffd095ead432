"""Map-sharded (`sp` axis) registration: ICP against a map that lives
sharded across the mesh.

The dp fleet (parallel/batch.py) replicates the map per device, which caps
the usable map at one chip's HBM. This module shards the MAP instead: the
Morton-sorted global map is split into contiguous chunks — spatially
coherent by construction, so per-shard tile culling stays effective — and
each device runs the production single-shot VMEM association kernel
(ops/nn_pallas.pair_nn) against its own shard. Per-point winners are then
min-combined over the `sp` axis with one small all_gather (the scan's
(nSt, 4, TM) distance+coordinate pages, a few hundred KB riding ICI), and
the rest of the ICP loop — error, lazy re-association predicate, Kabsch —
runs replicated on every device, bit-identical to the single-device
program. See ops/icp._icp_pallas(axis_name=...) for the combine.

Reference scope note: the reference loads its whole map on one host
(map_server_node.cpp / global_map_frames_manager.cpp) — this path is the
TPU-native extension for maps past one chip's memory, not a parity item.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from slam_sensor_fusion_tpu.ops.icp import ICPResult, _icp_pallas
from slam_sensor_fusion_tpu.utils.config import ICPConfig

Array = jax.Array


def shard_cloud(
    points: np.ndarray,  # (N, 3) Morton-sorted valid points
    n_shards: int,
    tile_tgt: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Split a Morton-sorted cloud into `n_shards` contiguous, equally
    padded chunks, concatenated back into one (n_shards * cap, 3) array
    ready for a leading-axis `sp` sharding.

    Contiguous ranges of the Morton order are spatially compact, so each
    shard covers its own region of the map and the per-shard bbox culling
    (ops/nn_gated.pair_tiles) rejects almost all of a far-away scan's
    tiles. Each shard's capacity is padded to a multiple of `tile_tgt`
    (kernel page size).
    """
    n = len(points)
    per = -(-n // n_shards)  # ceil
    cap = -(-per // tile_tgt) * tile_tgt
    out = np.zeros((n_shards * cap, 3), np.float32)
    mask = np.zeros(n_shards * cap, bool)
    for s in range(n_shards):
        chunk = points[s * per : (s + 1) * per]
        out[s * cap : s * cap + len(chunk)] = chunk
        mask[s * cap : s * cap + len(chunk)] = True
    return out, mask


@functools.partial(
    jax.jit, static_argnames=("config", "mesh", "interpret")
)
def sp_icp_align(
    source: Array,  # (M, 3) padded scan, replicated
    source_mask: Array,  # (M,)
    target_shards: Array,  # (n_shards * cap, 3) from shard_cloud
    target_shard_mask: Array,  # (n_shards * cap,)
    initial_T: Array,  # (4, 4)
    config: ICPConfig,
    mesh: Mesh,
    interpret: bool = False,
) -> ICPResult:
    """ICP where the map is sharded over the mesh's `sp` axis.

    Runs the PRODUCTION pages-native Pallas loop on every device — the
    same `_icp_pallas` program the single-chip pipeline executes — with
    the per-shard association winners min-combined over `sp`. The result
    is replicated (identical on every device) and equals the single-device
    `icp_align` against the full map, up to exact-distance ties.
    """
    axis = mesh.axis_names[0]

    def body(src, smask, tgt, tmask, T0):
        return _icp_pallas(
            src, smask, tgt, tmask, T0, config,
            interpret=interpret, axis_name=axis,
        )

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P()),
        out_specs=P(),  # prefix spec: every output leaf is replicated
        check_vma=False,
    )(source, source_mask, target_shards, target_shard_mask, initial_T)
