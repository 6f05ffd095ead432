"""Sort-merge device voxel map (ops/voxel_map_sorted) vs the host merge
oracle AND the hash store.

Same equality target as test_voxel_map.py: streaming scans through the
sorted-array store must yield EXACTLY the centroid set of the
reference's accumulate-then-voxel-grid merge (map_data_save_node.cpp:
60-99 + global_map_frames_manager.cpp:143-146, host twin
ops/cloud.voxel_downsample_numpy) — and, cell for cell, the SAME
(sum, count) moments as the hash store, since both add the identical
per-group segment moments to the running cell totals (f32 addition is
commutative, so merge-into-group vs table-plus-group is bitwise equal).
"""

import numpy as np
import jax.numpy as jnp

from slam_sensor_fusion_tpu.ops.cloud import voxel_downsample_numpy
from slam_sensor_fusion_tpu.ops.voxel_map import (
    VoxelMapConfig,
    voxel_map_centroids_numpy,
    voxel_map_init,
    voxel_map_insert,
)
from slam_sensor_fusion_tpu.ops.voxel_map_sorted import (
    SortedVoxelMapConfig,
    sorted_voxel_map_centroids_numpy,
    sorted_voxel_map_init,
    sorted_voxel_map_insert,
    sorted_voxel_map_insert_chunk,
)

CFG = SortedVoxelMapConfig(
    voxel_size=0.25, capacity=1 << 13, unique_capacity=1 << 11,
    dim_xy=256, dim_z=128,
)
HASH_CFG = VoxelMapConfig(
    voxel_size=0.25, table_size=1 << 14, dim_xy=256, dim_z=128,
)


def _quantized_points(rng, n, extent=30.0):
    p = rng.integers(0, int(extent * 32), (n, 3)).astype(np.float64) / 32.0
    return (p + 1.0 / 64.0).astype(np.float32)


def _sorted_rows(a):
    a = np.asarray(a, np.float64)
    return a[np.lexsort((a[:, 2], a[:, 1], a[:, 0]))]


def _pad(pts, cap):
    buf = np.zeros((cap, 3), np.float32)
    buf[: len(pts)] = pts
    msk = np.zeros(cap, bool)
    msk[: len(pts)] = True
    return jnp.asarray(buf), jnp.asarray(msk)


def test_sorted_incremental_equals_host_merge(rng):
    frames = [_quantized_points(rng, n) for n in (900, 1300, 700, 1100)]
    # revisit earlier cells: frame 3 reuses frame 0's points
    frames[3][:300] = frames[0][:300]
    origin = np.zeros(3, np.float32)
    state = sorted_voxel_map_init(CFG, jnp.asarray(origin))
    for f in frames:
        p, m = _pad(f, 2048)
        state = sorted_voxel_map_insert(state, p, m, CFG)
    assert int(state.n_dropped) == 0 and int(state.n_oob) == 0

    got = sorted_voxel_map_centroids_numpy(state)
    want = voxel_downsample_numpy(
        np.concatenate(frames), CFG.voxel_size, origin=origin
    )
    np.testing.assert_allclose(
        _sorted_rows(got), _sorted_rows(want), rtol=0, atol=1e-5
    )


def test_sorted_matches_hash_store_exactly(rng):
    """Cell-for-cell bitwise equality with the hash store: same packed
    ids, same f32 running moments (addition order identical per cell)."""
    frames = [_quantized_points(rng, n) for n in (1200, 800, 1500)]
    frames[2][:400] = frames[0][:400]
    origin = np.zeros(3, np.float32)
    ss = sorted_voxel_map_init(CFG, jnp.asarray(origin))
    hs = voxel_map_init(HASH_CFG, origin)
    for f in frames:
        p, m = _pad(f, 2048)
        ss = sorted_voxel_map_insert(ss, p, m, CFG)
        hs = voxel_map_insert(hs, p, m, HASH_CFG)
    assert int(ss.n_cells()) == int(hs.n_cells())
    # both extractors emit packed-id order, so rows align directly
    np.testing.assert_array_equal(
        sorted_voxel_map_centroids_numpy(ss), voxel_map_centroids_numpy(hs)
    )


def test_sorted_chunked_scan_matches_stepwise(rng):
    frames = [_quantized_points(rng, 1000) for _ in range(5)]
    origin = np.zeros(3, np.float32)
    pts = np.stack([_pad(f, 2048)[0] for f in frames])
    msk = np.stack([_pad(f, 2048)[1] for f in frames])

    step = sorted_voxel_map_init(CFG, jnp.asarray(origin))
    for f in frames:
        p, m = _pad(f, 2048)
        step = sorted_voxel_map_insert(step, p, m, CFG)
    chunk = sorted_voxel_map_insert_chunk(
        sorted_voxel_map_init(CFG, jnp.asarray(origin)),
        jnp.asarray(pts), jnp.asarray(msk), CFG,
    )
    np.testing.assert_array_equal(
        sorted_voxel_map_centroids_numpy(step),
        sorted_voxel_map_centroids_numpy(chunk),
    )


def test_sorted_overflow_and_oob_are_counted(rng):
    origin = np.zeros(3, np.float32)
    # out-of-extents points are counted, never binned
    state = sorted_voxel_map_init(CFG, jnp.asarray(origin))
    oob = np.full((64, 3), 1e4, np.float32)
    p, m = _pad(oob, 128)
    state = sorted_voxel_map_insert(state, p, m, CFG)
    assert int(state.n_oob) == 64 and int(state.n_cells()) == 0

    # a group touching more cells than unique_capacity drops the excess
    tiny = CFG._replace(unique_capacity=64)
    state = sorted_voxel_map_init(tiny, jnp.asarray(origin))
    p, m = _pad(_quantized_points(rng, 1024), 1024)
    state = sorted_voxel_map_insert(state, p, m, tiny)
    assert int(state.n_dropped) > 0

    # a map outgrowing `capacity` cuts the largest cells LOUDLY
    small = CFG._replace(capacity=128, unique_capacity=512)
    state = sorted_voxel_map_init(small, jnp.asarray(origin))
    for _ in range(4):
        p, m = _pad(_quantized_points(rng, 400), 512)
        state = sorted_voxel_map_insert(state, p, m, small)
    assert int(state.n_dropped) > 0


def test_streaming_mapper_sorted_device_path_matches_host(rng):
    """StreamingMapper with a SortedVoxelMapConfig: finalize(use_device)
    equals the host-merge map (same contract as the hash fast path)."""
    from slam_sensor_fusion_tpu.models.mapping import StreamingMapper
    from slam_sensor_fusion_tpu.utils.config import MappingConfig

    frames = [_quantized_points(rng, 700) for _ in range(6)]
    origin = np.zeros(3, np.float32)
    mcfg = MappingConfig(cloud_save_rate=2, map_voxel_size=0.25)
    mapper = StreamingMapper(
        mcfg,
        device_origin=origin,
        device_config=CFG,
        device_scan_capacity=1024,
        device_group=2,
    )
    for f in frames:
        mapper.add_frame(f, np.zeros(3), 63.0, 10.0, 100.0, 0.1)
    got = mapper.finalize(use_device=True)
    want = voxel_downsample_numpy(
        np.concatenate(frames), 0.25, origin=origin
    )
    assert len(got.map_points) == len(want)
    np.testing.assert_allclose(
        _sorted_rows(got.map_points), _sorted_rows(want), rtol=0, atol=2e-5
    )
    # host artifacts still recorded on the fast path
    assert len(mapper.tiles) == 3
    assert len(mapper.gps_rows) == 6
