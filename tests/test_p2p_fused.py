"""Fused whole-GN point-to-plane kernel vs the multi-launch XLA path.

The fused kernel (ops/p2p_fused.py) must reproduce `point_to_plane_align`
(fresh correspondences, fixed iterations, Huber, damped solve) — the two
differ only in association culling (pair list vs dense), the SE(3) exp
(Taylor+polar vs closed form) and the 6x6 solve (unrolled Cholesky vs
LAPACK), all of which agree to ~1e-4 on non-degenerate scenes.
"""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as ScipyR

from slam_sensor_fusion_tpu.ops.morton import sort_points_numpy
from slam_sensor_fusion_tpu.ops.point_to_plane import (
    PointToPlaneConfig,
    estimate_normals,
    point_to_plane_align,
)
from slam_sensor_fusion_tpu.ops.p2p_fused import (
    build_cached_p2p_target,
    point_to_plane_align_fused,
)
from test_icp import make_scene, padded


def _setup(rng, n_tgt=900, offset=(0.3, -0.2, 0.1), yaw=0.04):
    tgt = sort_points_numpy(make_scene(rng, n=n_tgt))
    T_true = np.eye(4, dtype=np.float32)
    T_true[:3, :3] = ScipyR.from_rotvec([0.0, 0.0, yaw]).as_matrix()
    T_true[:3, 3] = offset
    src = (tgt - T_true[:3, 3]) @ T_true[:3, :3]
    s, sm = padded(src, 1024)
    t, tm = padded(tgt, 1024)
    normals, nvalid = estimate_normals(t, tm, voxel=1.5)
    return s, sm, t, tm, normals, nvalid, T_true


def test_fused_matches_xla_path(rng):
    s, sm, t, tm, normals, nvalid, T_true = _setup(rng)
    cfg = PointToPlaneConfig(nn_backend="xla", tile_src=256, tile_tgt=512)
    r_xla = point_to_plane_align(
        s, sm, t, tm, normals, nvalid, jnp.eye(4), cfg
    )
    cached = build_cached_p2p_target(
        jnp.asarray(t), jnp.asarray(tm), normals, nvalid,
        jnp.zeros(3, jnp.float32), cfg.tile_tgt,
    )
    r_fused = point_to_plane_align_fused(
        jnp.asarray(s), jnp.asarray(sm), cached, jnp.eye(4), cfg,
        interpret=True,
    )
    T_x = np.asarray(r_xla.transformation)
    T_f = np.asarray(r_fused.transformation)
    np.testing.assert_allclose(T_f, T_x, atol=2e-3)
    # both recover the ground truth
    np.testing.assert_allclose(T_f, T_true, atol=2e-2)
    assert abs(float(r_fused.rmse) - float(r_xla.rmse)) < 5e-3
    # counts may differ by argmin tie-breaks near the gate boundary
    assert (
        abs(int(r_fused.n_correspondences) - int(r_xla.n_correspondences))
        <= 0.02 * int(r_xla.n_correspondences) + 5
    )


def test_fused_rebased_center(rng):
    """The cached-target rebase (world-scale coordinates) must not change
    the result: run the same problem shifted 500 m from the origin."""
    s, sm, t, tm, normals, nvalid, _ = _setup(rng)
    shift = np.array([500.0, -300.0, 40.0], np.float32)
    s2 = np.where(sm[:, None], s + shift, s).astype(np.float32)
    t2 = np.where(tm[:, None], t + shift, t).astype(np.float32)
    cfg = PointToPlaneConfig(nn_backend="xla", tile_src=256, tile_tgt=512)
    prior = np.eye(4, dtype=np.float32)
    cached = build_cached_p2p_target(
        jnp.asarray(t2), jnp.asarray(tm), normals, nvalid,
        jnp.asarray(shift), cfg.tile_tgt,
    )
    r_near = point_to_plane_align_fused(
        jnp.asarray(s), jnp.asarray(sm),
        build_cached_p2p_target(
            jnp.asarray(t), jnp.asarray(tm), normals, nvalid,
            jnp.zeros(3, jnp.float32), cfg.tile_tgt,
        ),
        jnp.eye(4), cfg, interpret=True,
    )
    r_far = point_to_plane_align_fused(
        jnp.asarray(s2), jnp.asarray(sm), cached, jnp.asarray(prior), cfg,
        interpret=True,
    )
    T_near = np.asarray(r_near.transformation)
    T_far = np.asarray(r_far.transformation)
    # same rotation; translation differs by the rigid shift action
    np.testing.assert_allclose(T_far[:3, :3], T_near[:3, :3], atol=1e-3)
    expect_t = T_near[:3, 3] + shift - T_near[:3, :3] @ shift
    np.testing.assert_allclose(T_far[:3, 3], expect_t, atol=5e-3)


def test_fused_starved_frame_is_noop(rng):
    """With the source far outside the gate the kernel must return the
    prior unchanged (starvation guard) instead of a garbage step."""
    s, sm, t, tm, normals, nvalid, _ = _setup(rng)
    s_far = np.where(sm[:, None], s + np.float32(50.0), s).astype(np.float32)
    cfg = PointToPlaneConfig(nn_backend="xla", tile_src=256, tile_tgt=512)
    cached = build_cached_p2p_target(
        jnp.asarray(t), jnp.asarray(tm), normals, nvalid,
        jnp.zeros(3, jnp.float32), cfg.tile_tgt,
    )
    prior = jnp.eye(4)
    r = point_to_plane_align_fused(
        jnp.asarray(s_far), jnp.asarray(sm), cached, prior, cfg,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(r.transformation), np.eye(4), atol=1e-6)
    assert int(r.n_correspondences) == 0


def test_fused_fixed_correspondences_converges(rng):
    """One association at the prior + fixed-set GN iterations recovers
    the transform FROM A GOOD PRIOR (the LIO contract: the IMU
    propagation puts the prior within cm of truth; correspondences found
    there stay valid across the small GN corrections)."""
    s, sm, t, tm, normals, nvalid, T_true = _setup(rng)
    cfg = PointToPlaneConfig(
        tile_src=256, tile_tgt=512, fixed_correspondences=True
    )
    cached = build_cached_p2p_target(
        jnp.asarray(t), jnp.asarray(tm), normals, nvalid,
        jnp.zeros(3, jnp.float32), cfg.tile_tgt,
    )
    prior = T_true.copy()
    prior[:3, 3] += np.array([0.03, -0.02, 0.01], np.float32)
    r = point_to_plane_align_fused(
        jnp.asarray(s), jnp.asarray(sm), cached, jnp.asarray(prior), cfg,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(r.transformation), T_true, atol=1e-2)
    assert float(r.rmse) < 0.03


def test_fused_assoc_unroll_bit_identical(rng):
    """assoc_unroll=2/4 must be BIT-identical to the U=1 loop: tail
    lanes clamp to the run's last tile, a no-op under the strict-min
    winner (the unroll only amortizes sequential trip overhead)."""
    s, sm, t, tm, normals, nvalid, T_true = _setup(rng)
    base = PointToPlaneConfig(
        nn_backend="fused", tile_src=256, tile_tgt=512
    )
    cached = build_cached_p2p_target(
        jnp.asarray(t), jnp.asarray(tm), normals, nvalid,
        jnp.zeros(3, jnp.float32), base.tile_tgt,
    )
    r1 = point_to_plane_align_fused(
        jnp.asarray(s), jnp.asarray(sm), cached, jnp.eye(4), base,
        interpret=True,
    )
    for U in (2, 4):
        cfg = base._replace(assoc_unroll=U)
        rU = point_to_plane_align_fused(
            jnp.asarray(s), jnp.asarray(sm), cached, jnp.eye(4), cfg,
            interpret=True,
        )
        np.testing.assert_array_equal(
            np.asarray(rU.transformation), np.asarray(r1.transformation)
        )
        assert int(rU.n_correspondences) == int(r1.n_correspondences)
        assert float(rU.rmse) == float(r1.rmse)
