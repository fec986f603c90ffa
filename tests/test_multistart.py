"""Flip-disambiguation tests on an asymmetric L-shaped object."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pose6d_tpu.solvers import (depth_consistency_score,
                                disambiguate_pose_depth, flip_hypotheses)
from pose6d_tpu.ops.masking import pad_to


def l_shape(n=600, seed=0):
    """Asymmetric L-shaped surface point set (cm units)."""
    rng = np.random.default_rng(seed)
    a = np.stack([rng.uniform(0, 8, n // 2), rng.uniform(0, 2, n // 2),
                  rng.uniform(0, 2, n // 2)], 1)
    b = np.stack([rng.uniform(0, 2, n // 2), rng.uniform(2, 8, n // 2),
                  rng.uniform(0, 2, n // 2)], 1)
    return np.concatenate([a, b]).astype(np.float32) - 2.0


K = jnp.asarray([[572.4, 0, 325.26], [0, 573.57, 242.05], [0, 0, 1]],
                jnp.float32)


def render_obs(pts_cam, h=480, w=640):
    """Point-splat observed depth (cm) + mask."""
    z = pts_cam[:, 2]
    u = (572.4 * pts_cam[:, 0] / z + 325.26).astype(int)
    v = (573.57 * pts_cam[:, 1] / z + 242.05).astype(int)
    depth = np.zeros((h, w), np.float32)
    ok = (u >= 0) & (u < w) & (v >= 0) & (v < h)
    # splat with small footprint for coverage
    for du in (0, 1):
        for dv in (0, 1):
            uu = np.clip(u[ok] + du, 0, w - 1)
            vv = np.clip(v[ok] + dv, 0, h - 1)
            cur = depth[vv, uu]
            depth[vv, uu] = np.where((cur == 0) | (z[ok] < cur), z[ok], cur)
    return depth, depth > 0


class TestFlipHypotheses:
    def test_identity_first_and_valid_rotations(self):
        pts = l_shape()
        cad = jnp.asarray(pad_to(pts, 1024))
        valid = jnp.asarray(np.arange(1024) < len(pts))
        R0 = jnp.eye(3)
        t0 = jnp.asarray([0.0, 0.0, 60.0])
        Rs, ts = flip_hypotheses(cad, valid, R0, t0)
        assert Rs.shape[0] == 6
        np.testing.assert_allclose(np.asarray(Rs[0]), np.eye(3), atol=1e-5)
        for i in range(6):
            R = np.asarray(Rs[i])
            np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-4)
            assert abs(np.linalg.det(R) - 1) < 1e-4

    def test_flips_preserve_centroid(self):
        pts = l_shape()
        cad = jnp.asarray(pad_to(pts, 1024))
        valid = jnp.asarray(np.arange(1024) < len(pts))
        R0 = jnp.eye(3)
        t0 = jnp.asarray([1.0, -2.0, 70.0])
        Rs, ts = flip_hypotheses(cad, valid, R0, t0)
        mu = pts.mean(0)
        base = mu @ np.asarray(R0).T + np.asarray(t0)
        for i in range(6):
            moved = mu @ np.asarray(Rs[i]).T + np.asarray(ts[i])
            np.testing.assert_allclose(moved, base, atol=1e-3)


class TestDepthDisambiguation:
    def test_recovers_flip_on_asymmetric_object(self):
        pts = l_shape()
        from scipy.spatial.transform import Rotation
        R_gt = Rotation.from_rotvec([0.2, -0.3, 0.1]).as_matrix().astype(
            np.float32)
        t_gt = np.asarray([2.0, -1.0, 60.0], np.float32)
        pts_cam = pts @ R_gt.T + t_gt
        obs_z, mask = render_obs(pts_cam)

        cad = jnp.asarray(pad_to(pts, 1024))
        valid = jnp.asarray(np.arange(1024) < len(pts))
        pc = jnp.asarray(pad_to(pts_cam, 1024))
        pcv = valid
        diam = float(np.linalg.norm(pts.max(0) - pts.min(0)))

        # start from a 180-degree-flipped pose about the dominant axis
        Rs, ts = flip_hypotheses(cad, valid, jnp.asarray(R_gt),
                                 jnp.asarray(t_gt))
        R_bad, t_bad = Rs[3], ts[3]
        ang0 = np.degrees(np.arccos(np.clip(
            (np.trace(R_gt.T @ np.asarray(R_bad)) - 1) / 2, -1, 1)))
        assert ang0 > 90  # genuinely flipped start

        out = disambiguate_pose_depth(
            cad, valid, pc, pcv, R_bad, t_bad, diam, K,
            jnp.asarray(obs_z), jnp.asarray(mask), icp_iters=10)
        ang1 = np.degrees(np.arccos(np.clip(
            (np.trace(R_gt.T @ np.asarray(out["R"])) - 1) / 2, -1, 1)))
        assert ang1 < 15.0

    def test_score_prefers_true_pose(self):
        pts = l_shape()
        from scipy.spatial.transform import Rotation
        R_gt = Rotation.from_rotvec([0.1, 0.2, -0.1]).as_matrix().astype(
            np.float32)
        t_gt = np.asarray([0.0, 1.0, 55.0], np.float32)
        pts_cam = pts @ R_gt.T + t_gt
        obs_z, mask = render_obs(pts_cam)
        cad = jnp.asarray(pad_to(pts, 1024))
        valid = jnp.asarray(np.arange(1024) < len(pts))
        diam = float(np.linalg.norm(pts.max(0) - pts.min(0)))
        s_true = float(depth_consistency_score(
            cad, valid, jnp.asarray(R_gt), jnp.asarray(t_gt), K,
            jnp.asarray(obs_z), jnp.asarray(mask), diam))
        Rs, ts = flip_hypotheses(cad, valid, jnp.asarray(R_gt),
                                 jnp.asarray(t_gt))
        s_flip = float(depth_consistency_score(
            cad, valid, Rs[1], ts[1], K, jnp.asarray(obs_z),
            jnp.asarray(mask), diam))
        assert s_true < 0.6 * s_flip
