"""Symmetry detection + symmetry-aware IR (ops/symmetry.py).

Covers the geometric detector on shapes with known symmetry groups
(continuous revolution, C2-only box, asymmetric blob) and the sym-IR
rescoring semantics (identity == plain IR; symmetry-flipped
correspondences credited only by sym-IR).
"""
import numpy as np
import pytest

from pose6d_tpu.ops.symmetry import (_axis_rotation, detect_symmetries,
                                     sym_inlier_ratio)


def _box_grid(sx=100.0, sy=60.0, sz=30.0, n=14):
    """Grid-sampled surface of an axis-aligned box centered at origin:
    exactly C2-symmetric about each coordinate axis, no finer order."""
    lin = lambda s: np.linspace(-s / 2, s / 2, n)
    pts = []
    for sign in (-1, 1):
        u, v = np.meshgrid(lin(sx), lin(sy))
        pts.append(np.stack([u, v, np.full_like(u, sign * sz / 2)], -1))
        u, v = np.meshgrid(lin(sx), lin(sz))
        pts.append(np.stack([u, np.full_like(u, sign * sy / 2), v], -1))
        u, v = np.meshgrid(lin(sy), lin(sz))
        pts.append(np.stack([np.full_like(u, sign * sx / 2), u, v], -1))
    return np.concatenate([p.reshape(-1, 3) for p in pts])


def _cylinder(r=30.0, h=100.0, n_ring=48, n_z=24):
    th = np.linspace(0, 2 * np.pi, n_ring, endpoint=False)
    z = np.linspace(-h / 2, h / 2, n_z)
    T, Z = np.meshgrid(th, z)
    return np.stack([r * np.cos(T), r * np.sin(T), Z], -1).reshape(-1, 3)


class TestDetect:
    def test_cylinder_continuous(self):
        Rs, rep = detect_symmetries(_cylinder())
        cont = [s for s in rep if s["continuous"]]
        assert len(cont) == 1
        # revolution axis is z
        assert abs(cont[0]["axis"][2]) > 0.99
        assert len(Rs) >= 36  # identity + discretized revolution
        assert np.allclose(Rs[0], np.eye(3))

    def test_box_c2_all_axes(self):
        Rs, rep = detect_symmetries(_box_grid())
        assert len(rep) == 3
        assert all(s["order"] == 2 and not s["continuous"] for s in rep)
        assert len(Rs) == 4  # identity + three 180-degree rotations

    def test_asymmetric_blob(self):
        rng = np.random.default_rng(3)
        verts = rng.normal(size=(500, 3)) * [50.0, 30.0, 15.0]
        Rs, rep = detect_symmetries(verts)
        assert len(rep) == 0 and len(Rs) == 1

    def test_offset_centroid_invariance(self):
        """Symmetries are about the centroid, wherever the model sits."""
        Rs, rep = detect_symmetries(_box_grid() + [500.0, -200.0, 80.0])
        assert len(rep) == 3


class TestSymIR:
    def _setup(self):
        cad = _box_grid()
        rng = np.random.default_rng(0)
        idx = rng.choice(len(cad), 64, replace=False)
        return cad, idx

    def test_identity_equals_plain_ir(self):
        cad, idx = self._setup()
        align = cad.copy()
        pairs = np.stack([idx, idx], -1)
        eye = np.eye(3)[None]
        assert sym_inlier_ratio(pairs, cad, align, 1.0, eye) == 1.0
        # break half the pairs
        bad = pairs.copy()
        bad[:32, 1] = (idx[:32] + 1) % len(cad)
        plain = sym_inlier_ratio(bad, cad, align, 1e-6, eye)
        assert plain == pytest.approx(0.5, abs=0.02)

    def test_flipped_pairs_credited_only_by_sym_ir(self):
        cad, idx = self._setup()
        Rs, _ = detect_symmetries(cad)
        flip = _axis_rotation([0.0, 0.0, 1.0], np.pi)
        # depth points observed at the 180-degree image of each cad point
        align_full = cad @ flip.T
        pairs = np.stack([idx, idx], -1)
        thr = 0.01 * np.linalg.norm(cad.max(0) - cad.min(0))
        plain = sym_inlier_ratio(pairs, cad, align_full, thr,
                                 np.eye(3)[None])
        sym = sym_inlier_ratio(pairs, cad, align_full, thr, Rs)
        assert plain < 0.3  # only points near the axis survive
        assert sym == 1.0

    def test_empty_pairs(self):
        cad, _ = self._setup()
        assert sym_inlier_ratio(np.zeros((0, 2), int), cad, cad, 1.0,
                                np.eye(3)[None]) == 0.0


class TestSymRotationError:
    def test_identity_group_equals_plain_angle(self):
        from pose6d_tpu.ops.symmetry import sym_rotation_error_deg
        rng = np.random.default_rng(0)
        A = np.linalg.qr(rng.normal(size=(3, 3)))[0]
        A *= np.sign(np.linalg.det(A))
        R90 = _axis_rotation([0, 0, 1], np.pi / 2)
        e = sym_rotation_error_deg(A, A @ R90, np.eye(3)[None])
        assert abs(e - 90.0) < 1e-6

    def test_symmetry_image_scores_zero(self):
        """A pose landing on a C2 image of the truth: raw error 180,
        mod-sym error ~0 for a box's detected group."""
        from pose6d_tpu.ops.symmetry import (detect_symmetries,
                                             sym_rotation_error_deg)
        Rs, _ = detect_symmetries(_box_grid())
        rng = np.random.default_rng(1)
        R_gt = np.linalg.qr(rng.normal(size=(3, 3)))[0]
        R_gt *= np.sign(np.linalg.det(R_gt))
        R_est = R_gt @ Rs[1]           # a nontrivial group element
        raw = sym_rotation_error_deg(R_gt, R_est, np.eye(3)[None])
        mod = sym_rotation_error_deg(R_gt, R_est, Rs)
        assert raw > 170.0 and mod < 1e-4

    def test_genuinely_wrong_pose_stays_wrong(self):
        from pose6d_tpu.ops.symmetry import (detect_symmetries,
                                             sym_rotation_error_deg)
        Rs, _ = detect_symmetries(_box_grid())
        R_gt = np.eye(3)
        R_bad = _axis_rotation([1, 1, 0], 0.6)  # not a symmetry image
        mod = sym_rotation_error_deg(R_gt, R_bad, Rs)
        assert mod > 20.0


class TestDisambiguationBank:
    def test_box_bank_contains_c2_flips(self):
        from pose6d_tpu.ops.symmetry import disambiguation_bank
        bank = disambiguation_bank(_box_grid(), max_rots=6)
        assert bank.shape == (6, 3, 3)
        assert np.allclose(bank[0], np.eye(3))
        # at the bank's loose detection tau at least two distinct
        # 180-degree rotations survive dedup (the third C2 may fold
        # into a loose continuous misdetection whose perpendicular
        # flips coincide with the real C2 flips — harmless: the bank's
        # job is covering confusable rotations, not group recovery)
        nontrivial = [R for R in bank
                      if not np.allclose(R, np.eye(3), atol=1e-3)]
        assert len(nontrivial) >= 2
        assert all(abs(np.trace(R) + 1.0) < 1e-2 for R in nontrivial)

    def test_cylinder_bank_flips_perpendicular(self):
        """Continuous axis -> in-axis images are unidentifiable; the
        bank carries 180-deg flips about perpendicular axes instead."""
        from pose6d_tpu.ops.symmetry import disambiguation_bank
        bank = disambiguation_bank(_cylinder(), max_rots=6)
        nontrivial = [R for R in bank
                      if not np.allclose(R, np.eye(3), atol=1e-3)]
        assert len(nontrivial) >= 1
        for R in nontrivial:
            # each is a 180-deg rotation (trace -1) moving the z axis
            assert abs(np.trace(R) + 1.0) < 1e-2
            assert abs(R[2, 2] - 1.0) > 0.5

    def test_asymmetric_blob_falls_back_to_generic_bank(self):
        """No detected near-symmetry -> the generic principal-axis bank
        (not an all-identity no-op), preserving the rescue behavior of
        solvers/multistart.flip_hypotheses for undetected objects."""
        from pose6d_tpu.ops.symmetry import disambiguation_bank
        rng = np.random.default_rng(3)
        verts = rng.normal(size=(500, 3)) * [50.0, 30.0, 15.0]
        bank = disambiguation_bank(verts, max_rots=6, rel_tau=0.02)
        assert np.allclose(bank[0], np.eye(3))
        nontrivial = [R for R in bank
                      if not np.allclose(R, np.eye(3), atol=1e-3)]
        assert len(nontrivial) == 5  # 3 flips + two 90-deg turns
