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
