"""Procedural shape generator (data/shapes.py): manifold + determinism."""
import numpy as np

from pose6d_tpu.data.shapes import diameter, random_shape


class TestRandomShape:
    def test_watertight_manifold(self):
        """Every undirected edge must be shared by exactly two faces —
        the property the z-buffer rasterizer and the LBO build rely on."""
        for seed in (0, 7, 123):
            v, f = random_shape(seed)
            edges = np.concatenate(
                [f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]])
            edges = np.sort(edges, axis=1)
            _, counts = np.unique(edges, axis=0, return_counts=True)
            assert (counts == 2).all(), f"seed {seed}: non-manifold edges"

    def test_finite_and_scaled(self):
        v, f = random_shape(3)
        assert np.isfinite(v).all()
        assert f.min() >= 0 and f.max() < len(v)
        d = diameter(v)
        assert 80.0 <= d <= 300.0
        # centered
        assert np.abs(v.mean(axis=0)).max() < 1.0

    def test_deterministic_and_distinct(self):
        v1, f1 = random_shape(11)
        v2, f2 = random_shape(11)
        v3, _ = random_shape(12)
        np.testing.assert_array_equal(v1, v2)
        np.testing.assert_array_equal(f1, f2)
        assert v1.shape != v3.shape or not np.allclose(v1, v3)

    def test_nondegenerate_faces(self):
        """No zero-area faces (pole fans must not emit slivers that
        break rasterizer barycentrics)."""
        v, f = random_shape(5)
        a, b, c = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
        area2 = np.linalg.norm(np.cross(b - a, c - a), axis=1)
        assert (area2 > 1e-8).all()
