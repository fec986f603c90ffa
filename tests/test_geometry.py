import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pose6d_tpu.ops import geometry, masking, sampling


def _np_mask(h, w, seed=0):
    rng = np.random.default_rng(seed)
    m = np.zeros((h, w), bool)
    m[10:40, 15:50] = True
    m &= rng.random((h, w)) > 0.2
    return m


class TestErode:
    def test_matches_cv2(self):
        m = _np_mask(64, 80)
        k = np.ones((3, 3), np.uint8)
        k[0, 0] = k[-1, 0] = k[0, -1] = k[-1, -1] = 0
        ref = cv2.erode(m.astype(np.uint8) * 255, k, iterations=1).astype(bool)
        got = np.asarray(geometry.erode_mask(jnp.asarray(m), 3))
        assert (got == ref).all()

    def test_matches_cv2_k5(self):
        m = _np_mask(48, 48, seed=3)
        k = np.ones((5, 5), np.uint8)
        k[0, 0] = k[-1, 0] = k[0, -1] = k[-1, -1] = 0
        ref = cv2.erode(m.astype(np.uint8) * 255, k, iterations=1).astype(bool)
        got = np.asarray(geometry.erode_mask(jnp.asarray(m), 5))
        assert (got == ref).all()


class TestBackproject:
    def _reference_backproject(self, dpt, cam_scale, K, mask):
        # Direct numpy transcription of the reference math
        # (dataset/object.py:73-88) used as the test oracle.
        idx = np.indices(dpt.shape[:2])
        xmap, ymap = idx[0], idx[1]
        d = dpt.astype(np.float32) / cam_scale
        k = np.ones((3, 3), np.uint8)
        k[0, 0] = k[-1, 0] = k[0, -1] = k[-1, -1] = 0
        mask = cv2.erode(mask.astype(np.uint8) * 255, k).astype(bool)
        d = d[mask]
        row = (ymap[mask] - K[0, 2]) * d / K[0, 0]
        col = (xmap[mask] - K[1, 2]) * d / K[1, 1]
        return np.stack([row, col, d], axis=1) * 100

    def test_matches_reference_math(self):
        rng = np.random.default_rng(1)
        depth = (rng.random((60, 70)) * 2000).astype(np.float32)
        mask = _np_mask(60, 70, seed=2)
        K = np.array([[572.4, 0, 325.2], [0, 573.5, 242.0], [0, 0, 1]],
                     np.float32)
        ref = self._reference_backproject(depth, 1000.0, K, mask.copy())
        pts, valid = geometry.backproject_depth(
            jnp.asarray(depth), jnp.asarray(K), 1000.0, jnp.asarray(mask),
            max_points=4096)
        got = np.asarray(pts)[np.asarray(valid)]
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)

    def test_overflow_truncates(self):
        depth = np.ones((32, 32), np.float32)
        mask = np.ones((32, 32), bool)
        pts, valid = geometry.backproject_depth(
            jnp.asarray(depth), jnp.eye(3), 1.0, jnp.asarray(mask),
            max_points=100)
        assert int(valid.sum()) == 100


class TestPairwise:
    def test_sqdist(self):
        rng = np.random.default_rng(0)
        a, b = rng.normal(size=(17, 3)), rng.normal(size=(23, 3))
        ref = ((a[:, None] - b[None]) ** 2).sum(-1)
        got = np.asarray(geometry.pairwise_sqdist(jnp.asarray(a), jnp.asarray(b)))
        np.testing.assert_allclose(got, ref, atol=1e-5)


class TestOutlierRemoval:
    def test_flags_far_points(self):
        rng = np.random.default_rng(0)
        cloud = rng.normal(size=(200, 3)).astype(np.float32)
        outliers = np.array([[50, 50, 50], [-60, 0, 0]], np.float32)
        pts = np.concatenate([cloud, outliers])
        pts_p = masking.pad_to(pts, 256)
        valid = np.arange(256) < len(pts)
        keep = np.asarray(geometry.statistical_outlier_mask(
            jnp.asarray(pts_p), jnp.asarray(valid)))
        assert not keep[200] and not keep[201]
        assert keep[:200].mean() > 0.9
        assert not keep[len(pts):].any()

    def test_open3d_like_inlier_agreement(self):
        # sklearn-based transcription of the Open3D statistical outlier
        # criterion as oracle.
        from sklearn.neighbors import NearestNeighbors
        rng = np.random.default_rng(5)
        pts = rng.normal(size=(300, 3)).astype(np.float32)
        pts[:10] *= 8  # some outliers
        nn = NearestNeighbors(n_neighbors=21).fit(pts)
        d, _ = nn.kneighbors(pts)
        mean_d = d[:, 1:].mean(1)
        thr = mean_d.mean() + 0.3 * mean_d.std()
        ref_keep = mean_d <= thr
        pts_p = masking.pad_to(pts, 512)
        valid = np.arange(512) < 300
        keep = np.asarray(geometry.statistical_outlier_mask(
            jnp.asarray(pts_p), jnp.asarray(valid)))[:300]
        assert (keep == ref_keep).mean() > 0.98


class TestTransforms:
    def test_inverse_roundtrip(self):
        rng = np.random.default_rng(0)
        A = rng.normal(size=(3, 3))
        R = np.linalg.qr(A)[0]
        if np.linalg.det(R) < 0:
            R[:, 0] *= -1
        t = rng.normal(size=(3,))
        pc = rng.normal(size=(50, 3))
        fwd = geometry.transform_points(jnp.asarray(pc), jnp.asarray(R),
                                        jnp.asarray(t))
        back = geometry.transform_points(fwd, jnp.asarray(R), jnp.asarray(t),
                                         inv=True)
        np.testing.assert_allclose(np.asarray(back), pc, atol=1e-5)


class TestCorrespondence:
    def test_overlap_masks(self):
        cad = jnp.asarray(np.array([[0, 0, 0], [5, 0, 0], [0, 5, 0.]]))
        pc = jnp.asarray(np.array([[0.05, 0, 0], [9, 9, 9.]]))
        m = geometry.radius_correspondence_mask(
            cad, jnp.ones(3, bool), pc, jnp.ones(2, bool), 0.2)
        o12, o21 = geometry.overlap_from_mask(m)
        assert np.asarray(o12).tolist() == [True, False, False]
        assert np.asarray(o21).tolist() == [True, False]

    def test_sample_pairs_without_replacement(self):
        mask = np.zeros((10, 10), bool)
        mask[2, 3] = mask[4, 5] = mask[7, 1] = True
        pairs, valid = geometry.sample_pairs(jax.random.PRNGKey(0),
                                             jnp.asarray(mask), 8)
        pv = np.asarray(pairs)[np.asarray(valid)]
        assert len(pv) == 3
        got = {tuple(p) for p in pv.tolist()}
        assert got == {(2, 3), (4, 5), (7, 1)}


class TestFPS:
    def test_spreads_points(self):
        rng = np.random.default_rng(0)
        pts = rng.random((500, 3)).astype(np.float32)
        pts_p = masking.pad_to(pts, 512)
        valid = np.arange(512) < 500
        idx, sel_valid = sampling.farthest_point_sample(
            jnp.asarray(pts_p), jnp.asarray(valid), 64)
        idx = np.asarray(idx)
        assert sel_valid.all()
        assert len(set(idx.tolist())) == 64
        # FPS min pairwise distance should beat random sampling's.
        sel = pts[idx]
        d = ((sel[:, None] - sel[None]) ** 2).sum(-1)
        np.fill_diagonal(d, np.inf)
        rnd = pts[rng.choice(500, 64, replace=False)]
        dr = ((rnd[:, None] - rnd[None]) ** 2).sum(-1)
        np.fill_diagonal(dr, np.inf)
        assert d.min() > dr.min()

    def test_never_selects_invalid(self):
        pts = np.zeros((64, 3), np.float32)
        pts[:10] = np.random.default_rng(0).random((10, 3))
        pts[10:] = 77.0  # invalid region with far coords
        valid = np.arange(64) < 10
        idx, sel_valid = sampling.farthest_point_sample(
            jnp.asarray(pts), jnp.asarray(valid), 16)
        assert np.asarray(idx).max() < 10
        assert np.asarray(sel_valid).sum() == 10


class TestGroupedFPS:
    def test_coverage_close_to_exact(self):
        """Grouped FPS (the online path's parallel variant) must keep
        near-FPS spatial coverage: max distance from any cloud point to
        its nearest sample (the covering radius) within 1.35x exact FPS,
        and all picks unique + valid."""
        rng = np.random.default_rng(1)
        pts = rng.random((2048, 3)).astype(np.float32)
        valid = jnp.ones(2048, bool)

        def cover_radius(sel):
            d = ((pts[:, None] - sel[None]) ** 2).sum(-1)
            return float(np.sqrt(d.min(axis=1).max()))

        idx_e, _ = sampling.farthest_point_sample(jnp.asarray(pts),
                                                  valid, 256)
        idx_g, vg = sampling.farthest_point_sample_grouped(
            jnp.asarray(pts), valid, 256, groups=8)
        idx_g = np.asarray(idx_g)
        assert np.asarray(vg).all()
        assert len(set(idx_g.tolist())) == 256
        r_e = cover_radius(pts[np.asarray(idx_e)])
        r_g = cover_radius(pts[idx_g])
        assert r_g < 1.35 * r_e, (r_g, r_e)

    def test_respects_validity(self):
        pts = np.zeros((256, 3), np.float32)
        rng = np.random.default_rng(0)
        pts[:100] = rng.random((100, 3))
        pts[100:] = 55.0
        valid = np.arange(256) < 100
        idx, vg = sampling.farthest_point_sample_grouped(
            jnp.asarray(pts), jnp.asarray(valid), 64, groups=8)
        sel = np.asarray(idx)[np.asarray(vg)]
        assert sel.max() < 100


class TestKNN:
    def test_matches_sklearn(self):
        from sklearn.neighbors import NearestNeighbors
        rng = np.random.default_rng(0)
        q, r = rng.normal(size=(20, 3)), rng.normal(size=(50, 3))
        nn = NearestNeighbors(n_neighbors=5).fit(r)
        refd, refi = nn.kneighbors(q)
        d, i = sampling.knn(jnp.asarray(q), jnp.ones(20, bool),
                            jnp.asarray(r), jnp.ones(50, bool), 5)
        np.testing.assert_allclose(np.sort(np.asarray(d), 1), refd, atol=1e-5)
        assert (np.sort(np.asarray(i), 1) == np.sort(refi, 1)).all()
