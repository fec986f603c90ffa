import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pose6d_tpu.solvers import (gnc_tls_pose, icp_point2point,
                                kabsch_umeyama, naive_fmap2pointmap,
                                ransac_pose,
                                spatial_filtering_fmap2pointmap)


def random_rotation(rng):
    A = rng.normal(size=(3, 3))
    Q = np.linalg.qr(A)[0]
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    return Q


def rot_angle_deg(Ra, Rb):
    c = (np.trace(Ra.T @ Rb) - 1) / 2
    return np.degrees(np.arccos(np.clip(c, -1, 1)))


class TestKabsch:
    def test_exact_recovery(self):
        rng = np.random.default_rng(0)
        R = random_rotation(rng)
        t = rng.normal(size=3) * 10
        src = rng.normal(size=(100, 3))
        dst = src @ R.T + t
        R2, t2 = kabsch_umeyama(jnp.asarray(src), jnp.asarray(dst))
        assert rot_angle_deg(R, np.asarray(R2)) < 0.1
        np.testing.assert_allclose(np.asarray(t2), t, atol=1e-4)

    def test_weighted_ignores_outliers(self):
        rng = np.random.default_rng(1)
        R = random_rotation(rng)
        t = rng.normal(size=3)
        src = rng.normal(size=(60, 3))
        dst = src @ R.T + t
        dst[50:] += 100.0  # corrupted
        w = np.ones(60); w[50:] = 0.0
        R2, t2 = kabsch_umeyama(jnp.asarray(src), jnp.asarray(dst),
                                jnp.asarray(w))
        assert rot_angle_deg(R, np.asarray(R2)) < 0.1

    def test_degenerate_no_nan(self):
        src = jnp.zeros((10, 3))
        dst = jnp.zeros((10, 3))
        R, t = kabsch_umeyama(src, dst, jnp.zeros(10))
        assert np.isfinite(np.asarray(R)).all()
        assert abs(np.linalg.det(np.asarray(R)) - 1) < 1e-4

    def test_quat_matches_svd(self):
        # the default Horn-quaternion rotation extraction (fixed-sweep
        # 4x4 Jacobi; no batched 3x3 SVD, which XLA lowers to a serial
        # iterative routine on TPU) must agree with the classical SVD
        # form — including when the optimum needs the det correction
        # (mirrored data) and under soft weights.
        rng = np.random.default_rng(7)
        for trial in range(20):
            src = rng.normal(size=(32, 3)).astype(np.float32)
            if trial % 3 == 0:
                dst = (src @ np.diag([1, 1, -1.0]).T).astype(np.float32)
            else:
                R = random_rotation(rng)
                dst = (src @ R.T + rng.normal(size=3)
                       + rng.normal(size=(32, 3)) * 0.05).astype(np.float32)
            w = (jnp.asarray(rng.uniform(0, 1, 32).astype(np.float32))
                 if trial % 2 else None)
            Rq, tq = kabsch_umeyama(jnp.asarray(src), jnp.asarray(dst),
                                    w, method="quat")
            Rs, ts = kabsch_umeyama(jnp.asarray(src), jnp.asarray(dst),
                                    w, method="svd")
            np.testing.assert_allclose(np.asarray(Rq), np.asarray(Rs),
                                       atol=2e-5)
            np.testing.assert_allclose(np.asarray(tq), np.asarray(ts),
                                       atol=2e-4)

    def test_triad_minimal_solver(self):
        """triad_rigid (the RANSAC/GNC hypothesis generator): exact on
        noise-free minimal samples — equal to least-squares Kabsch —
        and finite (not NaN) on degenerate collinear triples."""
        from pose6d_tpu.solvers.kabsch import triad_rigid
        rng = np.random.default_rng(11)
        for _ in range(10):
            R = random_rotation(rng)
            t = rng.normal(size=3).astype(np.float32)
            src = rng.normal(size=(3, 3)).astype(np.float32)
            dst = (src @ R.T + t).astype(np.float32)
            Rt, tt = triad_rigid(jnp.asarray(src), jnp.asarray(dst))
            Rk, tk = kabsch_umeyama(jnp.asarray(src), jnp.asarray(dst))
            np.testing.assert_allclose(np.asarray(Rt), R, atol=1e-4)
            np.testing.assert_allclose(np.asarray(Rt), np.asarray(Rk),
                                       atol=1e-4)
            np.testing.assert_allclose(np.asarray(tt), t, atol=1e-4)
            # proper rotation
            assert abs(np.linalg.det(np.asarray(Rt)) - 1.0) < 1e-4
        # collinear triple: meaningless but finite output
        src = np.stack([np.zeros(3), np.ones(3), 2 * np.ones(3)]).astype(
            np.float32)
        Rt, tt = triad_rigid(jnp.asarray(src), jnp.asarray(src))
        assert np.all(np.isfinite(np.asarray(Rt)))
        assert np.all(np.isfinite(np.asarray(tt)))

    def test_matches_scipy_procrustes(self):
        from scipy.spatial.transform import Rotation
        rng = np.random.default_rng(2)
        src = rng.normal(size=(40, 3))
        dst = rng.normal(size=(40, 3))
        R2, t2 = kabsch_umeyama(jnp.asarray(src), jnp.asarray(dst))
        ref, _ = Rotation.align_vectors(dst - dst.mean(0), src - src.mean(0))
        assert rot_angle_deg(ref.as_matrix(), np.asarray(R2)) < 0.1


class TestRansac:
    def test_recovers_pose_with_outliers(self):
        rng = np.random.default_rng(0)
        R = random_rotation(rng)
        t = rng.normal(size=3) * 5
        n = 512
        src = rng.normal(size=(n, 3)).astype(np.float32) * 3
        dst = (src @ R.T + t).astype(np.float32)
        dst += rng.normal(size=dst.shape).astype(np.float32) * 0.01
        n_out = 300  # ~60% outliers
        out_idx = rng.choice(n, n_out, replace=False)
        dst[out_idx] = rng.normal(size=(n_out, 3)) * 8
        res = ransac_pose(jax.random.PRNGKey(0), jnp.asarray(src),
                          jnp.asarray(dst), jnp.ones(n, bool),
                          threshold=0.05, n_hypotheses=2048)
        assert bool(res["ok"])
        assert rot_angle_deg(R, np.asarray(res["R"])) < 1.0
        np.testing.assert_allclose(np.asarray(res["t"]), t, atol=0.05)
        # inlier set should mostly match ground truth
        inl = np.asarray(res["inliers"])
        true_inl = np.ones(n, bool); true_inl[out_idx] = False
        assert (inl == true_inl).mean() > 0.97

    @pytest.mark.slow
    def test_low_inlier_ratio_stress(self):
        """At the reference's real-data inlier ratios (~0.10, BASELINE.md)
        the adaptive confidence loop must keep drawing hypotheses until the
        standard RANSAC bound is met — the failure mode VERDICT r1 flagged
        for a fixed 8192-draw budget. With the minimal 3-point triad
        sampler the bound at IR=0.10, conf=0.999 is
        log(1e-3)/log(1-1e-3) ~= 6903 trials (eps^3 per-trial success —
        8x fewer than the old 4-point sampler needed for the same
        confidence). 5/5 recoveries here ~= >=99% success. n=1000 keeps
        the CPU-CI cost bounded; the trial bound (and its assertion
        below) depends only on the inlier *ratio*, not N."""
        rng = np.random.default_rng(0)
        R = random_rotation(rng)
        t = rng.normal(size=3) * 5
        n = 1000
        src = rng.normal(size=(n, 3)).astype(np.float32) * 3
        dst = (src @ R.T + t).astype(np.float32)
        dst += rng.normal(size=dst.shape).astype(np.float32) * 0.005
        out_idx = rng.choice(n, n - n // 10, replace=False)  # IR = 0.10
        dst[out_idx] = rng.normal(size=(len(out_idx), 3)).astype(
            np.float32) * 8
        srcj, dstj = jnp.asarray(src), jnp.asarray(dst)
        valid = jnp.ones(n, bool)
        for k in range(5):
            res = ransac_pose(jax.random.PRNGKey(100 + k), srcj, dstj,
                              valid, threshold=0.05)
            assert rot_angle_deg(R, np.asarray(res["R"])) < 2.0, f"key {k}"
            np.testing.assert_allclose(np.asarray(res["t"]), t, atol=0.1)
            # the budget must actually have scaled to the low ratio
            # (>= the 3-point 0.999-confidence bound, rounded to blocks)
            assert int(res["n_trials"]) >= 6903

    def test_adaptive_early_exit_on_clean_data(self):
        """High inlier ratio -> the confidence bound is met after the
        first block; no wasted trials (Open3D early-exit semantics)."""
        rng = np.random.default_rng(4)
        R = random_rotation(rng); t = rng.normal(size=3)
        src = rng.normal(size=(512, 3)).astype(np.float32)
        dst = (src @ R.T + t).astype(np.float32)
        res = ransac_pose(jax.random.PRNGKey(0), jnp.asarray(src),
                          jnp.asarray(dst), jnp.ones(512, bool),
                          threshold=0.05)
        assert rot_angle_deg(R, np.asarray(res["R"])) < 0.5
        assert int(res["n_trials"]) <= 1024  # one block

    def test_respects_validity_mask(self):
        rng = np.random.default_rng(1)
        R = random_rotation(rng); t = rng.normal(size=3)
        src = rng.normal(size=(256, 3)).astype(np.float32)
        dst = (src @ R.T + t).astype(np.float32)
        dst[128:] = 1e3  # garbage in padded region
        valid = np.arange(256) < 128
        res = ransac_pose(jax.random.PRNGKey(0), jnp.asarray(src),
                          jnp.asarray(dst), jnp.asarray(valid),
                          threshold=0.05, n_hypotheses=1024)
        assert rot_angle_deg(R, np.asarray(res["R"])) < 0.5
        assert not np.asarray(res["inliers"])[128:].any()


class TestGNC:
    def test_recovers_pose_with_outliers(self):
        rng = np.random.default_rng(0)
        R = random_rotation(rng)
        t = rng.normal(size=3) * 5
        n = 400
        src = rng.normal(size=(n, 3)).astype(np.float32) * 3
        dst = (src @ R.T + t).astype(np.float32)
        dst += rng.normal(size=dst.shape).astype(np.float32) * 0.01
        out_idx = rng.choice(n, 160, replace=False)  # 40% outliers
        dst[out_idx] = rng.normal(size=(160, 3)) * 8
        res = gnc_tls_pose(jnp.asarray(src), jnp.asarray(dst),
                           jnp.ones(n, bool), noise_bound=0.05,
                           key=jax.random.PRNGKey(0))
        assert rot_angle_deg(R, np.asarray(res["R"])) < 1.0
        np.testing.assert_allclose(np.asarray(res["t"]), t, atol=0.05)
        inl = np.asarray(res["inliers"])
        true_inl = np.ones(n, bool); true_inl[out_idx] = False
        assert (inl == true_inl).mean() > 0.95

    def test_clean_input_identity_weights(self):
        rng = np.random.default_rng(2)
        R = random_rotation(rng); t = rng.normal(size=3)
        src = rng.normal(size=(100, 3)).astype(np.float32)
        dst = (src @ R.T + t).astype(np.float32)
        res = gnc_tls_pose(jnp.asarray(src), jnp.asarray(dst),
                           jnp.ones(100, bool), noise_bound=0.05)
        assert int(res["n_inliers"]) == 100
        assert rot_angle_deg(R, np.asarray(res["R"])) < 0.1


class TestICP:
    def test_refines_perturbed_pose(self):
        rng = np.random.default_rng(0)
        R = random_rotation(rng); t = rng.normal(size=3) * 2
        src = rng.normal(size=(500, 3)).astype(np.float32)
        tgt = (src @ R.T + t).astype(np.float32)
        # perturb init by ~5 degrees + 0.05 offset
        from scipy.spatial.transform import Rotation
        dR = Rotation.from_rotvec(np.array([0.05, -0.04, 0.06])).as_matrix()
        R0 = (dR @ R).astype(np.float32)
        t0 = (t + 0.05).astype(np.float32)
        res = icp_point2point(jnp.asarray(src), jnp.ones(500, bool),
                              jnp.asarray(tgt), jnp.ones(500, bool),
                              jnp.asarray(R0), jnp.asarray(t0),
                              max_corr_dist=0.5, max_iter=30)
        assert rot_angle_deg(R, np.asarray(res["R"])) < 0.2
        np.testing.assert_allclose(np.asarray(res["t"]), t, atol=0.01)
        assert float(res["rmse"]) < 0.01

    @pytest.mark.slow
    def test_iteration_count_sufficient(self):
        """icp.py claims 50 fixed iterations match the reference's
        2000-iteration Open3D cap (test_RANSAC.py:445) because iterations
        past convergence are idempotent. Prove it: 50 vs 500 iterations on
        a partial-overlap fixture must agree to <0.1 deg / 1e-3*diam."""
        rng = np.random.default_rng(3)
        R = random_rotation(rng); t = rng.normal(size=3) * 2
        src = rng.normal(size=(800, 3)).astype(np.float32)
        # partial overlap: target sees only 60% of the source points
        sel = rng.permutation(800)[:480]
        tgt = (src[sel] @ R.T + t).astype(np.float32)
        tgt += rng.normal(size=tgt.shape).astype(np.float32) * 0.005
        from scipy.spatial.transform import Rotation
        dR = Rotation.from_rotvec(np.array([0.12, -0.1, 0.15])).as_matrix()
        R0 = (dR @ R).astype(np.float32)
        t0 = (t + 0.1).astype(np.float32)
        diam = float(np.linalg.norm(src.max(0) - src.min(0)))
        kw = dict(max_corr_dist=0.2 * diam)
        args = (jnp.asarray(src), jnp.ones(800, bool), jnp.asarray(tgt),
                jnp.ones(480, bool), jnp.asarray(R0), jnp.asarray(t0))
        r50 = icp_point2point(*args, max_iter=50, **kw)
        r500 = icp_point2point(*args, max_iter=500, **kw)
        assert rot_angle_deg(np.asarray(r50["R"]),
                             np.asarray(r500["R"])) < 0.1
        assert np.linalg.norm(np.asarray(r50["t"]) -
                              np.asarray(r500["t"])) < 1e-3 * diam

    def test_coarse_to_fine_matches_full_resolution(self):
        """coarse_stride=4 (the production pipeline default — early NN
        rounds against a strided model) must land on the same pose as
        all-full-resolution ICP: the fine tail re-establishes exact
        correspondences, so only the trajectory differs."""
        rng = np.random.default_rng(5)
        R = random_rotation(rng); t = rng.normal(size=3) * 2
        src = rng.normal(size=(512, 3)).astype(np.float32)
        sel = rng.permutation(512)[:300]
        tgt = (src[sel] @ R.T + t).astype(np.float32)
        from scipy.spatial.transform import Rotation
        dR = Rotation.from_rotvec(np.array([0.1, -0.08, 0.12])).as_matrix()
        R0 = (dR @ R).astype(np.float32)
        t0 = (t + 0.08).astype(np.float32)
        args = (jnp.asarray(src), jnp.ones(512, bool), jnp.asarray(tgt),
                jnp.ones(300, bool), jnp.asarray(R0), jnp.asarray(t0))
        kw = dict(max_corr_dist=0.5, max_iter=30)
        full = icp_point2point(*args, **kw)
        c2f = icp_point2point(*args, coarse_stride=4, fine_iters=5, **kw)
        assert rot_angle_deg(np.asarray(full["R"]),
                             np.asarray(c2f["R"])) < 0.5
        assert np.linalg.norm(np.asarray(full["t"])
                              - np.asarray(c2f["t"])) < 0.01

    def test_masked_targets(self):
        rng = np.random.default_rng(1)
        src = rng.normal(size=(200, 3)).astype(np.float32)
        tgt = np.concatenate([src, np.full((56, 3), 1e3, np.float32)])
        tv = np.arange(256) < 200
        res = icp_point2point(jnp.asarray(src), jnp.ones(200, bool),
                              jnp.asarray(tgt), jnp.asarray(tv),
                              jnp.eye(3), jnp.zeros(3),
                              max_corr_dist=0.5, max_iter=5)
        assert rot_angle_deg(np.eye(3), np.asarray(res["R"])) < 1e-3

    def test_partial_view_bias_and_cloud_to_model_fix(self):
        """Production refinement against a PARTIAL observed cloud.

        src=CAD -> tgt=partial-view ICP is biased: unobserved-side CAD
        points pair with the visible shell within the gate and drag the
        pose off the truth (measured ~2 cm z-drift from a GT init at
        production shapes). icp_cloud_to_model matches observed points
        onto the model instead and must stay at the true pose. The
        fixture is a camera-facing half of a unit sphere surface (one
        observed side), a dense full model cloud, and a GT init."""
        from pose6d_tpu.solvers import icp_cloud_to_model
        rng = np.random.default_rng(7)
        full = rng.normal(size=(1200, 3)).astype(np.float32)
        full /= np.linalg.norm(full, axis=1, keepdims=True)
        R = random_rotation(rng)
        t = np.array([0.3, -0.2, 5.0], np.float32)
        cam = (full @ R.T + t).astype(np.float32)
        vis = cam[:, 2] < np.median(cam[:, 2])   # camera-facing half
        pc = cam[vis]
        res = icp_cloud_to_model(
            jnp.asarray(full), jnp.ones(len(full), bool),
            jnp.asarray(pc), jnp.ones(len(pc), bool),
            jnp.asarray(R), jnp.asarray(t),
            max_corr_dist=0.4, max_iter=30)
        assert rot_angle_deg(R, np.asarray(res["R"])) < 1.0
        drift = np.linalg.norm(np.asarray(res["t"]) - t)
        assert drift < 0.02, drift
        # and the old direction really is biased on this fixture — the
        # regression this test exists to keep out
        old = icp_point2point(
            jnp.asarray(full), jnp.ones(len(full), bool),
            jnp.asarray(pc), jnp.ones(len(pc), bool),
            jnp.asarray(R), jnp.asarray(t),
            max_corr_dist=0.4, max_iter=30)
        old_drift = np.linalg.norm(np.asarray(old["t"]) - t)
        assert old_drift > 5 * drift, (old_drift, drift)


def make_fmap_problem(rng, v1=300, v2=150, k=30):
    """Shape-x with a known partial correspondence to shape-y via an
    orthonormal-aligned eigenbasis pair."""
    evecs_x = np.linalg.qr(rng.normal(size=(v1, k)))[0].astype(np.float32)
    perm = rng.permutation(v1)[:v2]  # each PC point j corresponds to CAD perm[j]
    evecs_y = evecs_x[perm] + rng.normal(size=(v2, k)).astype(np.float32) * 1e-3
    C = np.eye(k, dtype=np.float32)  # aligned bases -> identity map
    return evecs_x, evecs_y, C, perm


class TestFmap2Pointmap:
    def test_naive_recovers_correspondence(self):
        rng = np.random.default_rng(0)
        ex, ey, C, perm = make_fmap_problem(rng)
        pairs, valid = naive_fmap2pointmap(
            jnp.asarray(C), jnp.asarray(ex), jnp.asarray(ey),
            jnp.ones(300, bool), jnp.ones(150, bool))
        pairs = np.asarray(pairs)
        assert (pairs[0] == perm).mean() > 0.95
        assert (pairs[1] == np.arange(150)).all()

    def test_naive_respects_x_mask(self):
        rng = np.random.default_rng(1)
        ex, ey, C, perm = make_fmap_problem(rng)
        x_valid = np.ones(300, bool)
        x_valid[perm[0]] = False  # knock out the right answer for j=0
        pairs, _ = naive_fmap2pointmap(
            jnp.asarray(C), jnp.asarray(ex), jnp.asarray(ey),
            jnp.asarray(x_valid), jnp.ones(150, bool))
        assert np.asarray(pairs)[0, 0] != perm[0]

    def test_spatial_filtering_prunes_geometric_outliers(self):
        rng = np.random.default_rng(2)
        v1, v2, k = 256, 128, 30
        cad = rng.normal(size=(v1, 3)).astype(np.float32) * 2
        perm = rng.permutation(v1)[:v2]
        R = random_rotation(rng); t = rng.normal(size=3)
        pc = (cad[perm] @ R.T + t).astype(np.float32)
        evecs_x = np.linalg.qr(rng.normal(size=(v1, k)))[0].astype(np.float32)
        evecs_y = evecs_x[perm].copy()
        # corrupt the spectral embedding of 1/4 of PC points so their
        # top-1 spectral match is wrong but geometry exposes them
        bad = rng.choice(v2, v2 // 4, replace=False)
        evecs_y[bad] = np.linalg.qr(rng.normal(size=(v1, k)))[0][:len(bad)]
        diam = float(np.linalg.norm(cad.max(0) - cad.min(0)))
        pairs, valid = spatial_filtering_fmap2pointmap(
            jnp.eye(k), jnp.asarray(evecs_x), jnp.asarray(evecs_y),
            jnp.asarray(cad), jnp.asarray(pc),
            jnp.ones(v1, bool), jnp.ones(v2, bool), diam,
            k=5, row_subsample=0)
        pairs, valid = np.asarray(pairs), np.asarray(valid)
        assert valid.sum() > 0
        # surviving pairs must be geometrically consistent:
        # || cad_i - R^-1 (pc_j - t) || small
        pc_in_cad = (pc - t) @ R
        d = np.linalg.norm(cad[pairs[0]] - pc_in_cad[pairs[1]], axis=1)
        assert d[valid].mean() < 0.05 * diam
        # good pairs should dominate the survivors
        good_pair = np.isin(pairs[1], np.setdiff1d(np.arange(v2), bad))
        assert (good_pair[valid]).mean() > 0.9

    def test_spatial_filtering_tau_schedule_param(self):
        """taus: default matches the hardcoded reference schedule
        exactly; a looser final pair keeps a superset of survivors."""
        rng = np.random.default_rng(2)
        v1, v2, k = 256, 128, 30
        cad = rng.normal(size=(v1, 3)).astype(np.float32) * 2
        perm = rng.permutation(v1)[:v2]
        R = random_rotation(rng); t = rng.normal(size=3)
        pc = (cad[perm] @ R.T + t).astype(np.float32)
        evecs_x = np.linalg.qr(rng.normal(size=(v1, k)))[0].astype(np.float32)
        evecs_y = evecs_x[perm].copy()
        bad = rng.choice(v2, v2 // 4, replace=False)
        evecs_y[bad] = np.linalg.qr(rng.normal(size=(v1, k)))[0][:len(bad)]
        diam = float(np.linalg.norm(cad.max(0) - cad.min(0)))
        args = (jnp.eye(k), jnp.asarray(evecs_x), jnp.asarray(evecs_y),
                jnp.asarray(cad), jnp.asarray(pc),
                jnp.ones(v1, bool), jnp.ones(v2, bool), diam)
        p_def, v_def = spatial_filtering_fmap2pointmap(*args, k=5)
        p_exp, v_exp = spatial_filtering_fmap2pointmap(
            *args, k=5, taus=(0.3, 0.15, 0.055, 0.065))
        np.testing.assert_array_equal(np.asarray(p_def), np.asarray(p_exp))
        np.testing.assert_array_equal(np.asarray(v_def), np.asarray(v_exp))
        _, v_loose = spatial_filtering_fmap2pointmap(
            *args, k=5, taus=(0.3, 0.15, 0.2, 0.25))
        v_def, v_loose = np.asarray(v_def), np.asarray(v_loose)
        assert v_loose.sum() >= v_def.sum()
        assert np.all(v_loose[v_def])   # superset

    def test_spatial_filtering_end_to_end_with_ransac(self):
        rng = np.random.default_rng(3)
        v1, v2, k = 256, 128, 30
        cad = rng.normal(size=(v1, 3)).astype(np.float32) * 2
        perm = rng.permutation(v1)[:v2]
        R = random_rotation(rng); t = rng.normal(size=3)
        pc = (cad[perm] @ R.T + t).astype(np.float32)
        evecs_x = np.linalg.qr(rng.normal(size=(v1, k)))[0].astype(np.float32)
        evecs_y = evecs_x[perm].copy()
        diam = float(np.linalg.norm(cad.max(0) - cad.min(0)))
        pairs, valid = spatial_filtering_fmap2pointmap(
            jnp.eye(k), jnp.asarray(evecs_x), jnp.asarray(evecs_y),
            jnp.asarray(cad), jnp.asarray(pc),
            jnp.ones(v1, bool), jnp.ones(v2, bool), diam, k=5, row_subsample=0)
        src = jnp.asarray(cad)[pairs[0]]
        dst = jnp.asarray(pc)[pairs[1]]
        res = ransac_pose(jax.random.PRNGKey(0), src, dst, valid,
                          threshold=0.05 * diam, n_hypotheses=1024)
        assert rot_angle_deg(R, np.asarray(res["R"])) < 2.0
        np.testing.assert_allclose(np.asarray(res["t"]), t, atol=0.1)


class TestRankMajorBranchParity:
    """The TPU rank-major fast path of the spatial filter, forced on
    CPU via rank_major=True (Pallas interpret mode), must match the
    PC-major path bit-for-bit on pairs and exactly on the survivor
    mask — this covers the whole solver-level branch (gather
    reordering, y_valid tiling, the (k, v2) -> PC-major reshape), not
    just the kernel (ADVICE r4 medium)."""

    def test_forced_rank_major_matches_pc_major(self):
        rng = np.random.default_rng(11)
        v1, v2, k = 256, 128, 30
        cad = rng.normal(size=(v1, 3)).astype(np.float32) * 2
        perm = rng.permutation(v1)[:v2]
        R = random_rotation(rng); t = rng.normal(size=3)
        pc = (cad[perm] @ R.T + t).astype(np.float32)
        evecs_x = np.linalg.qr(
            rng.normal(size=(v1, k)))[0].astype(np.float32)
        evecs_y = evecs_x[perm].copy()
        # corrupt some rows so the pruning rounds actually discriminate
        bad = rng.choice(v2, 40, replace=False)
        evecs_y[bad] = np.linalg.qr(
            rng.normal(size=(v1, k)))[0][:len(bad)]
        diam = float(np.linalg.norm(cad.max(0) - cad.min(0)))
        y_valid = np.ones(v2, bool)
        y_valid[rng.choice(v2, 9, replace=False)] = False  # padding rows
        args = (jnp.eye(k), jnp.asarray(evecs_x), jnp.asarray(evecs_y),
                jnp.asarray(cad), jnp.asarray(pc),
                jnp.ones(v1, bool), jnp.asarray(y_valid), diam)
        p_pc, v_pc = spatial_filtering_fmap2pointmap(
            *args, k=5, rank_major=False)
        p_rm, v_rm = spatial_filtering_fmap2pointmap(
            *args, k=5, rank_major=True)
        np.testing.assert_array_equal(np.asarray(p_pc), np.asarray(p_rm))
        np.testing.assert_array_equal(np.asarray(v_pc), np.asarray(v_rm))
        assert 0 < int(np.asarray(v_pc).sum()) < 5 * v2


class TestRowSubsampleValidation:
    """row_subsample was shipped as the spatial filter's default in
    round 1 without validation. Measured here at production shapes
    (V1=5120, V2=2048, k=5): its pair-survival agreement with the exact
    all-rows consistency mean (the reference's semantics,
    spacial_filtering.py:51-75) is only ~0.68 in the high-inlier regime
    and ~0.93 at low inlier ratios — NOT equivalent. The default is
    therefore exact (row_subsample=0); the knob remains an explicit
    opt-in screening approximation. These tests pin both the default
    and the measured divergence so a future "turn it back on" needs to
    re-justify itself."""

    def _make_case(self, corrupt_frac, seed):
        rng = np.random.default_rng(seed)
        v1, v2, k = 5120, 2048, 30
        cad = rng.normal(size=(v1, 3)).astype(np.float32) * 2
        perm = rng.permutation(v1)[:v2]
        R = random_rotation(rng); t = rng.normal(size=3)
        pc = (cad[perm] @ R.T + t).astype(np.float32)
        evecs_x = np.linalg.qr(
            rng.normal(size=(v1, k)))[0].astype(np.float32)
        evecs_y = evecs_x[perm].copy()
        bad = rng.choice(v2, int(v2 * corrupt_frac), replace=False)
        evecs_y[bad] = np.linalg.qr(
            rng.normal(size=(v1, k)))[0][:len(bad)]
        diam = float(np.linalg.norm(cad.max(0) - cad.min(0)))
        good = np.setdiff1d(np.arange(v2), bad)
        return cad, pc, evecs_x, evecs_y, diam, good

    def _run(self, case, row_subsample):
        cad, pc, ex, ey, diam, good = case
        v1, v2 = cad.shape[0], pc.shape[0]
        pairs, valid = spatial_filtering_fmap2pointmap(
            jnp.eye(ex.shape[1]), jnp.asarray(ex), jnp.asarray(ey),
            jnp.asarray(cad), jnp.asarray(pc),
            jnp.ones(v1, bool), jnp.ones(v2, bool), diam,
            k=5, row_subsample=row_subsample)
        return np.asarray(pairs), np.asarray(valid)

    def test_default_is_exact(self):
        """The shipping default must be the reference's exact filter."""
        import inspect
        sig = inspect.signature(spatial_filtering_fmap2pointmap.__wrapped__)
        assert sig.parameters["row_subsample"].default == 0

    @pytest.mark.parametrize("corrupt_frac,regime,min_agree",
                             [(0.1, "high_ir", 0.65), (0.9, "low_ir", 0.90)])
    @pytest.mark.slow
    def test_subsample_divergence_is_as_measured(self, corrupt_frac, regime,
                                                 min_agree):
        """Characterization: the subsampled screen differs from exact by
        roughly the measured amount (catching silent semantic drift in
        either path), and candidate indices are identical — only the
        validity decisions differ."""
        case = self._make_case(corrupt_frac, seed=7)
        pairs_e, valid_e = self._run(case, row_subsample=0)
        pairs_s, valid_s = self._run(case, row_subsample=2048)
        np.testing.assert_array_equal(pairs_e, pairs_s)
        agreement = (valid_e == valid_s).mean()
        assert min_agree < agreement < 0.995, (regime, agreement)
        assert valid_e.sum() > 0
