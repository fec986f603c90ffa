"""Batched pose-stage edge cases (train/pose_stage.py chunking).

The e2e suite drives the happy path at full pads; these tests pin the
chunking contract at tiny pads: remainder chunks, empty-correspondence
skip, frames without intrinsics falling back to the raw solver pose,
and minority image sizes being excluded from disambiguation rather
than forcing a second program.
"""
import numpy as np
import pytest

# three compiled chunk programs (~30 s CPU) — keep out of the default
# window; the e2e suite still covers the batched happy path
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def tiny_pose_stage(monkeypatch_module, tmp_path_factory):
    import pose6d_tpu.train.pose_stage as ps
    monkeypatch_module.setattr(ps, "PAIR_PAD", 128)
    monkeypatch_module.setattr(ps, "PT_PAD", 128)
    return ps


@pytest.fixture(scope="module")
def monkeypatch_module():
    mp = pytest.MonkeyPatch()
    yield mp
    mp.undo()


def _write_results(res_dir, n=5, with_k=None, hw=None, empty=()):
    """n synthetic exact-pose instances; with_k[i]=False drops K,
    hw[i] overrides im_hw, i in empty gets zero correspondences."""
    rng = np.random.RandomState(0)
    K = np.array([[572.4, 0, 325], [0, 573.6, 242], [0, 0, 1]],
                 np.float32)
    for i in range(n):
        cad = rng.randn(100, 3).astype(np.float32)
        R, _ = np.linalg.qr(rng.randn(3, 3))
        R = R.astype(np.float32)
        if np.linalg.det(R) < 0:
            R[:, 0] *= -1
        t = np.array([0, 0, 100], np.float32)
        pc = cad @ R.T + t
        P = (np.zeros((0, 2), np.int64) if i in empty
             else np.stack([np.arange(80), np.arange(80)], 1))
        kw = {}
        if with_k is None or with_k[i]:
            kw["K"] = K
        kw["im_hw"] = np.asarray(hw[i] if hw else (480, 640))
        np.savez(res_dir / f"result_{i:06d}.npz", obj_id=1, cad_xyz=cad,
                 pcd_depth=pc, diam_cad=2.0, p_pred=P, R_m2c=R, t_m2c=t,
                 ir=0.8, C_pred=np.eye(30, dtype=np.float32), **kw)


class TestBatchedPoseStage:
    def test_remainder_chunk_and_empty_skip(self, tiny_pose_stage,
                                            tmp_path):
        """5 instances at batch=3 -> one full + one remainder chunk;
        the empty-P instance is skipped like the reference's guard."""
        ps = tiny_pose_stage
        res = tmp_path / "res"
        res.mkdir()
        _write_results(res, n=5, empty={2})
        acc = ps.run_pose_stage(res, tmp_path / "out", solver="ransac",
                                ransac_hypotheses=128, icp_max_iter=3,
                                write_ply=False, batch=3)
        scores = acc["obj_1_adds_score"]
        assert len(scores) == 4          # instance 2 skipped
        assert np.mean(scores) > 0.9     # exact poses recovered
        txts = sorted((tmp_path / "out" / "results_poses_RANSAC"
                       / "results").glob("*.txt"))
        names = [t.name for t in txts]
        assert "obj_1_result_2.txt" not in names
        assert len(names) == 4

    def test_missing_k_falls_back_in_same_chunk(self, tiny_pose_stage,
                                                tmp_path):
        """Disambiguation: frames without K keep the raw solver pose
        (hypothesis -1) inside the same compiled chunk."""
        ps = tiny_pose_stage
        res = tmp_path / "res"
        res.mkdir()
        _write_results(res, n=3, with_k=[True, False, True])
        ps.run_pose_stage(res, tmp_path / "out", solver="ransac",
                          ransac_hypotheses=128, icp_max_iter=3,
                          write_ply=False, disambiguate=True, batch=3)
        rd = tmp_path / "out" / "results_poses_RANSAC" / "results"
        t0 = (rd / "obj_1_result_0.txt").read_text()
        t1 = (rd / "obj_1_result_1.txt").read_text()
        assert "Flip hypothesis:" in t0
        assert "Flip hypothesis:" not in t1   # fell back, hyp = -1

    def test_minority_image_size_excluded(self, tiny_pose_stage,
                                          tmp_path):
        """A frame whose im_hw differs from the majority is excluded
        from disambiguation (single evidence-image shape per tree)."""
        ps = tiny_pose_stage
        res = tmp_path / "res"
        res.mkdir()
        _write_results(res, n=3,
                       hw=[(480, 640), (480, 640), (240, 320)])
        ps.run_pose_stage(res, tmp_path / "out", solver="ransac",
                          ransac_hypotheses=128, icp_max_iter=3,
                          write_ply=False, disambiguate=True, batch=3)
        rd = tmp_path / "out" / "results_poses_RANSAC" / "results"
        assert "Flip hypothesis:" in (rd / "obj_1_result_0.txt").read_text()
        assert "Flip hypothesis:" not in (
            rd / "obj_1_result_2.txt").read_text()
