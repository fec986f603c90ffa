"""End-to-end integration: synthetic BOP scene -> cache -> train steps ->
eval + result export -> pose stage txt/ply outputs."""
import numpy as np
import pytest

from bop_fixture import write_bop_scene


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    from scipy.spatial.transform import Rotation
    from pose6d_tpu.data import read_ply
    from pose6d_tpu.data.decimate import decimate_mesh
    from pose6d_tpu.data.synth import write_bop_scene as write_multi
    root = tmp_path_factory.mktemp("e2e")
    m = read_ply("/root/reference/sample-data/lm/models_eval/obj_000001.ply")
    v, f = decimate_mesh(m["verts"], m["faces"], 1500)
    diam = float(np.linalg.norm(v.max(0) - v.min(0)))
    rng = np.random.default_rng(0)
    poses = []
    for k in range(4):
        R = Rotation.from_rotvec(rng.normal(size=3) * 0.4).as_matrix()
        t = np.array([rng.uniform(-20, 20), rng.uniform(-20, 20),
                      rng.uniform(950, 1150)])
        poses.append((R, t))
    write_multi(root, "synth", {"verts": v, "faces": f}, obj_id=1,
                poses=poses, diameter_mm=diam)
    return root


@pytest.fixture(scope="module")
def cfg(synth_root, tmp_path_factory):
    import yaml
    from pose6d_tpu.config import load_config
    out = tmp_path_factory.mktemp("cfg")
    doc = {
        "data_root": str(synth_root),
        "cache_dir": str(synth_root / "cache"),
        "logging_dir": str(out / "logs"),
        "save_results": str(out / "results"),
        "train": {"batch_size": 2, "epochs": 2, "checkpoint_interval": 1,
                  "checkpoint_every_steps": 3, "log_interval": 10,
                  "num_threads": 2},
        "loss": {"nce_num_pairs": 64},
        "eval": {"batch_size": 2},
        "train_datasets": [{"render_data_name": "synth"}],
        "eval_dataset": {"render_data_name": "synth"},
    }
    p = out / "cfg.yaml"
    p.write_text(yaml.safe_dump(doc))
    c = load_config(p)
    c._yaml_path = str(p)
    return c


SAMPLE_KW = {"v_cad": 1024, "v_pc": 512, "nce_pairs": 512}


class TestConfig:
    def test_reference_yaml_model_block(self, cfg):
        assert cfg.model.n_fmap == 30
        assert cfg.model.lambda_ == 100
        assert cfg.train.batch_size == 2

    def test_overrides(self, synth_root, tmp_path):
        import yaml
        from pose6d_tpu.config import load_config
        p = tmp_path / "c.yaml"
        p.write_text(yaml.safe_dump({"data_root": "x"}))
        c = load_config(p, ["train.lr=0.001", "eval.pose_solver=gnc"])
        assert c.train.lr == 0.001
        assert c.eval.pose_solver == "gnc"


class TestEndToEnd:
    def test_train_eval_pose(self, cfg):
        from pose6d_tpu.train.loop import build_train_dataset, train
        from pose6d_tpu.train.eval_loop import evaluate
        from pose6d_tpu.train.pose_stage import run_pose_stage
        from pathlib import Path

        ds = build_train_dataset(cfg)
        assert len(ds) == 4
        state = train(cfg, dataset=ds, max_steps=4, sample_kw=SAMPLE_KW)
        assert int(state.step) == 4

        # checkpoint was written and can resume
        logs = sorted(Path(cfg.logging_dir).iterdir())
        assert any((d / "ckpt").exists() for d in logs)
        # step-based cadence fired mid-epoch (checkpoint_every_steps=3,
        # steps_per_epoch=2): a killed chained window loses at most that
        # many steps
        names = [p.name for d in logs if (d / "ckpt").exists()
                 for p in (d / "ckpt").iterdir()]
        assert "ckpt_00000003.msgpack" in names

        mean_ir, per_obj = evaluate(cfg, state.params, dataset=ds,
                                    sample_kw=SAMPLE_KW)
        assert 0.0 <= mean_ir <= 1.0
        assert 1 in per_obj
        results = sorted(Path(cfg.save_results).glob("result_*.npz"))
        assert len(results) == 4
        r = dict(np.load(results[0]))
        assert r["p_pred"].shape[1] == 2
        assert r["C_pred"].shape == (30, 30)

        acc = run_pose_stage(cfg.save_results, Path(cfg.save_results).parent,
                             solver="ransac", ransac_hypotheses=512,
                             icp_max_iter=10)
        base = Path(cfg.save_results).parent / "results_poses_RANSAC"
        assert (base / "avg_results.txt").exists()
        txts = list((base / "results").glob("obj_1_result_*.txt"))
        assert len(txts) == 4
        content = txts[0].read_text()
        assert "Add-S Score ICP:" in content
        assert "T_pred_ICP" in content
        # ply dumps
        plys = list((base / "ply").rglob("*.ply"))
        assert len(plys) >= 16
        # avg_results format matches the reference's line structure
        avg = (base / "avg_results.txt").read_text().splitlines()
        assert len(avg) == 15 * 4
        assert avg[0].startswith("Average for obj_1_add_score:")

    def test_ir_extraction_cli(self, cfg):
        from pathlib import Path
        from pose6d_tpu.cli.ir_extraction import \
            calculate_average_inlier_ratio
        base = Path(cfg.save_results).parent / "results_poses_RANSAC"
        per_obj = calculate_average_inlier_ratio(base / "results")
        assert 1 in per_obj and len(per_obj[1]) == 4

    def test_visualize_cli(self, cfg, tmp_path):
        from pathlib import Path
        from pose6d_tpu.cli.visualize import (draw_correspondences,
                                              draw_features)
        results = sorted(Path(cfg.save_results).glob("result_*.npz"))
        draw_correspondences(results[0], tmp_path / "viz")
        draw_features(results[0], tmp_path / "viz")
        assert (tmp_path / "viz" / "correspondences.ply").exists()
        assert (tmp_path / "viz" / "cad_overlap.ply").exists()

    def test_gnc_pose_stage(self, cfg):
        from pathlib import Path
        from pose6d_tpu.train.pose_stage import run_pose_stage
        run_pose_stage(cfg.save_results, Path(cfg.save_results).parent,
                       solver="gnc", icp_max_iter=5, write_ply=False)
        base = Path(cfg.save_results).parent / "results_poses_GNC"
        assert (base / "avg_results.txt").exists()

    def test_pose_stage_disambiguate(self, cfg):
        """Flip disambiguation in the protocol path: the eval npzs carry
        K, the stage inserts the depth-render hypothesis ranking between
        solver and ICP, and the txt records the chosen hypothesis."""
        from pathlib import Path
        from pose6d_tpu.train.pose_stage import run_pose_stage
        results = sorted(Path(cfg.save_results).glob("result_*.npz"))
        r = dict(np.load(results[0]))
        assert "K" in r and float(np.abs(r["K"]).sum()) > 0
        run_pose_stage(cfg.save_results, Path(cfg.save_results).parent,
                       solver="ransac", ransac_hypotheses=512,
                       icp_max_iter=10, write_ply=False,
                       disambiguate=True, name_suffix="_disamb")
        base = (Path(cfg.save_results).parent
                / "results_poses_RANSAC_disamb")
        assert (base / "avg_results.txt").exists()
        txts = sorted((base / "results").glob("obj_1_result_*.txt"))
        assert txts and all("Flip hypothesis:" in t.read_text()
                            for t in txts)

    def test_probe_ckpts(self, cfg, tmp_path, monkeypatch, capsys):
        """Checkpoint-curve probe CLI: sweeps the kept checkpoints from
        the train run against a held-out eval set in one process and
        reports the best step by mean IR."""
        import json
        import sys
        from pathlib import Path
        from pose6d_tpu.cli.probe_ckpts import main as probe_main
        runs = [d for d in sorted(Path(cfg.logging_dir).iterdir())
                if (d / "ckpt").exists()]
        assert runs
        out = tmp_path / "probe.jsonl"
        monkeypatch.setattr(sys, "argv", [
            "probe_ckpts", "--config", str(cfg._yaml_path),
            "--run", str(runs[0]),
            "--eval-names", cfg.eval_dataset.render_data_name,
            "--pad-cad", "1024", "--pad-pc", "512",
            "--out", str(out)])
        probe_main()
        lines = [json.loads(x) for x in out.read_text().splitlines()]
        assert lines and "best_step" in lines[-1]
        assert all(0.0 <= r["mean_ir"] <= 1.0 for r in lines[:-1])

    def test_gradient_features_e2e(self, cfg):
        """with_gradient_features=True from config through real data:
        the dataset builds + caches gather-form gradient operators and
        the train step runs (VERDICT r2: this path used to crash at the
        first batch because the data path never built gradients)."""
        import dataclasses
        from pose6d_tpu.train.loop import build_train_dataset, train
        gcfg = dataclasses.replace(cfg)
        gcfg.model = dataclasses.replace(cfg.model,
                                         with_gradient_features=True)
        ds = build_train_dataset(gcfg)
        cad, pc, _ = ds[0]
        assert "grad_idx" in cad and "grad_idx" in pc
        state = train(gcfg, dataset=ds, max_steps=2, sample_kw=SAMPLE_KW)
        assert int(state.step) == 2


class TestSWA:
    """cli/swa.py checkpoint averaging (beyond-reference feature)."""

    def test_average_is_elementwise_mean_and_loads(self, tmp_path):
        import numpy as np
        from flax import serialization
        from pose6d_tpu.cli.swa import average_checkpoints, select_paths
        ck = tmp_path / "ckpt"
        ck.mkdir()
        trees = []
        for s, scale in ((100, 1.0), (200, 3.0)):
            tree = {"params": {"dense": {"kernel":
                                         np.full((2, 2), scale,
                                                 np.float32),
                                         "bias": np.ones(2, np.float32)
                                         * scale}},
                    "step": s}
            (ck / f"ckpt_{s:08d}.msgpack").write_bytes(
                serialization.msgpack_serialize(tree))
            trees.append(tree)
        paths = select_paths(tmp_path, 0, 10**9)
        assert len(paths) == 2
        avg = average_checkpoints(paths)
        np.testing.assert_allclose(avg["dense"]["kernel"],
                                   np.full((2, 2), 2.0))
        np.testing.assert_allclose(avg["dense"]["bias"], [2.0, 2.0])
        # window selection
        assert len(select_paths(tmp_path, 150, 10**9)) == 1

    def test_mismatched_trees_rejected(self, tmp_path):
        import numpy as np
        import pytest
        from flax import serialization
        from pose6d_tpu.cli.swa import average_checkpoints
        ck = tmp_path / "ckpt"
        ck.mkdir()
        a = ck / "ckpt_00000001.msgpack"
        b = ck / "ckpt_00000002.msgpack"
        a.write_bytes(serialization.msgpack_serialize(
            {"params": {"w": np.ones(2, np.float32)}}))
        b.write_bytes(serialization.msgpack_serialize(
            {"params": {"v": np.ones(2, np.float32)}}))
        with pytest.raises(ValueError):
            average_checkpoints([a, b])
