"""Serving export (pose6d_tpu/serving.py): the online depth->pose
pipeline frozen to a StableHLO artifact must (a) roundtrip through
serialize/deserialize, (b) reproduce the live Predictor's pose exactly
(same program, weights baked as constants), and (c) admit
cross-platform (tpu+cpu) export from a CPU host."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from bop_fixture import write_bop_scene


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    from scipy.spatial.transform import Rotation
    from pose6d_tpu.api import Predictor
    from pose6d_tpu.data import read_ply
    from pose6d_tpu.data.bop import BOPSceneDataset
    from pose6d_tpu.data.decimate import decimate_mesh
    from pose6d_tpu.models import DPFMConfig, DPFMNet
    from pose6d_tpu.spectral import mesh_operators

    tmp = tmp_path_factory.mktemp("serving")
    m = read_ply("/root/reference/sample-data/lm/models_eval/obj_000001.ply")
    v, f = decimate_mesh(m["verts"], m["faces"], 600)
    R = Rotation.from_rotvec([0.2, -0.1, 0.3]).as_matrix()
    t = np.array([10.0, -5.0, 700.0])
    diam = float(np.linalg.norm(v.max(0) - v.min(0)))
    write_bop_scene(tmp, "s", {"verts": v, "faces": f}, 3, R, t, diam)
    frame = BOPSceneDataset(tmp, "s")[0]

    ops = mesh_operators(v * 0.1, f, k_eig=32)
    cad = {"xyz": ops.xyz, "mass": ops.mass, "evals": ops.evals,
           "evecs": ops.evecs}
    model = DPFMNet(DPFMConfig(k_eig=32))
    dummy = {"xyz": jnp.zeros((8, 3)), "mass": jnp.ones(8),
             "evals": jnp.ones(32), "evecs": jnp.zeros((8, 32)),
             "valid": jnp.ones(8, bool)}
    params = model.init(jax.random.PRNGKey(0), dummy, dummy)
    pred = Predictor(params, {3: cad}, cfg=DPFMConfig(k_eig=32),
                     mode="online", v_cad=640, v_pc=256, max_pc=250,
                     ransac_hypotheses=256, icp_iters=3, lobpcg_iters=20)
    return pred, frame


class TestServingExport:
    def test_roundtrip_matches_live_predictor(self, setup):
        from pose6d_tpu.serving import export_predictor, load_exported
        pred, frame = setup
        K = np.asarray(frame["camera"]["cam_K"]).reshape(3, 3)
        mask = frame["seg"][0] == 255
        H, W = frame["depth"].shape
        blob = export_predictor(pred, 3, (H, W))
        assert len(blob) > 10_000
        fn = load_exported(blob)
        cam_scale = 1000.0 / frame["camera"]["depth_scale"]
        out = fn(jnp.asarray(frame["depth"], jnp.float32),
                 jnp.asarray(K, jnp.float32), jnp.float32(cam_scale),
                 jnp.asarray(mask), jax.random.PRNGKey(0))
        live = pred.predict(frame["depth"], K,
                            frame["camera"]["depth_scale"],
                            [mask], [3])[0]
        np.testing.assert_allclose(np.asarray(out["R"]), live["R"],
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(out["t"]), live["t"],
                                   atol=1e-4)
        assert abs(float(jnp.linalg.det(out["R"])) - 1) < 1e-3

    def test_cross_platform_artifact_builds_and_runs_on_cpu(self, setup):
        from pose6d_tpu.serving import export_predictor, load_exported
        pred, frame = setup
        K = np.asarray(frame["camera"]["cam_K"]).reshape(3, 3)
        mask = frame["seg"][0] == 255
        H, W = frame["depth"].shape
        blob = export_predictor(pred, 3, (H, W), platforms=("tpu", "cpu"))
        out = load_exported(blob)(
            jnp.asarray(frame["depth"], jnp.float32),
            jnp.asarray(K, jnp.float32),
            jnp.float32(1000.0 / frame["camera"]["depth_scale"]),
            jnp.asarray(mask), jax.random.PRNGKey(0))
        assert bool(jnp.isfinite(out["R"]).all())

    def test_cached_mode_refused(self, setup):
        from pose6d_tpu.api import Predictor
        from pose6d_tpu.serving import export_predictor
        pred, _ = setup
        bank = pred.cad_bank[3]
        cached = Predictor(pred.params,
                           {3: {"xyz": np.asarray(bank["xyz"])[:600],
                                "mass": np.asarray(bank["mass"])[:600],
                                "evals": np.asarray(bank["evals"]),
                                "evecs": np.asarray(bank["evecs"])[:600]}},
                           cfg=pred.cfg, mode="cached", v_cad=640)
        with pytest.raises(AssertionError):
            export_predictor(cached, 3, (64, 64))
