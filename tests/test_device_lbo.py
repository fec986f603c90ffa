import numpy as np
import jax.numpy as jnp

from pose6d_tpu.spectral.device_lbo import device_pc_operators

from test_spectral import icosphere


class TestDeviceLBO:
    def test_sphere_spectrum_structure(self):
        verts, _ = icosphere(2)  # 162 pts
        V = 256
        pts = np.zeros((V, 3), np.float32)
        pts[:len(verts)] = verts
        valid = np.arange(V) < len(verts)
        mass, evals, evecs = device_pc_operators(
            jnp.asarray(pts), jnp.asarray(valid), k_eig=10, iters=200)
        evals = np.asarray(evals)
        # LBO sphere spectrum: 0, then triple, then quintuple; the
        # graph-Laplacian family preserves structure with a mild global
        # scale factor.
        assert evals[0] < 0.1 * evals[1]
        l1 = evals[1:4]
        l2 = evals[4:9]
        assert np.std(l1) / np.mean(l1) < 0.05
        assert np.std(l2) / np.mean(l2) < 0.05
        ratio = np.mean(l2) / np.mean(l1)
        assert 2.5 < ratio < 3.5  # exact LBO: 3.0

    def test_mass_orthonormal_and_padded_zero(self):
        verts, _ = icosphere(2)
        V = 256
        pts = np.zeros((V, 3), np.float32)
        pts[:len(verts)] = verts
        valid = np.arange(V) < len(verts)
        mass, evals, evecs = device_pc_operators(
            jnp.asarray(pts), jnp.asarray(valid), k_eig=8, iters=150)
        m = np.asarray(mass)
        e = np.asarray(evecs)
        G = e.T @ (m[:, None] * e)
        np.testing.assert_allclose(G, np.eye(8), atol=1e-3)
        assert np.abs(e[len(verts):]).max() == 0.0
        assert (m[len(verts):] == 0).all()

    def test_padding_invariance(self):
        verts, _ = icosphere(2)
        def run(V):
            pts = np.zeros((V, 3), np.float32)
            pts[:len(verts)] = verts
            valid = np.arange(V) < len(verts)
            return device_pc_operators(jnp.asarray(pts),
                                       jnp.asarray(valid), k_eig=6,
                                       iters=150)
        _, ev1, _ = run(192)
        _, ev2, _ = run(256)
        np.testing.assert_allclose(np.asarray(ev1), np.asarray(ev2),
                                   rtol=0.05, atol=0.05)


class TestPredictorAPI:
    def test_online_predict_smoke(self, tmp_path):
        """End-to-end online-mode predict on a rasterized frame with an
        untrained model: pipeline must run and produce a finite rigid
        pose."""
        from scipy.spatial.transform import Rotation
        import jax
        from bop_fixture import write_bop_scene
        from pose6d_tpu.api import Predictor
        from pose6d_tpu.data import read_ply
        from pose6d_tpu.data.decimate import decimate_mesh
        from pose6d_tpu.data.bop import BOPSceneDataset
        from pose6d_tpu.models import DPFMConfig, DPFMNet
        from pose6d_tpu.spectral import mesh_operators

        m = read_ply(
            "/root/reference/sample-data/lm/models_eval/obj_000001.ply")
        v, f = decimate_mesh(m["verts"], m["faces"], 1000)
        R = Rotation.from_rotvec([0.2, -0.1, 0.3]).as_matrix()
        t = np.array([10.0, -5.0, 700.0])
        diam = float(np.linalg.norm(v.max(0) - v.min(0)))
        write_bop_scene(tmp_path, "s", {"verts": v, "faces": f}, 3, R, t,
                        diam)
        frame = BOPSceneDataset(tmp_path, "s")[0]

        cad_ops = mesh_operators(v * 0.1, f, k_eig=64)
        cad_dict = {"xyz": cad_ops.xyz, "mass": cad_ops.mass,
                    "evals": cad_ops.evals, "evecs": cad_ops.evecs}
        model = DPFMNet(DPFMConfig())
        dummy = {
            "xyz": jnp.zeros((8, 3)), "mass": jnp.ones(8),
            "evals": jnp.ones(64), "evecs": jnp.zeros((8, 64)),
            "valid": jnp.ones(8, bool)}
        params = model.init(jax.random.PRNGKey(0), dummy, dummy)
        pred = Predictor(params, {3: cad_dict}, mode="online",
                         v_cad=640, v_pc=512, max_pc=500,
                         ransac_hypotheses=512, icp_iters=5,
                         lobpcg_iters=30)
        K = np.asarray(frame["camera"]["cam_K"]).reshape(3, 3)
        mask = frame["seg"][0] == 255
        res = pred.predict(frame["depth"], K,
                           frame["camera"]["depth_scale"], [mask], [3])[0]
        assert res["R"].shape == (3, 3)
        assert np.isfinite(res["R"]).all() and np.isfinite(res["t"]).all()
        assert abs(np.linalg.det(res["R"]) - 1) < 1e-3
        assert res["n_inliers"] >= 0

        # candidate-selection mode: rotation TTA + ZoomOut unroll into
        # the same single jitted program; winner index is reported
        pred2 = Predictor(params, {3: cad_dict}, mode="online",
                          v_cad=640, v_pc=512, max_pc=500,
                          ransac_hypotheses=512, icp_iters=5,
                          lobpcg_iters=30, tta_rotations=2, zoomout_k=64)
        res2 = pred2.predict(frame["depth"], K,
                             frame["camera"]["depth_scale"],
                             [mask], [3])[0]
        assert res2["R"].shape == (3, 3)
        assert np.isfinite(res2["R"]).all()
        assert abs(np.linalg.det(res2["R"]) - 1) < 1e-3
        assert 0 <= int(res2["candidate"]) < 3
