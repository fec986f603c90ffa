"""Config-space parity: the reference's model variants.

The shipped reference config runs with_gradient_features=False and
attention_type="normal" (models/dpfm.py:22-30, config/dpfm_orig.yaml),
but its config space exposes gradient-feature DiffusionNet
(models/dpfm.py:28-29), attention_type="double"
(modeling/dpfm.py:75-131) and subsampled cross-attention with
nn_interpolate (modeling/dpfm.py:100-118 — broken upstream at ratio<1,
working here). These tests pin each variant's forward, masking, and
numerics.
"""
import jax
import jax.numpy as jnp
import numpy as np

from pose6d_tpu.models import DPFMConfig, DPFMNet
from pose6d_tpu.models.attention import nn_interpolate
from pose6d_tpu.models.diffusion_net import DiffusionNet

from tests.test_models import make_shape


def add_toy_grads(shape, rng, kn=8):
    """Attach random zero-row-sum gather-gradient ops to a shape dict."""
    v = shape["xyz"].shape[0]
    idx = rng.integers(0, v, size=(v, kn)).astype(np.int32)
    idx[:, 0] = np.arange(v)
    cx = rng.normal(size=(v, kn)).astype(np.float32) * 0.1
    cy = rng.normal(size=(v, kn)).astype(np.float32) * 0.1
    cx[:, 0] -= cx.sum(axis=1)  # rows sum to zero like a true gradient
    cy[:, 0] -= cy.sum(axis=1)
    valid = np.asarray(shape["valid"])
    cx[~valid] = 0.0
    cy[~valid] = 0.0
    out = dict(shape)
    out["grad_idx"] = jnp.asarray(idx)
    out["grad_cx"] = jnp.asarray(cx)
    out["grad_cy"] = jnp.asarray(cy)
    return out


class TestGradientFeatures:
    def _model(self, **kw):
        cfg = DPFMConfig(with_gradient_features=True, **kw)
        return DPFMNet(cfg)

    def test_forward_shapes_and_masking(self):
        rng = np.random.default_rng(0)
        cad = add_toy_grads(make_shape(rng, 256, 200), rng)
        pc = add_toy_grads(make_shape(rng, 128, 100), rng)
        model = self._model()
        params = model.init(jax.random.PRNGKey(0), cad, pc)
        out = model.apply(params, cad, pc)
        assert out["C"].shape == (30, 30)
        for v in jax.tree_util.tree_leaves(out):
            assert np.isfinite(np.asarray(v)).all()
        assert (np.asarray(out["ref_feat1"])[200:] == 0).all()

    def test_gradient_params_exist_and_receive_grads(self):
        rng = np.random.default_rng(1)
        cad = add_toy_grads(make_shape(rng, 64, 64), rng)
        pc = add_toy_grads(make_shape(rng, 32, 32), rng)
        model = self._model()
        params = model.init(jax.random.PRNGKey(0), cad, pc)
        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        grad_params = [p for p, _ in flat
                       if any("gradient_features" in str(k) for k in p)]
        assert grad_params, "gradient-feature params missing"

        def loss(p):
            return jnp.sum(model.apply(p, cad, pc)["C"] ** 2)

        g = jax.grad(loss)(params)
        leaves = [(p, v) for p, v in
                  jax.tree_util.tree_flatten_with_path(g)[0]
                  if any("gradient_features" in str(k) for k in p)]
        assert any(float(jnp.abs(v).max()) > 0 for _, v in leaves)

    def test_rotations_toggle_changes_params(self):
        rng = np.random.default_rng(2)
        cad = add_toy_grads(make_shape(rng, 64, 64), rng)
        pc = add_toy_grads(make_shape(rng, 32, 32), rng)
        m_rot = self._model(with_gradient_rotations=True)
        m_norot = self._model(with_gradient_rotations=False)
        p_rot = m_rot.init(jax.random.PRNGKey(0), cad, pc)
        p_norot = m_norot.init(jax.random.PRNGKey(0), cad, pc)
        names_rot = {str(p) for p, _ in
                     jax.tree_util.tree_flatten_with_path(p_rot)[0]}
        names_norot = {str(p) for p, _ in
                       jax.tree_util.tree_flatten_with_path(p_norot)[0]}
        assert any("A_re" in n for n in names_rot)
        assert any("'A'" in n for n in names_norot)

    def test_gradient_of_linear_field_on_flat_grid(self):
        """On a flat z=0 grid with the real operator builders, the
        tangent gradient of f(x,y,z)=x must have magnitude ~1 at
        interior vertices — validates _build_gradients +
        gradients_to_gather + the device gather application end to end."""
        from pose6d_tpu.spectral.operators import (gradients_to_gather,
                                                   mesh_operators)
        n = 12
        xs, ys = np.meshgrid(np.arange(n, dtype=np.float64),
                             np.arange(n, dtype=np.float64))
        verts = np.stack([xs.ravel(), ys.ravel(),
                          np.zeros(n * n)], axis=1)
        faces = []
        for r in range(n - 1):
            for c in range(n - 1):
                i = r * n + c
                faces.append([i, i + 1, i + n])
                faces.append([i + 1, i + n + 1, i + n])
        ops = mesh_operators(verts, np.asarray(faces), k_eig=8,
                             build_gradients=True)
        idx, cx, cy = gradients_to_gather(ops.gradX, ops.gradY)
        f = verts[:, :1].astype(np.float32)  # f = x
        gx = np.einsum("vk,vkc->vc", cx, f[idx])[:, 0]
        gy = np.einsum("vk,vkc->vc", cy, f[idx])[:, 0]
        mag = np.sqrt(gx ** 2 + gy ** 2)
        interior = ((verts[:, 0] > 0) & (verts[:, 0] < n - 1)
                    & (verts[:, 1] > 0) & (verts[:, 1] < n - 1))
        np.testing.assert_allclose(mag[interior], 1.0, atol=1e-3)


class TestDoubleAttention:
    def test_forward_and_split_dims(self):
        rng = np.random.default_rng(0)
        cad = make_shape(rng, 128, 100)
        pc = make_shape(rng, 64, 50)
        model = DPFMNet(DPFMConfig(attention_type="double"))
        params = model.init(jax.random.PRNGKey(0), cad, pc)
        out = model.apply(params, cad, pc)
        assert out["ref_feat1"].shape == (128, 32)
        assert out["overlap12"].shape == (128,)
        o = np.asarray(out["overlap12"])
        assert ((o >= 0) & (o <= 1)).all() and (o[100:] == 0).all()
        # last_lin must emit n_in + overlap_feat_dim (reference
        # modeling/dpfm.py:91: gnn_dim+add -> n_in+add)
        last = params["params"]["feat_refiner"]["last_lin"]["kernel"]
        cfg = DPFMConfig()
        assert last.shape == (cfg.gnn_dim + cfg.overlap_feat_dim,
                              cfg.n_feat + cfg.overlap_feat_dim)

    def test_normal_param_tree_unchanged(self):
        """Adding the variants must not disturb the checkpoint-parity
        surface of the default configuration."""
        rng = np.random.default_rng(1)
        cad = make_shape(rng, 64, 64)
        pc = make_shape(rng, 32, 32)
        model = DPFMNet(DPFMConfig())
        params = model.init(jax.random.PRNGKey(0), cad, pc)
        last = params["params"]["feat_refiner"]["last_lin"]["kernel"]
        assert last.shape == (32, 32)
        names = {str(p) for p, _ in
                 jax.tree_util.tree_flatten_with_path(params)[0]}
        assert not any("gradient_features" in n for n in names)


class TestSubsampledCrossAttention:
    def test_nn_interpolate_exact_at_samples(self):
        rng = np.random.default_rng(0)
        s_feats = jnp.asarray(rng.normal(size=(16, 8)).astype(np.float32))
        # vertex j's nearest sampled point is j%16 at distance ~0
        idx = jnp.asarray((np.arange(64) % 16)[:, None].repeat(3, 1))
        dists = jnp.asarray(
            np.stack([np.full(64, 1e-12), np.full(64, 1.0),
                      np.full(64, 2.0)], axis=1).astype(np.float32))
        out = nn_interpolate(s_feats, dists, idx)
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(s_feats)[np.arange(64) % 16],
                                   rtol=1e-4)

    def test_forward_with_subsampling(self):
        rng = np.random.default_rng(2)
        cad = make_shape(rng, 256, 200)
        pc = make_shape(rng, 128, 100)
        model = DPFMNet(DPFMConfig(cross_sampling_ratio=0.25))
        params = model.init(jax.random.PRNGKey(0), cad, pc)
        out = model.apply(params, cad, pc)
        assert out["C"].shape == (30, 30)
        for v in jax.tree_util.tree_leaves(out):
            assert np.isfinite(np.asarray(v)).all()
        assert (np.asarray(out["ref_feat1"])[200:] == 0).all()


class TestGradientFeatureEncoderAlone:
    def test_diffusion_net_requires_grads(self):
        rng = np.random.default_rng(0)
        s = make_shape(rng, 32, 32)
        enc = DiffusionNet(with_gradient_features=True)
        try:
            enc.init(jax.random.PRNGKey(0), s["xyz"], s["mass"],
                     s["evals"], s["evecs"], s["valid"])
            assert False, "expected ValueError"
        except ValueError:
            pass


class TestCapacityKnobs:
    """width / n_blocks / wide-feature plumbing (beyond the reference's
    hardcoded DiffusionNet width 64 / 2 blocks, DPFM layers)."""

    def test_yaml_width_and_blocks_reach_config(self):
        import yaml
        cfg = yaml.safe_load(open("config/unseen_lm300_wide.yaml"))
        mc = DPFMConfig.from_yaml_dict(cfg["model"])
        assert mc.width == 128
        assert mc.n_blocks == 3
        assert mc.n_feat == 64
        assert mc.num_heads == 4

    def test_wide_forward_shapes_and_param_count(self):
        rng = np.random.default_rng(0)
        cad = make_shape(rng, 64, 60)
        pc = make_shape(rng, 48, 40)
        narrow = DPFMNet(DPFMConfig())
        wide = DPFMNet(DPFMConfig(width=128, n_blocks=3, n_feat=64,
                                  gnn_dim=64, num_heads=4,
                                  overlap_feat_dim=64))
        key = jax.random.PRNGKey(0)
        count = lambda p: sum(x.size for x in jax.tree.leaves(p))  # noqa: E731
        p_n = narrow.init(key, cad, pc)
        p_w = wide.init(key, cad, pc)
        assert count(p_w) > 4 * count(p_n)
        out = wide.apply(p_w, cad, pc)
        assert out["C"].shape == (30, 30)
        assert out["overlap12"].shape == (64,)
        assert out["overlap21"].shape == (48,)
        assert all(bool(jnp.isfinite(v).all()) for v in
                   (out["C"], out["overlap12"], out["overlap21"]))


class TestHKSInputFeatures:
    """input_features=hks/xyz_hks: intrinsic heat-kernel-signature
    channels (ops/hks.py) — beyond the reference's raw-xyz input
    (models/dpfm.py:53)."""

    def _pair(self, rng, v=96, nv=90):
        return make_shape(rng, v, nv), make_shape(rng, v // 2, nv // 2)

    def test_hks_properties(self):
        from pose6d_tpu.ops.hks import heat_kernel_signature
        rng = np.random.default_rng(0)
        s = make_shape(rng, 128, 100)
        h = np.asarray(heat_kernel_signature(
            s["evals"], s["evecs"], s["mass"], s["valid"], n_t=16))
        valid = np.asarray(s["valid"])
        assert h.shape == (128, 16)
        assert np.all(h[~valid] == 0)          # padded rows zero
        assert np.all(h[valid] >= 0)           # squared-basis sums
        # per-channel mass-weighted mean over valid verts == 1
        w = np.asarray(s["mass"]) * valid
        mean = (w[:, None] * h).sum(0) / w.sum()
        np.testing.assert_allclose(mean, 1.0, rtol=1e-4)

    def test_hks_model_invariant_to_rigid_motion(self):
        """hks inputs never see coordinates: moving the PC rigidly must
        leave every output bit-identical; the xyz model must differ."""
        from scipy.spatial.transform import Rotation
        rng = np.random.default_rng(1)
        cad, pc = self._pair(rng)
        R = jnp.asarray(Rotation.from_rotvec([0.3, -0.2, 0.5]).as_matrix(),
                        jnp.float32)
        pc_moved = dict(pc)
        pc_moved["xyz"] = jnp.where(pc["valid"][:, None],
                                    pc["xyz"] @ R.T + 3.0, 0.0)
        for feats, expect_same in (("hks", True), ("xyz", False)):
            model = DPFMNet(DPFMConfig(input_features=feats))
            params = model.init(jax.random.PRNGKey(0), cad, pc)
            a = model.apply(params, cad, pc)
            b = model.apply(params, cad, pc_moved)
            same = bool(jnp.allclose(a["C"], b["C"], atol=1e-6))
            assert same == expect_same, feats

    def test_xyz_hks_train_step_and_yaml(self):
        from pose6d_tpu.train.train_step import make_train_step
        from pose6d_tpu.train.loss import DPFMLossConfig
        from tests.test_train import make_batch
        cfg = DPFMConfig.from_yaml_dict({
            "fmap": {"C_in": 3, "n_feat": 32, "n_fmap": 30, "k_eig": 64,
                     "lambda_": 100, "resolvant_gamma": 0.5, "robust": True,
                     "input_features": "xyz_hks", "n_hks": 8},
            "attention": {"num_head": 2, "gnn_dim": 32, "ref_n_layers": 1},
            "overlap": {"overlap_feat_dim": 32}})
        assert cfg.input_features == "xyz_hks" and cfg.n_hks == 8
        rng = np.random.default_rng(0)
        batch = make_batch(rng)
        init_fn, step_fn, _ = make_train_step(
            cfg, DPFMLossConfig(nce_num_pairs=32))
        state = init_fn(jax.random.PRNGKey(0), batch)
        state, logs = jax.jit(step_fn)(state, batch, jax.random.PRNGKey(1))
        assert bool(jnp.isfinite(logs["loss"]))
        # first_lin consumed 3 + 8 channels
        k = [k for k in state.params["params"]["feature_extractor"]
             if k == "first_lin"][0]
        w = state.params["params"]["feature_extractor"][k]["kernel"]
        assert w.shape[0] == 11

    def test_extend_first_lin_is_function_preserving(self):
        """Zero-extended xyz params drive an xyz_hks model to the exact
        xyz-model outputs (warm-start contract of
        port_weights.extend_first_lin_input)."""
        from pose6d_tpu.models.port_weights import extend_first_lin_input
        rng = np.random.default_rng(3)
        cad, pc = self._pair(rng)
        xyz_model = DPFMNet(DPFMConfig(input_features="xyz"))
        params = xyz_model.init(jax.random.PRNGKey(2), cad, pc)
        hks_model = DPFMNet(DPFMConfig(input_features="xyz_hks", n_hks=16))
        ext = extend_first_lin_input(params, 16)
        a = xyz_model.apply(params, cad, pc)
        b = hks_model.apply(ext, cad, pc)
        np.testing.assert_array_equal(np.asarray(a["C"]),
                                      np.asarray(b["C"]))
        np.testing.assert_array_equal(np.asarray(a["overlap21"]),
                                      np.asarray(b["overlap21"]))

    def test_wks_properties_and_invariance(self):
        """WKS channels: padded-zero, normalized, and the wks model is
        rigidly invariant like the hks one."""
        from scipy.spatial.transform import Rotation
        from pose6d_tpu.ops.hks import wave_kernel_signature
        rng = np.random.default_rng(4)
        s = make_shape(rng, 128, 100)
        h = np.asarray(wave_kernel_signature(
            s["evals"], s["evecs"], s["mass"], s["valid"], n_e=12))
        valid = np.asarray(s["valid"])
        assert h.shape == (128, 12)
        assert np.all(h[~valid] == 0) and np.all(h[valid] >= 0)
        w = np.asarray(s["mass"]) * valid
        np.testing.assert_allclose((w[:, None] * h).sum(0) / w.sum(),
                                   1.0, rtol=1e-4)
        cad, pc = self._pair(rng)
        R = jnp.asarray(Rotation.from_rotvec([0.1, 0.4, -0.3]).as_matrix(),
                        jnp.float32)
        pc_moved = dict(pc)
        pc_moved["xyz"] = jnp.where(pc["valid"][:, None],
                                    pc["xyz"] @ R.T - 2.0, 0.0)
        model = DPFMNet(DPFMConfig(input_features="hks_wks"))
        params = model.init(jax.random.PRNGKey(0), cad, pc)
        a = model.apply(params, cad, pc)
        b = model.apply(params, cad, pc_moved)
        assert bool(jnp.allclose(a["C"], b["C"], atol=1e-6))
        # first_lin consumed n_hks + n_wks = 32 channels
        k = params["params"]["feature_extractor"]["first_lin"]["kernel"]
        assert k.shape[0] == 32

    def test_wks_channels_distinct_at_small_n_e(self):
        """Regression (advisor r3): with n_e=16 the unclamped sigma made
        the energy window DESCENDING and collapsed every channel onto
        the mid-band. The clamp must keep channels band-passed: energy
        centers ascend and the first/last channels are far from
        duplicates."""
        from pose6d_tpu.ops.hks import wave_kernel_signature
        rng = np.random.default_rng(7)
        s = make_shape(rng, 128, 100)
        h = np.asarray(wave_kernel_signature(
            s["evals"], s["evecs"], s["mass"], s["valid"], n_e=16))
        valid = np.asarray(s["valid"])
        hv = h[valid]
        corr = np.corrcoef(hv[:, 0], hv[:, -1])[0, 1]
        assert corr < 0.9, f"first/last WKS channels collapsed (r={corr})"
        # consecutive channels differ too (no wide-Gaussian smearing)
        for i in range(0, 15, 5):
            r = np.corrcoef(hv[:, i], hv[:, i + 1])[0, 1]
            assert r < 0.99999


class TestCommittedConfigs:
    """Every committed config YAML must build a model that initializes
    and runs (configs must not rot as the model evolves), with a
    first_lin input width matching its declared input_features —
    that width is what load_pretrained_params' widening keys on."""

    def test_every_config_initializes_with_declared_width(self):
        from pathlib import Path
        from pose6d_tpu.config import load_config
        rng = np.random.default_rng(9)
        cad, pc = make_shape(rng, 64, 60), make_shape(rng, 48, 44)
        seen = 0
        for p in sorted(Path("config").glob("*.yaml")):
            mc = load_config(p).model
            model = DPFMNet(mc)
            params = model.init(jax.random.PRNGKey(0), cad, pc)
            rows = params["params"]["feature_extractor"]["first_lin"][
                "kernel"].shape[0]
            expected = (3 * ("xyz" in mc.input_features)
                        + mc.n_hks * ("hks" in mc.input_features)
                        + mc.n_wks * ("wks" in mc.input_features))
            assert rows == expected, (
                f"{p}: first_lin rows {rows} != {expected} "
                f"for input_features={mc.input_features!r}")
            out = model.apply(params, cad, pc)
            assert bool(jnp.isfinite(out["C"]).all()), p
            seen += 1
        assert seen >= 7

    def test_intrinsic_arm_is_rigid_invariant(self):
        """config/unseen_lm300_intrinsic.yaml: no coordinate reaches
        the encoder, so an arbitrary rigid motion of the observed
        cloud leaves the functional map bit-identical."""
        from scipy.spatial.transform import Rotation
        from pose6d_tpu.config import load_config
        mc = load_config("config/unseen_lm300_intrinsic.yaml").model
        assert mc.input_features == "hks_wks"
        rng = np.random.default_rng(11)
        cad, pc = make_shape(rng, 96, 90), make_shape(rng, 64, 58)
        model = DPFMNet(mc)
        params = model.init(jax.random.PRNGKey(0), cad, pc)
        R = jnp.asarray(
            Rotation.from_rotvec([1.1, -2.0, 0.7]).as_matrix(), jnp.float32)
        pc_moved = dict(pc)
        pc_moved["xyz"] = jnp.where(pc["valid"][:, None],
                                    pc["xyz"] @ R.T + 40.0, 0.0)
        a = model.apply(params, cad, pc)
        b = model.apply(params, cad, pc_moved)
        np.testing.assert_array_equal(np.asarray(a["C"]),
                                      np.asarray(b["C"]))
        np.testing.assert_array_equal(np.asarray(a["overlap21"]),
                                      np.asarray(b["overlap21"]))
