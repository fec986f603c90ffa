import numpy as np
import jax
import jax.numpy as jnp

from pose6d_tpu.train.checkpoint import (latest_checkpoint, load_params,
                                         restore_checkpoint,
                                         save_checkpoint, save_params)
from pose6d_tpu.train.train_step import TrainState, make_train_step
from pose6d_tpu.models import DPFMConfig
from pose6d_tpu.train.loss import DPFMLossConfig


def small_batch(rng, B=1, vc=64, vp=32, k=64):
    def shape(v, nv):
        xyz = rng.normal(size=(B, v, 3)).astype(np.float32)
        mass = np.abs(rng.normal(size=(B, v))).astype(np.float32)
        evecs = rng.normal(size=(B, v, k)).astype(np.float32)
        evals = np.sort(np.abs(rng.normal(size=(B, k))), -1).astype(np.float32)
        valid = np.tile(np.arange(v) < nv, (B, 1))
        return {"xyz": jnp.asarray(xyz), "mass": jnp.asarray(mass),
                "evals": jnp.asarray(evals), "evecs": jnp.asarray(evecs),
                "valid": jnp.asarray(valid)}
    pairs = np.zeros((B, 16, 2), np.int32)
    A = np.tile(np.eye(30, dtype=np.float32), (B, 1, 1))
    return {"cad": shape(vc, vc), "pc": shape(vp, vp),
            "pairs": jnp.asarray(pairs),
            "pairs_valid": jnp.ones((B, 16), bool),
            "cgt_A": jnp.asarray(A), "cgt_B": jnp.asarray(A.copy()),
            "overlap12": jnp.ones((B, vc)), "overlap21": jnp.ones((B, vp)),
            "align_pc": jnp.zeros((B, vp, 3)),
            "R_m2c": jnp.tile(jnp.eye(3), (B, 1, 1)),
            "t_m2c": jnp.zeros((B, 3)), "diam_cad": jnp.ones((B,)),
            "obj_id": jnp.ones((B,), jnp.int32),
            "visib_fract": jnp.ones((B,))}


class TestCheckpoint:
    def test_roundtrip_trainstate(self, tmp_path):
        rng = np.random.default_rng(0)
        batch = small_batch(rng)
        init_fn, step_fn, _ = make_train_step(
            DPFMConfig(), DPFMLossConfig(nce_num_pairs=8))
        state = init_fn(jax.random.PRNGKey(0), batch)
        state, _ = jax.jit(step_fn)(state, batch, jax.random.PRNGKey(1))

        save_checkpoint(tmp_path, state, int(state.step))
        path = latest_checkpoint(tmp_path)
        assert path is not None
        template = init_fn(jax.random.PRNGKey(2), batch)
        restored = restore_checkpoint(path, template)
        assert int(restored.step) == int(state.step)
        for a, b in zip(jax.tree_util.tree_leaves(state.params),
                        jax.tree_util.tree_leaves(restored.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # optimizer state restored too (improvement over the reference)
        for a, b in zip(jax.tree_util.tree_leaves(state.opt_state),
                        jax.tree_util.tree_leaves(restored.opt_state)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_keep_limit(self, tmp_path):
        rng = np.random.default_rng(0)
        batch = small_batch(rng)
        init_fn, *_ = make_train_step(DPFMConfig(),
                                      DPFMLossConfig(nce_num_pairs=8))
        state = init_fn(jax.random.PRNGKey(0), batch)
        for s in range(8):
            save_checkpoint(tmp_path, state, s, keep=3)
        ckpts = sorted(tmp_path.glob("ckpt_*.msgpack"))
        assert len(ckpts) == 3
        assert latest_checkpoint(tmp_path).name == "ckpt_00000007.msgpack"

    def test_params_roundtrip(self, tmp_path):
        rng = np.random.default_rng(0)
        batch = small_batch(rng)
        init_fn, *_ = make_train_step(DPFMConfig(),
                                      DPFMLossConfig(nce_num_pairs=8))
        state = init_fn(jax.random.PRNGKey(0), batch)
        save_params(tmp_path / "p.msgpack", state.params)
        loaded = load_params(tmp_path / "p.msgpack", state.params)
        for a, b in zip(jax.tree_util.tree_leaves(state.params),
                        jax.tree_util.tree_leaves(loaded)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestResumeDir:
    def test_logger_reuses_run_dir(self, tmp_path):
        from pose6d_tpu.train.logging import MetricsLogger
        run = tmp_path / "myrun"
        run.mkdir()
        lg = MetricsLogger(tmp_path, run_dir=run)
        assert lg.dir == run
        lg.log({"a": 1.0})
        lg.close()
        assert (run / "metrics.jsonl").exists()
