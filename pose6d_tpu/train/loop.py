"""Full training loop (equivalent of reference scripts/train.py:49-137).

Epoch loop with step-decay LR, grad clip, per-step scalar logging,
per-epoch means, optional per-step inlier-ratio metric, checkpointing
every checkpoint_interval epochs (full TrainState — resumable, unlike
the reference's weights-only dumps), and optional pretrained init from
either the reference's torch weights.pt or a native params file.
"""
from __future__ import annotations

import jax
import numpy as np

from ..data.dataset import BOPObjectDataset
from ..data.pipeline import HostLoader
from . import metrics as metrics_mod
from .checkpoint import (latest_checkpoint, restore_checkpoint,
                         save_checkpoint, save_params)
from .logging import MetricsLogger
from .train_step import make_optimizer, make_train_step


class ConcatDataset:
    """Multi-dataset concat (reference utils/utils.py:58-64)."""

    def __init__(self, datasets):
        self.datasets = list(datasets)
        self._offsets = np.cumsum([0] + [len(d) for d in self.datasets])

    def __len__(self):
        return int(self._offsets[-1])

    def __getitem__(self, idx):
        d = int(np.searchsorted(self._offsets, idx, side="right") - 1)
        return self.datasets[d][idx - int(self._offsets[d])]


def build_train_dataset(cfg):
    ds = [BOPObjectDataset(
        cfg.data_root, d.render_data_name, mode=d.mode, min_vis=d.min_vis,
        cache_dir=cfg.cache_dir, lbo_pc=d.lbo_pc, obj_take=d.obj_take,
        num_samples=d.num_samples, models_dir=d.models_dir,
        target_faces=cfg.target_faces, pc_lbo_backend=d.pc_lbo_backend,
        build_gradients=d.build_gradients or cfg.model.with_gradient_features)
        for d in cfg.train_datasets]
    return ds[0] if len(ds) == 1 else ConcatDataset(ds)


def _prefix_input_rows(model_cfg):
    """Row counts of every proper prefix of the model's input channels.

    Channel order is fixed xyz -> hks -> wks (models/dpfm.py branch()),
    so a narrower checkpoint can only be widened function-preservingly
    when its first_lin input rows equal one of these prefix widths —
    i.e. the new channels are appended at the END. Any other mismatch
    (e.g. an hks-trained checkpoint into an xyz_hks model, where xyz
    comes FIRST) would silently misalign channels.
    """
    sizes = []
    if "xyz" in model_cfg.input_features:
        sizes.append(3)
    if "hks" in model_cfg.input_features:
        sizes.append(model_cfg.n_hks)
    if "wks" in model_cfg.input_features:
        sizes.append(model_cfg.n_wks)
    return {sum(sizes[:i]) for i in range(1, len(sizes))}


def load_pretrained_params(path: str, template, model_cfg=None):
    if str(path).endswith(".pt"):
        from ..models.port_weights import load_reference_checkpoint
        loaded = load_reference_checkpoint(path)
    else:
        from .checkpoint import load_params
        loaded = load_params(path, template)
    # Function-preserving input widening: an xyz-trained checkpoint
    # warm-starts an input_features="xyz_hks" model by zero-extending
    # first_lin's input rows (port_weights.extend_first_lin_input) —
    # the HKS channels start contributing exactly 0. Only allowed when
    # the loaded rows match a prefix of the target channel layout;
    # otherwise the shape mismatch surfaces as an error downstream
    # instead of silently misaligning channels.
    try:
        tk = template["params"]["feature_extractor"]["first_lin"]["kernel"]
        lk = loaded["params"]["feature_extractor"]["first_lin"]["kernel"]
        if lk.shape[0] < tk.shape[0] and lk.shape[1] == tk.shape[1]:
            allowed = (_prefix_input_rows(model_cfg)
                       if model_cfg is not None else {lk.shape[0]})
            if lk.shape[0] in allowed:
                from ..models.port_weights import extend_first_lin_input
                loaded = extend_first_lin_input(loaded,
                                                tk.shape[0] - lk.shape[0])
                print(f"pretrained: widened first_lin input "
                      f"{lk.shape[0]} -> {tk.shape[0]} rows "
                      f"(appended channels zero-initialized)")
            else:
                raise ValueError(
                    f"pretrained checkpoint has {lk.shape[0]} input rows; "
                    f"model expects {tk.shape[0]} and {lk.shape[0]} is not "
                    f"a prefix of its channel layout "
                    f"({model_cfg.input_features!r}) — refusing to widen")
    except (KeyError, TypeError):
        pass
    return loaded


def resume_offsets(restored_step: int, steps_per_epoch: int, key):
    """Loader-epoch and RNG-key offsets for chained-window resume.

    Chained-window training (resume_dir + max_steps caps, the pattern
    the 590 s execution windows force) restarts the process's loader
    epoch counter and RNG key from scratch at every window; without an
    offset each window replays the epoch-0 shuffle order and the same
    augmentation key sequence, biasing the sample/augmentation
    distribution toward the first epochs'. Offsetting both by the
    restored step makes the window chain sample like one continuous run.
    """
    return restored_step // steps_per_epoch, jax.random.fold_in(
        key, restored_step)


def train(cfg, dataset=None, max_steps: int | None = None,
          sample_kw: dict | None = None, n_devices: int | None = None):
    """Run training per config; returns the final TrainState.

    sample_kw forwards to data.pipeline.make_sample (e.g. smaller
    v_cad/v_pc padding for tests).

    Data parallelism is automatic: with more than one visible device
    (and batch_size divisible by the device count) the step compiles
    over a 1-D data mesh — batch sharded, params replicated, XLA
    inserting the gradient psum over ICI (parallel/mesh.py). Pass
    n_devices=1 to force the single-device path (A/B numerics tests).
    """
    tcfg = cfg.train
    if max_steps is None:
        max_steps = tcfg.max_steps
    dataset = dataset if dataset is not None else build_train_dataset(cfg)
    kw = {"v_cad": cfg.pad_v_cad, "v_pc": cfg.pad_v_pc}
    kw.update(sample_kw or {})
    loader = HostLoader(dataset, tcfg.batch_size, shuffle=True,
                        seed=tcfg.seed, num_threads=tcfg.num_threads, **kw)
    steps_per_epoch = max(len(loader), 1)
    optimizer = make_optimizer(
        lr=tcfg.lr, decay_factor=tcfg.decay_factor,
        decay_every_steps=tcfg.decay_iter * steps_per_epoch,
        clip_norm=tcfg.grad_clip)
    init_fn, step_fn, fwd_batch = make_train_step(
        cfg.model, cfg.loss, optimizer,
        augment_angle=float(np.deg2rad(tcfg.augment_rotation_deg)),
        augment_trans=tcfg.augment_translation)
    example = next(iter(loader))
    key = jax.random.PRNGKey(tcfg.seed)
    # Initialize parameters on host CPU: init is tiny (24k params) and
    # running the traced init program on the accelerator is wasted
    # compile time (and exercises a flaky execution path on tunneled
    # single-chip setups); the step program is what belongs on device.
    # portable_lowering: init is traced for the CPU device while the
    # process default backend is still "tpu" — the flash-attention gate
    # keys on the backend and would emit a TPU-only Pallas call into a
    # CPU program (params are identical either way; init math is
    # path-independent).
    from ..models.attention import portable_lowering
    try:
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu), portable_lowering():
            state = init_fn(key, jax.device_put(example, cpu))
        state = jax.device_put(state, jax.devices()[0])
    except RuntimeError:
        state = init_fn(key, example)
    if tcfg.pretrained and str(tcfg.pretrained).lower() != "none":
        params = load_pretrained_params(tcfg.pretrained, state.params,
                                        model_cfg=cfg.model)
        state = state._replace(params=params)

    logger = MetricsLogger(cfg.logging_dir, cfg.comment,
                           run_dir=tcfg.resume_dir)
    ckpt_dir = logger.dir / "ckpt"
    latest = latest_checkpoint(ckpt_dir)
    if latest is not None:
        state = restore_checkpoint(latest, state)
        loader.epoch, key = resume_offsets(int(state.step),
                                           steps_per_epoch, key)

    # Production data-parallel path (SURVEY §2.4 plan row 1): shard the
    # batch over all local devices whenever the mesh is usable.
    n_dev = jax.device_count() if n_devices is None else n_devices
    use_mesh = n_dev > 1 and tcfg.batch_size % n_dev == 0
    if use_mesh:
        from ..parallel.mesh import (make_mesh, make_parallel_train_step,
                                     replicate, shard_batch)
        mesh = make_mesh(n_dev)
        step = make_parallel_train_step(step_fn, mesh)
        state = replicate(state, mesh)
        put = lambda b: shard_batch(b, mesh)  # noqa: E731
        print(f"train: data-parallel over {n_dev} devices "
              f"({tcfg.batch_size // n_dev} frames/device)")
    else:
        step = jax.jit(step_fn)
        put = lambda b: b  # noqa: E731
    solver = None
    if tcfg.log_ir:
        from ..solvers import naive_fmap2pointmap
        solver = jax.jit(jax.vmap(naive_fmap2pointmap))

    global_step = int(state.step)
    for epoch in range(1, tcfg.epochs + 1):
        epoch_logs = []
        for batch in loader:
            key, sub = jax.random.split(key)
            state, logs = step(state, put(batch), sub)
            C = logs.pop("_C")
            # One device->host transfer for all scalars: per-scalar
            # float() casts each pay a tunnel round trip on remote
            # backends, which dominates the host loop at small batch.
            logs = {k: float(v) for k, v in
                    jax.device_get(logs).items()}
            # The train-IR probe is a diagnostic, not supervision: it
            # runs a second jitted program + fetch per step. Sample it
            # at log_interval (its epoch aggregate is a mean anyway).
            if solver is not None and (
                    (global_step + 1) % tcfg.log_interval == 0):
                pairs, pvalid = solver(
                    C, batch["cad"]["evecs"][:, :, :cfg.model.n_fmap],
                    batch["pc"]["evecs"][:, :, :cfg.model.n_fmap],
                    batch["cad"]["valid"], batch["pc"]["valid"])
                ir = jax.vmap(metrics_mod.inlier_ratio)(
                    pairs, pvalid, batch["cad"]["xyz"], batch["align_pc"],
                    0.1 * batch["diam_cad"])
                logs["IR"] = float(np.mean(np.asarray(ir)))
            logger.log(logs, step=global_step)
            epoch_logs.append(logs)
            global_step += 1
            if global_step % tcfg.log_interval == 0:
                print(f"epoch {epoch} step {global_step} "
                      f"loss {logs['loss']:.4f}")
            if (tcfg.checkpoint_every_steps
                    and global_step % tcfg.checkpoint_every_steps == 0):
                save_checkpoint(ckpt_dir, state, global_step,
                                keep=tcfg.checkpoint_keep)
            if max_steps is not None and global_step >= max_steps:
                break
        logger.log_epoch(epoch_logs, epoch)
        if epoch % tcfg.checkpoint_interval == 0:
            save_checkpoint(ckpt_dir, state, global_step,
                            keep=tcfg.checkpoint_keep)
            save_params(logger.dir / "params_latest.msgpack", state.params)
        if max_steps is not None and global_step >= max_steps:
            break
    save_checkpoint(ckpt_dir, state, global_step,
                    keep=tcfg.checkpoint_keep)
    save_params(logger.dir / "params_latest.msgpack", state.params)
    logger.close()
    return state
