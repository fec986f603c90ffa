"""YAML config system (gin-free equivalent of the reference's config/).

The reference wires everything through gin scopes + a gin->env-var bridge
(config/dpfm_orig.gin, utils/utils.py:7-10). Here a single YAML document
maps onto typed dataclasses; dataset scopes become named dataset blocks;
the model block keeps the reference's dpfm_orig.yaml key names so
existing configs translate line for line. Dotted-path overrides
(train.lr=1e-3) come from the CLI.
"""
from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any, Optional

import yaml

from .models.dpfm import DPFMConfig
from .train.loss import DPFMLossConfig


@dataclasses.dataclass
class DatasetConfig:
    render_data_name: str = "lm"
    mode: str = "train_pbr"
    num_samples: int = -1
    min_vis: float = 0.3
    obj_take: tuple = ()
    lbo_pc: bool = True
    models_dir: str = "models"
    pc_lbo_backend: str = "host"
    build_gradients: bool = False  # cache tangent-gradient operators
                                   # (with_gradient_features models)


@dataclasses.dataclass
class TrainConfig:
    batch_size: int = 8
    lr: float = 5e-4                  # RMSprop.lr (dpfm_orig.gin)
    decay_iter: int = 500             # epochs between decays
    decay_factor: float = 0.1
    epochs: int = 5000
    grad_clip: float = 5.0
    checkpoint_interval: int = 1      # epochs
    checkpoint_every_steps: int = 0   # additional step-based cadence
                                      # (0 = off). For chained-window
                                      # runs whose process can be killed
                                      # mid-epoch: bounds the loss to
                                      # this many steps.
    checkpoint_keep: int = 5          # retained ckpt_*.msgpack files
                                      # (raise for early-stopping sweeps)
    log_interval: int = 1             # steps
    num_threads: int = 4
    seed: int = 0
    pretrained: Optional[str] = None  # reference weights.pt or our ckpt
    log_ir: bool = False              # per-step inlier ratio (costly)
    # train-time rigid augmentation of the partial cloud (degrees /
    # pipeline cm; 0 = reference behavior). Spectral caches stay valid
    # under rigid motion — see train/augment.py.
    augment_rotation_deg: float = 0.0
    augment_translation: float = 0.0
    resume_dir: Optional[str] = None  # existing run dir to resume into
    max_steps: Optional[int] = None   # stop at this GLOBAL step (resume-
                                      # aware: bounds a process's lifetime
                                      # when chaining runs)


@dataclasses.dataclass
class EvalConfig:
    solver: str = "spatial_filtering"  # choose_fmap2pointmap_solver
    pose_solver: str = "ransac"        # ransac | gnc
    ransac_threshold: float = 0.05
    ransac_hypotheses: int = 131072
    gnc_noise_bound: float = 0.05
    icp_max_iter: int = 50
    icp_threshold: float = 0.2
    icp_target: str = "gt_cad"  # reference protocol (test_RANSAC.py:436-439)
    batch_size: int = 8
    # ZoomOut spectral upsampling of the predicted map at eval time
    # (solvers/zoomout.py): grow C from n_fmap to zoomout_k using the
    # cached k_eig eigenvectors. 0 = off (reference parity).
    zoomout_k: int = 0
    zoomout_step: int = 4
    zoomout_gate_tau: float = 0.0  # >0: consistency-gated refit rows
    # rotation test-time augmentation (train/eval_loop.py): forward a
    # fixed bank of rigid rotations of the cloud (spectral cache is
    # rigid-invariant) and keep, per sample, the rotation with the most
    # spatial-filter survivors. 0/1 = off. Targets the measured
    # rotation-generalization failure of the xyz encoder
    # (docs/diagnostics/). Requires solver=spatial_filtering.
    tta_rotations: int = 0
    # hysteresis for candidate selection (zoomout/tta): a non-base
    # candidate must beat the base by this fraction — near-ties are
    # solver noise, not evidence (same reasoning as the
    # flip-disambiguation margin, solvers/multistart.py)
    select_margin: float = 0.15
    # candidate-selection signal: "depth" scores each candidate map by
    # a cheap RANSAC pose + depth-render consistency (the evidence
    # symmetry cannot fake — spatial-filter survivor counts are blind
    # to globally flipped-but-consistent maps, measured obj12
    # 0.094->0.070 under survivor-selected TTA); "survivors" is the
    # cheaper count-based signal. Depth falls back to survivors on
    # frames without intrinsics.
    select_by: str = "depth"
    select_hypotheses: int = 2048  # RANSAC budget per candidate score
    # alternatives only compete on samples whose BASE map is weak:
    # spatial-filter survivors < select_trigger * (valid pc points).
    # Strong base maps keep their result unconditionally — measured:
    # every refinement helps weak/symmetric objects (obj12) and only
    # perturbs strong ones (obj8). 1.0 = always compete.
    select_trigger: float = 0.25


@dataclasses.dataclass
class Config:
    data_root: str = ""
    cache_dir: str = ""
    save_results: Optional[str] = None
    logging_dir: str = "logs"
    comment: str = ""
    # static padding budget (ops.masking defaults; smaller values shrink
    # compile time + memory when CADs are decimated below 10k faces)
    pad_v_cad: int = 5120
    pad_v_pc: int = 2048
    target_faces: int = 10000
    model: DPFMConfig = dataclasses.field(default_factory=DPFMConfig)
    loss: DPFMLossConfig = dataclasses.field(default_factory=DPFMLossConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    eval: EvalConfig = dataclasses.field(default_factory=EvalConfig)
    train_datasets: list = dataclasses.field(default_factory=list)
    eval_dataset: DatasetConfig = dataclasses.field(
        default_factory=DatasetConfig)


def _build(cls, d: dict):
    names = {f.name for f in dataclasses.fields(cls)}
    return cls(**{k: v for k, v in d.items() if k in names})


def load_config(path: str | Path, overrides: list[str] = ()) -> Config:
    raw: dict[str, Any] = yaml.safe_load(Path(path).read_text()) or {}
    for ov in overrides:
        key, _, val = ov.partition("=")
        node = raw
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = yaml.safe_load(val)
    cfg = Config(
        data_root=raw.get("data_root", ""),
        cache_dir=raw.get("cache_dir", ""),
        save_results=raw.get("save_results"),
        logging_dir=raw.get("logging_dir", "logs"),
        comment=raw.get("comment", ""),
        pad_v_cad=raw.get("pad_v_cad", 5120),
        pad_v_pc=raw.get("pad_v_pc", 2048),
        target_faces=raw.get("target_faces", 10000),
    )
    if "model" in raw:
        # accept the reference's dpfm_orig.yaml structure verbatim
        m = raw["model"]
        if "fmap" in m:
            cfg.model = DPFMConfig.from_yaml_dict(m)
        else:
            cfg.model = _build(DPFMConfig, m)
    if "loss" in raw:
        cfg.loss = _build(DPFMLossConfig, raw["loss"])
    if "train" in raw:
        cfg.train = _build(TrainConfig, raw["train"])
    if "eval" in raw:
        cfg.eval = _build(EvalConfig, raw["eval"])
    for block in raw.get("train_datasets", []):
        cfg.train_datasets.append(_build(DatasetConfig, block))
    if "eval_dataset" in raw:
        cfg.eval_dataset = _build(DatasetConfig, raw["eval_dataset"])
    return cfg
