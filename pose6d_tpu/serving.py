"""Serving export: freeze the online depth->pose pipeline to a
serialized StableHLO artifact.

The reference has no deployment story — its end-user flow re-runs
Python scripts over result files (scripts/eval.py -> test_RANSAC.py).
Here the whole per-frame pipeline (backprojection -> outlier removal ->
FPS -> on-device LBO -> DPFM forward -> spatial-filter solver -> RANSAC
-> ICP -> flip disambiguation) is ONE jitted function, so it can be
exported with `jax.export`: weights and CAD operators are baked in as
constants, and the artifact replays on any host with jax installed —
no model code, no checkpoint loading, no Python package beyond jax.

    pred = Predictor(params, {5: cad_ops}, mode="online")
    blob = export_predictor(pred, obj_id=5, depth_shape=(480, 640))
    Path("pose_obj5.stablehlo").write_bytes(blob)
    # ... on the serving host:
    fn = load_exported(Path("pose_obj5.stablehlo").read_bytes())
    out = fn(depth, K, cam_scale, mask, key)   # {"R", "t", ...}

Cross-platform: pass platforms=("tpu", "cpu") to produce one artifact
that runs on both. Note the Pallas fast paths select on
jax.default_backend() AT TRACE TIME (ops/nn.py:20), so an artifact
exported from a CPU host bakes the portable XLA path even for its TPU
variant — export on a TPU host when peak serving throughput matters.

Parity is program-level: the artifact is bit-exact against a live
`jax.jit` of the same fused frame function (verified on the real
sample frame). `Predictor.predict` partitions the frame into two jit
programs (cloud, then pose), so XLA fuses differently and the LOBPCG
eigensolve can differ in the last bits; on well-posed frames the final
pose agrees to 1e-5 (tests/test_serving.py), but on degenerate inputs
(e.g. a CAD model that doesn't match the mask) the RANSAC winner may
flip. That is float nondeterminism across compilation partitions, not
a semantic difference.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import export as _jax_export


def _frame_fn(pred, obj_id):
    cad = pred.cad_bank[int(obj_id)]
    diam = jnp.float32(pred._diam[int(obj_id)])
    sym_rots = pred._sym_rots[int(obj_id)]

    def frame(depth, K, cam_scale, mask, key):
        """depth (H,W) f32 raw BOP units; K (3,3) f32; cam_scale ()
        f32 (1000/depth_scale); mask (H,W) bool; key uint32 (2,)."""
        pc, pc_valid = pred._cloud_from_depth(depth, K, cam_scale, mask)
        obs_z = depth * (100.0 / cam_scale)
        out = pred._pose_from_cloud(cad, pc, pc_valid, diam, key, K,
                                    obs_z, mask, sym_rots)
        keep = ("R", "t", "n_inliers", "icp_rmse", "overlap21")
        return {k: out[k] for k in keep if k in out}

    return frame


def export_predictor(pred, obj_id: int, depth_shape: tuple[int, int],
                     platforms: tuple[str, ...] | None = None) -> bytes:
    """Serialize the per-frame pipeline for one CAD object.

    pred: an online-mode api.Predictor (params + cad_bank baked in).
    depth_shape: static (H, W) of the serving camera.
    platforms: e.g. ("tpu", "cpu"); None = the default export platform
    of the exporting host.
    """
    assert pred.mode == "online", "cached mode is host-mediated; export " \
        "targets the self-contained online pipeline"
    H, W = depth_shape
    specs = (
        jax.ShapeDtypeStruct((H, W), jnp.float32),      # depth
        jax.ShapeDtypeStruct((3, 3), jnp.float32),      # K
        jax.ShapeDtypeStruct((), jnp.float32),          # cam_scale
        jax.ShapeDtypeStruct((H, W), jnp.bool_),        # mask
        jax.ShapeDtypeStruct((2,), jnp.uint32),         # PRNG key
    )
    fn = jax.jit(_frame_fn(pred, obj_id))
    if platforms and len(platforms) > 1:
        # one trace must lower for every platform: force the portable
        # XLA attention path (the Pallas flash kernel is a TPU-only
        # custom call that a cpu replay cannot execute)
        from .models.attention import portable_lowering
        with portable_lowering():
            exp = _jax_export.export(fn, platforms=list(platforms))(*specs)
    else:
        exp = _jax_export.export(
            fn, platforms=list(platforms) if platforms else None)(*specs)
    return exp.serialize()


def load_exported(blob: bytes):
    """Deserialized artifact -> callable(depth, K, cam_scale, mask, key)."""
    return _jax_export.deserialize(blob).call
