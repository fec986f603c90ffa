"""End-to-end benchmark: frames/sec/chip for the full inference pipeline.

Data: synthetic-GT BOP frames (real LM CAD model rasterized at distinct
known poses — the shipped sample data has no GT), pushed through the
real data layer (backprojection, outlier removal, FPS, LBO cache). One
jitted program per batch: DPFMNet forward (ported reference weights) ->
spatial-filtering fmap2pointmap -> correspondence-RANSAC -> ICP against
the observed cloud, at production shapes (CAD 5120 x PC 2048 x K 64).

Prints one JSON line; vs_baseline is against the 50 frames/sec/chip
target in BASELINE.json. meta carries pose-accuracy sanity numbers
(ADD-S score vs synthetic GT).
"""
from __future__ import annotations

import json
import time
from pathlib import Path

import numpy as np

from pose6d_tpu import runtime

runtime.configure()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pose6d_tpu.data import read_ply  # noqa: E402
from pose6d_tpu.data.dataset import BOPObjectDataset  # noqa: E402
from pose6d_tpu.data.decimate import decimate_mesh  # noqa: E402
from pose6d_tpu.data.pipeline import collate, make_sample  # noqa: E402
from pose6d_tpu.data.synth import write_bop_scene  # noqa: E402
from pose6d_tpu.models import DPFMConfig, DPFMNet  # noqa: E402
from pose6d_tpu.models.port_weights import load_reference_checkpoint  # noqa: E402
from pose6d_tpu.solvers import (icp_point2point, ransac_pose,  # noqa: E402
                                spatial_filtering_fmap2pointmap)
from pose6d_tpu.train import metrics  # noqa: E402

N_FRAMES = 4
TILE = 2          # batch = N_FRAMES * TILE
N_ITERS = 4
CAD_PLY = "/root/reference/sample-data/lm/models/obj_000005.ply"
WEIGHTS = "/root/reference/weights/weights.pt"
BENCH_ROOT = Path("/tmp/pose6d_bench")


def build_dataset():
    from scipy.spatial.transform import Rotation
    if not (BENCH_ROOT / "synth" / "train_pbr").exists():
        mesh = read_ply(CAD_PLY)
        v, f = decimate_mesh(mesh["verts"], mesh["faces"], 10000)
        diam = float(np.linalg.norm(v.max(0) - v.min(0)))
        rng = np.random.default_rng(0)
        poses = []
        for k in range(N_FRAMES):
            R = Rotation.from_rotvec(rng.normal(size=3) * 0.9).as_matrix()
            t = np.array([rng.uniform(-40, 40), rng.uniform(-30, 30),
                          rng.uniform(550, 750)])
            poses.append((R, t))
        write_bop_scene(BENCH_ROOT, "synth", {"verts": v, "faces": f},
                        obj_id=5, poses=poses, diameter_mm=diam)
    return BOPObjectDataset(BENCH_ROOT, "synth",
                            cache_dir=BENCH_ROOT / "cache")


def main():
    t_setup = time.time()
    ds = build_dataset()
    rng = np.random.default_rng(0)
    samples = []
    for i in range(len(ds)):
        cad, pc, obj = ds[i]
        samples.append(make_sample(cad, pc, obj, rng=rng))
    batch = collate(samples * TILE)
    B = batch["cad"]["xyz"].shape[0]
    setup_s = time.time() - t_setup

    model = DPFMNet(DPFMConfig())
    params = load_reference_checkpoint(WEIGHTS)
    n_fmap = 30

    def one_frame(cad, pc, diam, key):
        out = model.apply(params, cad, pc)
        pairs, pvalid = spatial_filtering_fmap2pointmap(
            out["C"], cad["evecs"][:, :n_fmap], pc["evecs"][:, :n_fmap],
            cad["xyz"], pc["xyz"], cad["valid"], pc["valid"], diam)
        src = cad["xyz"][pairs[0]]
        dst = pc["xyz"][pairs[1]]
        pose = ransac_pose(key, src, dst, pvalid, threshold=0.05 * diam,
                           n_hypotheses=4096, hyp_block=512)
        icp = icp_point2point(cad["xyz"], cad["valid"], pc["xyz"],
                              pc["valid"], pose["R"], pose["t"],
                              max_corr_dist=0.2 * diam, max_iter=30)
        return {"R": icp["R"], "t": icp["t"],
                "n_inliers": pose["n_inliers"]}

    @jax.jit
    def pipeline(batch, key):
        keys = jax.random.split(key, B)
        return jax.vmap(one_frame)(batch["cad"], batch["pc"],
                                   batch["diam_cad"], keys)

    t0 = time.time()
    out = jax.block_until_ready(pipeline(batch, jax.random.PRNGKey(0)))
    compile_s = time.time() - t0

    t0 = time.time()
    for i in range(N_ITERS):
        out = jax.block_until_ready(
            pipeline(batch, jax.random.PRNGKey(i + 1)))
    dt = (time.time() - t0) / N_ITERS
    fps = B / dt

    # accuracy vs synthetic GT
    Rb = np.asarray(out["R"])
    tb = np.asarray(out["t"])
    rot_errs, adds_scores, add_scores = [], [], []
    for i in range(B):
        R_gt = np.asarray(batch["R_m2c"][i])
        t_gt = np.asarray(batch["t_m2c"][i])
        T_gt = np.eye(4); T_gt[:3, :3] = R_gt; T_gt[:3, 3] = t_gt
        T_est = np.eye(4); T_est[:3, :3] = Rb[i]; T_est[:3, 3] = tb[i]
        pts = jnp.asarray(batch["cad"]["xyz"][i])
        valid = jnp.asarray(batch["cad"]["valid"][i])
        diam = float(batch["diam_cad"][i])
        rot_errs.append(float(np.degrees(metrics.angular_error_rad(
            jnp.asarray(R_gt), jnp.asarray(Rb[i])))))
        _, s = metrics.adds_score(jnp.asarray(T_est), jnp.asarray(T_gt),
                                  pts, diam, valid)
        adds_scores.append(float(s))
        _, s2 = metrics.add_score(jnp.asarray(T_est), jnp.asarray(T_gt),
                                  pts, diam, valid)
        add_scores.append(float(s2))

    meta = {"setup_s": round(setup_s, 1), "compile_s": round(compile_s, 1),
            "batch": B,
            "adds_score_mean": round(float(np.mean(adds_scores)), 3),
            "add_score_mean": round(float(np.mean(add_scores)), 3),
            "rot_err_deg_median": round(float(np.median(rot_errs)), 2),
            "device": jax.devices()[0].device_kind}
    print(json.dumps({
        "metric": "frames_per_sec_per_chip_full_pipeline",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 50.0, 3),
        "meta": meta,
    }))


if __name__ == "__main__":
    main()
