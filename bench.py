"""End-to-end benchmark: frames/sec/chip for the full inference pipeline.

Data: synthetic-GT BOP frames (real LM CAD model rasterized at distinct
known poses — the shipped sample data has no GT), pushed through the
real data layer (backprojection, outlier removal, FPS, LBO cache). One
jitted program per batch: DPFMNet forward -> spatial-filtering
fmap2pointmap (exact filter) -> correspondence-RANSAC -> ICP ->
depth-consistency flip disambiguation, at production shapes
(CAD 5120 x PC 2048 x K 64).

Weights: the committed synthetic-trained checkpoint
(weights/synth_seen.msgpack, trained by config/bench_ckpt.yaml on
seed-1 frames of objects 1+5 — disjoint from this bench's seed-0 eval
poses), so the driver-captured accuracy meta reflects a working
pipeline, not the reference weights run out-of-distribution.

Prints one JSON line; vs_baseline is against the 50 frames/sec/chip
target in BASELINE.json. meta carries pose-accuracy numbers vs the
synthetic GT plus train_steps_per_sec (e2e data-parallel train config).
"""
from __future__ import annotations

import json
import os
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
from pose6d_tpu.solvers import (disambiguate_pose_depth,  # noqa: E402
                                icp_cloud_to_model, ransac_pose,
                                spatial_filtering_fmap2pointmap)
from pose6d_tpu.ops.symmetry import (detect_symmetries,  # noqa: E402
                                     disambiguation_bank,
                                     sym_rotation_error_deg)
from pose6d_tpu.solvers.candidates import candidate_select_pose  # noqa: E402
from pose6d_tpu.train import metrics  # noqa: E402

N_FRAMES = 8      # distinct poses per object
BENCH_OBJS = (1, 5)   # the two objects the bench checkpoint trained on
N_ITERS = 8
# rotation-TTA candidates in the frame pipeline. Default 0 = the
# api.Predictor production default (TTA is an opt-in eval-time recipe,
# api.py:53); set POSE6D_BENCH_TTA=4 to bench the TTA recipe instead
# (~2.5x the cost: each extra candidate re-runs encoder + filter).
TTA_ROTATIONS = int(os.environ.get("POSE6D_BENCH_TTA", "0"))
N_TRAIN_ITERS = 8
MODELS_DIR = "/root/reference/sample-data/lm/models"
WEIGHTS = os.environ.get(
    "POSE6D_BENCH_WEIGHTS",
    str(Path(__file__).parent / "weights" / "synth_seen.msgpack"))
BENCH_ROOT = Path("/tmp/pose6d_bench_v2")


def build_datasets():
    """One dataset per object, N_FRAMES distinct poses each — the
    accuracy meta averages over len(BENCH_OBJS) x N_FRAMES distinct
    (object, pose) pairs (no duplicated frames in the batch)."""
    from scipy.spatial.transform import Rotation
    out = []
    for obj_id in BENCH_OBJS:
        name = f"synth_o{obj_id}"
        if not (BENCH_ROOT / name / "train_pbr").exists():
            mesh = read_ply(f"{MODELS_DIR}/obj_{obj_id:06d}.ply")
            v, f = decimate_mesh(mesh["verts"], mesh["faces"], 10000)
            diam = float(np.linalg.norm(v.max(0) - v.min(0)))
            # same pose distribution as the training scenes
            # (cli/synth_data.py defaults, config/bench_ckpt.yaml) — but
            # seed 0, disjoint from the seed-1 training poses
            rng = np.random.default_rng(obj_id * 1000)
            poses = []
            for k in range(N_FRAMES):
                R = Rotation.from_rotvec(
                    rng.normal(size=3) * 0.9).as_matrix()
                t = np.array([rng.uniform(-60, 60), rng.uniform(-40, 40),
                              rng.uniform(900, 1200)])
                poses.append((R, t))
            write_bop_scene(BENCH_ROOT, name, {"verts": v, "faces": f},
                            obj_id=obj_id, poses=poses, diameter_mm=diam)
        out.append(BOPObjectDataset(BENCH_ROOT, name,
                                    cache_dir=BENCH_ROOT / "cache"))
    return out


def load_params(model):
    from pose6d_tpu.train.checkpoint import load_params as load_native
    rng = np.random.default_rng(0)

    def shape(v, n):
        return {"xyz": jnp.asarray(rng.normal(size=(v, 3)), jnp.float32),
                "mass": jnp.ones((v,), jnp.float32),
                "evals": jnp.ones((64,), jnp.float32),
                "evecs": jnp.asarray(rng.normal(size=(v, 64)), jnp.float32),
                "valid": jnp.ones((v,), bool)}

    template = model.init(jax.random.PRNGKey(0), shape(256, 250),
                          shape(128, 120))
    if WEIGHTS.endswith(".pt"):
        from pose6d_tpu.models.port_weights import load_reference_checkpoint
        return load_reference_checkpoint(WEIGHTS)
    return load_native(WEIGHTS, template)


def _require_backend(timeout_s: int = 900):
    """Fail loudly if the device backend can't come up.

    The tunneled TPU backend has been observed to hang indefinitely at
    init during outages (no error, blocked socket) — uninterruptibly,
    so the probe runs in a killable child process. A hung bench stalls
    the whole harness; an explicit error record does not.
    """
    import subprocess
    import sys
    try:
        subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, check=True, capture_output=True)
    except (subprocess.TimeoutExpired, subprocess.CalledProcessError):
        print(json.dumps({
            "metric": "frames_per_sec_per_chip_full_pipeline",
            "value": 0.0, "unit": "frames/s", "vs_baseline": 0.0,
            "meta": {"error":
                     f"device backend unavailable after {timeout_s}s"}}))
        sys.exit(2)
    return jax.devices()[0]


def main(profile_dir: str | None = None):
    _require_backend()
    t_setup = time.time()
    rng = np.random.default_rng(0)
    samples, frames_meta, sym_banks = [], [], {}
    for ds in build_datasets():
        for idx in range(len(ds)):
            cad, pc, obj = ds[idx]
            samples.append(make_sample(cad, pc, obj, rng=rng))
            i, j = ds.mapping_list[idx]
            frame = ds.scenes[i]
            K = np.asarray(frame["camera"]["cam_K"],
                           np.float32).reshape(3, 3)
            depth_scale = float(frame["camera"]["depth_scale"])
            # observed depth in pipeline units (cm); 0 where invalid
            obs_z = (np.asarray(frame["depth"], np.float32)
                     * depth_scale * 0.1)
            mask = np.asarray(frame["seg"][j] == 255)
            # detected near-symmetry bank: targeted flip hypotheses for
            # the disambiguation stage + rot-err-modulo-symmetry meta
            cv = np.asarray(cad["xyz"])
            frames_meta.append({"K": K, "obs_z": obs_z, "mask": mask,
                                "sym_rots": sym_banks.setdefault(
                                    int(obj["obj_id"]),
                                    disambiguation_bank(cv, max_rots=6))})
    batch = collate(samples)
    fb = collate(frames_meta)
    B = batch["cad"]["xyz"].shape[0]
    # Steady-state device-resident measurement: a production pipeline
    # double-buffers host->device copies behind compute (the repo's
    # HostLoader prefetches); this driver host reaches the chip through
    # a ~75 MB/s tunnel that would otherwise dominate (28 MB/batch).
    batch = jax.device_put(batch)
    fb = jax.device_put(fb)
    jax.block_until_ready((batch, fb))
    setup_s = time.time() - t_setup

    model = DPFMNet(DPFMConfig())
    params = load_params(model)
    n_fmap = 30

    def one_frame(cad, pc, diam, key, K, obs_z, mask, sym_rots):
        # the production inference recipe (api.Predictor defaults):
        # forward -> spatial filter -> adaptive RANSAC -> observed-cloud
        # ICP -> flip disambiguation. With POSE6D_BENCH_TTA>1 the
        # opt-in rotation-TTA recipe is benched instead: candidate maps
        # -> depth-evidence winner select (engages only on weak base
        # maps) -> ICP -> disambiguation.
        sel = candidate_select_pose(
            lambda c, q: model.apply(params, c, q), cad, pc, diam, key,
            K, obs_z, mask, n_fmap=n_fmap, tta_rotations=TTA_ROTATIONS,
            ransac_hypotheses=4096, icp_iters=30)
        fix = disambiguate_pose_depth(
            cad["xyz"], cad["valid"], pc["xyz"], pc["valid"],
            sel["R"], sel["t"], diam, K, obs_z, mask,
            sym_rots=sym_rots)
        return {"R": fix["R"], "t": fix["t"],
                "n_inliers": sel["n_inliers"],
                "candidate": sel["candidate"],
                "flip_hypothesis": fix["hypothesis"]}

    @jax.jit
    def pipeline(batch, fb, key):
        keys = jax.random.split(key, B)
        return jax.vmap(one_frame)(batch["cad"], batch["pc"],
                                   batch["diam_cad"], keys,
                                   fb["K"], fb["obs_z"], fb["mask"],
                                   fb["sym_rots"])

    def run_and_fetch(key):
        """Execute one pipeline batch and FORCE a value round-trip.

        jax.block_until_ready on this tunneled single-chip backend
        returns once the work is *enqueued*, not completed (measured:
        a 1 s device program "blocks" in ~1 ms), so timing loops built
        on it report dispatch rate, not throughput — the BENCH_r01-r03
        values were inflated this way. Fetching a (tiny) output value
        cannot complete before the device program has, so this is the
        honest completion barrier; the old dispatch rate is kept in
        meta for cross-round continuity.
        """
        o = pipeline(batch, fb, key)
        np.asarray(o["t"])   # value fetch == real completion barrier
        return o

    t0 = time.time()
    out = run_and_fetch(jax.random.PRNGKey(0))
    compile_s = time.time() - t0

    # Throughput: dispatch N_ITERS batches back-to-back and fetch only
    # the LAST output. The device executes enqueued programs in order,
    # so the final value cannot arrive before every batch has run —
    # this amortizes the host<->device tunnel round-trip over the whole
    # window instead of paying it per batch (which would measure tunnel
    # latency, not chip throughput).
    t0 = time.time()
    outs = [pipeline(batch, fb, jax.random.PRNGKey(i + 1))
            for i in range(N_ITERS)]
    np.asarray(outs[-1]["t"])   # ordered queue: barriers all N_ITERS
    dt = (time.time() - t0) / N_ITERS
    fps = B / dt
    out = outs[-1]

    # single-batch latency (dispatch -> value on host), for serving
    t0 = time.time()
    run_and_fetch(jax.random.PRNGKey(0))
    latency_s = time.time() - t0

    # dispatch-only rate (what block_until_ready used to measure)
    t0 = time.time()
    for i in range(N_ITERS):
        jax.block_until_ready(pipeline(batch, fb, jax.random.PRNGKey(i)))
    dispatch_fps = B / ((time.time() - t0) / N_ITERS)
    np.asarray(pipeline(batch, fb, jax.random.PRNGKey(0))["t"])  # drain

    if profile_dir:
        # One traced steady-state iteration of the fused pipeline, plus
        # a per-stage wall-clock breakdown. The production pipeline is
        # ONE jit (XLA fuses across stage boundaries), so the breakdown
        # runs each stage as its own jitted+synced program — stage sums
        # exceed the fused time by design; the ratio between them is the
        # measured fusion win. Open the trace in Perfetto/XProf.
        from pose6d_tpu.utils.profiling import StageTimer, profile_trace

        def synced(x):
            """Fetch the smallest output leaf — an honest completion
            barrier that doesn't distort the timing with large
            transfers (block_until_ready only measures dispatch on
            this backend; see run_and_fetch)."""
            leaves = jax.tree_util.tree_leaves(x)
            np.asarray(min(leaves, key=lambda a: a.size))
            return x

        timer = StageTimer()
        with profile_trace(profile_dir):
            with timer("pipeline_fused"):
                synced(pipeline(batch, fb, jax.random.PRNGKey(99)))

        fwd = jax.jit(jax.vmap(lambda c, p: model.apply(params, c, p)))
        solver = jax.jit(jax.vmap(
            lambda C, c, p, d: spatial_filtering_fmap2pointmap(
                C, c["evecs"][:, :n_fmap], p["evecs"][:, :n_fmap],
                c["xyz"], p["xyz"], c["valid"], p["valid"], d)))
        ransac_b = jax.jit(jax.vmap(
            lambda k, s, d2, v, d: ransac_pose(
                k, s, d2, v, threshold=0.05 * d,
                n_hypotheses=4096, hyp_block=512)))
        icp_b = jax.jit(jax.vmap(
            lambda c, p, R, t, d: icp_cloud_to_model(
                c["xyz"], c["valid"], p["xyz"], p["valid"], R, t,
                max_corr_dist=0.2 * d, max_iter=30)))
        disamb_b = jax.jit(jax.vmap(
            lambda c, p, R, t, d, K, z, m, sr: disambiguate_pose_depth(
                c["xyz"], c["valid"], p["xyz"], p["valid"],
                R, t, d, K, z, m, sym_rots=sr)))
        keys = jax.random.split(jax.random.PRNGKey(99), B)
        # warm-up compiles outside the timers
        o = fwd(batch["cad"], batch["pc"])
        prs, pvs = solver(o["C"], batch["cad"], batch["pc"],
                          batch["diam_cad"])
        src = jnp.take_along_axis(batch["cad"]["xyz"],
                                  prs[:, 0][..., None], axis=1)
        dst = jnp.take_along_axis(batch["pc"]["xyz"],
                                  prs[:, 1][..., None], axis=1)
        po = ransac_b(keys, src, dst, pvs, batch["diam_cad"])
        ic = icp_b(batch["cad"], batch["pc"], po["R"], po["t"],
                   batch["diam_cad"])
        jax.block_until_ready(disamb_b(
            batch["cad"], batch["pc"], ic["R"], ic["t"],
            batch["diam_cad"], fb["K"], fb["obs_z"], fb["mask"],
            fb["sym_rots"]))
        for _ in range(3):
            with timer("1_forward"):
                o = synced(fwd(batch["cad"], batch["pc"]))
            with timer("2_spatial_filter"):
                prs, pvs = synced(solver(
                    o["C"], batch["cad"], batch["pc"], batch["diam_cad"]))
            src = jnp.take_along_axis(batch["cad"]["xyz"],
                                      prs[:, 0][..., None], axis=1)
            dst = jnp.take_along_axis(batch["pc"]["xyz"],
                                      prs[:, 1][..., None], axis=1)
            with timer("3_ransac"):
                po = synced(ransac_b(
                    keys, src, dst, pvs, batch["diam_cad"]))
            with timer("4_icp"):
                ic = synced(icp_b(
                    batch["cad"], batch["pc"], po["R"], po["t"],
                    batch["diam_cad"]))
            with timer("5_disambiguate"):
                synced(disamb_b(
                    batch["cad"], batch["pc"], ic["R"], ic["t"],
                    batch["diam_cad"], fb["K"], fb["obs_z"], fb["mask"],
                    fb["sym_rots"]))
        summary = {"batch": B, "platform": jax.devices()[0].platform,
                   "frames_per_sec": round(B / dt, 2),
                   "stages": timer.summary()}
        Path(profile_dir).mkdir(parents=True, exist_ok=True)
        (Path(profile_dir) / "stage_summary.json").write_text(
            json.dumps(summary, indent=2))
        print(f"# profile trace + stage_summary.json -> {profile_dir}")

    # accuracy vs synthetic GT
    Rb = np.asarray(out["R"])
    tb = np.asarray(out["t"])
    rot_errs, adds_scores, add_scores, obj_ids = [], [], [], []
    rot_errs_sym = []
    # tight-tau symmetry groups per object for error-mod-symmetry
    # (detection tau 0.02 — report only real near-symmetries; the
    # disambiguation bank above uses a looser tau by design)
    sym_groups = {}
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
        oid = int(np.asarray(batch["obj_id"][i]))
        if oid not in sym_groups:
            vfull = np.asarray(pts)[np.asarray(valid)]
            sym_groups[oid] = detect_symmetries(vfull)[0]
        rot_errs_sym.append(sym_rotation_error_deg(
            R_gt, Rb[i], sym_groups[oid]))
        _, s = metrics.adds_score(jnp.asarray(T_est), jnp.asarray(T_gt),
                                  pts, diam, valid)
        adds_scores.append(float(s))
        _, s2 = metrics.add_score(jnp.asarray(T_est), jnp.asarray(T_gt),
                                  pts, diam, valid)
        add_scores.append(float(s2))
        obj_ids.append(int(np.asarray(batch["obj_id"][i])))

    # e2e bf16 data-parallel training throughput (BASELINE config 5);
    # single local chip here -> plain jit (the sharded path is exercised
    # by dryrun_multichip on the virtual mesh)
    from pose6d_tpu.train.train_step import make_train_step
    init_fn, step_fn, _ = make_train_step(DPFMConfig())
    tkey = jax.random.PRNGKey(0)
    state = init_fn(tkey, batch)
    tstep = jax.jit(step_fn)
    state, logs = tstep(state, batch, tkey)   # compile
    float(logs["loss"])
    t0 = time.time()
    for i in range(N_TRAIN_ITERS):
        state, logs = tstep(state, batch, jax.random.fold_in(tkey, i))
    float(logs["loss"])   # value fetch: honest completion barrier
    train_sps = N_TRAIN_ITERS / (time.time() - t0)

    meta = {"setup_s": round(setup_s, 1), "compile_s": round(compile_s, 1),
            "batch": B,
            "weights": Path(WEIGHTS).name,
            "adds_score_mean": round(float(np.mean(adds_scores)), 3),
            "add_score_mean": round(float(np.mean(add_scores)), 3),
            "rot_err_deg_median": round(float(np.median(rot_errs)), 2),
            # error modulo the object's detected symmetry group — the
            # identifiable part of the rotation error (raw stays the
            # number of record; on near-symmetric objects raw conflates
            # symmetry-equivalent and genuinely wrong poses)
            "rot_err_deg_sym_median": round(
                float(np.median(rot_errs_sym)), 2),
            "rot_err_deg_sym": [round(r, 1) for r in rot_errs_sym],
            # per-object rows: obj_5 is rotationally near-symmetric, so
            # its plain ADD is structurally ~0 even at a perfect pose
            # (the reference reports ADD-S for such objects) — pooled
            # means understate obj_1. Keys: per_obj[obj_id] = [ADD,
            # ADD-S, median rot err deg].
            "per_obj": {
                str(o): [
                    round(float(np.mean([a for a, q in zip(add_scores, obj_ids) if q == o])), 3),
                    round(float(np.mean([a for a, q in zip(adds_scores, obj_ids) if q == o])), 3),
                    round(float(np.median([r for r, q in zip(rot_errs, obj_ids) if q == o])), 2),
                ] for o in sorted(set(obj_ids))},
            # which path produced each pose: TTA candidate id (0 = base
            # map) and flip-disambiguation hypothesis id (0 = keep) —
            # localizes accuracy movement to selection vs disambiguation
            "candidate_ids": np.asarray(out["candidate"]).tolist(),
            "flip_ids": np.asarray(out["flip_hypothesis"]).tolist(),
            "rot_err_deg": [round(r, 1) for r in rot_errs],
            "tta_rotations": TTA_ROTATIONS,
            "latency_s_per_batch": round(latency_s, 3),
            "train_steps_per_sec": round(train_sps, 2),
            "train_frames_per_sec": round(train_sps * B, 1),
            "dispatch_frames_per_sec": round(dispatch_fps, 1),
            "timing_note": ("amortized value-fetch barrier over "
                            f"{N_ITERS} back-to-back batches; rounds "
                            "1-3 used block_until_ready, which only "
                            "measures dispatch rate on this backend "
                            "(kept as dispatch_frames_per_sec). "
                            "Pipeline = api.Predictor defaults "
                            "(TTA off unless POSE6D_BENCH_TTA is set)."),
            "device": jax.devices()[0].device_kind}
    print(json.dumps({
        "metric": "frames_per_sec_per_chip_full_pipeline",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 50.0, 3),
        "meta": meta,
    }))


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--profile", default=None, metavar="DIR",
                    help="dump a jax.profiler trace + stage summary")
    main(profile_dir=ap.parse_args().profile)
