"""Per-(frame, instance) object dataset: preprocessing + LBO cache.

Mirrors the reference's base_object_dataset (dataset/object.py:16-338) —
the preprocessing heart of the pipeline. Per sample:

  1. visibility filter (min_vis) + obj_take filter         (object.py:107-109)
  2. mask erosion + depth backprojection (x100 units)       (object.py:73-88)
  3. statistical outlier removal (20 NN, 0.3 sigma)         (object.py:33-50)
  4. FPS cap at max_pc=2000 points                          (object.py:145-148)
  5. CAD load + QEM decimation to 10k faces + x0.1 scale    (object.py:171-173)
  6. GT-aligned cloud (inverse model-to-cam transform)      (object.py:174)
  7. GT correspondences within r=0.05*diam + overlap masks  (object.py:177-186)
  8. LBO operators (k_eig=64) for CAD (per obj, shared) and
     per-frame point cloud, npz-cached                      (object.py:214,246)

Steps 2-4 and 7 run through the jitted mask-aware device ops from
pose6d_tpu.ops; 5 and 8 are host-side cache-build work exactly like the
reference's generate_cache stage. Cache layout mirrors the reference:
{i}_{j}_obj.npz, CAD_LBO_{obj_id}.npz, {i}_{j}_pc_LBO.npz,
mapping_list.npz (object.py:124-126,188,238,269).
"""
from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from .bop import BOPSceneDataset
from .decimate import decimate_mesh
from .ply import read_ply

MAX_RAW_POINTS = 32768


class SampleDropped(Exception):
    """Raised when a sample fails preprocessing and is removed from the
    mapping list (reference self-healing behavior,
    dataset/object.py:247-251)."""


class BOPObjectDataset:
    def __init__(self, data_root, render_data_name, mode: str = "train_pbr",
                 min_vis: float = 0.3, cache_dir=None, lbo_pc: bool = True,
                 obj_take=(), num_samples: int = -1, k_eig: int = 64,
                 max_pc: int = 2000, target_faces: int = 10000,
                 models_dir: str = "models",
                 pc_lbo_backend: str = "host",
                 build_gradients: bool = False):
        """pc_lbo_backend: 'host' = scipy eigsh over the local-triangulation
        Laplacian (reference protocol); 'device' = the jittable graph
        Laplacian + LOBPCG (spectral/device_lbo.py) — use this when the
        model will run in the online on-device mode so train and inference
        see the same operator family.

        build_gradients: also build + cache gather-form tangent-gradient
        operators (spectral/operators.py:gradients_to_gather) for both
        shapes — required by the with_gradient_features model variant
        (reference computes them in its cache, dataset/object.py:214).
        Host pc_lbo_backend only."""
        if build_gradients and pc_lbo_backend != "host":
            raise ValueError("build_gradients requires the host "
                             "pc_lbo_backend (tangent frames come from "
                             "the host operator build)")
        self.scenes = BOPSceneDataset(data_root, render_data_name, mode,
                                      num_samples=num_samples,
                                      cache_dir=cache_dir)
        self.data_root = Path(data_root)
        self.render_data_name = str(render_data_name)
        self.min_vis = min_vis
        self.lbo_pc = lbo_pc
        self.obj_take = list(obj_take)
        self.k_eig = k_eig
        self.max_pc = max_pc
        self.target_faces = target_faces
        self.models_dir = models_dir
        self.pc_lbo_backend = pc_lbo_backend
        self.build_gradients = build_gradients
        self.cache_dir = None
        self.cache_root = None
        if cache_dir is not None:
            self.cache_root = Path(cache_dir)
            self.cache_dir = Path(cache_dir) / self.render_data_name / mode
            self.cache_dir.mkdir(parents=True, exist_ok=True)
        self._cad_hash = {}
        # in-memory memo: cad_operators is hit once per *sample* by the
        # loader threads but there are only a handful of objects per
        # dataset; re-np.load-ing a multi-MB npz per sample costs more
        # than the rest of the host pipeline (benign if racy: all
        # writers store identical dicts)
        self._cad_mem = {}
        self._models_info = None
        self._collect_obj_data()

    # ------------------------------------------------------------------
    @property
    def models_info(self):
        if self._models_info is None:
            p = (self.data_root / self.render_data_name / self.models_dir /
                 "models_info.json")
            self._models_info = json.loads(p.read_text())
        return self._models_info

    def _collect_obj_data(self):
        cache_file = (self.cache_dir / "mapping_list.npz"
                      if self.cache_dir else None)
        if cache_file is not None and cache_file.exists():
            self.mapping_list = [tuple(x) for x in
                                 np.load(cache_file)["mapping_list"]]
            # the cached mapping covers the full scene walk; respect a
            # num_samples-truncated scene view (data/bop.py)
            n = len(self.scenes)
            self.mapping_list = [m for m in self.mapping_list if m[0] < n]
            return
        self.mapping_list = []
        for i in range(len(self.scenes)):
            frame = self.scenes[i]
            infos = frame["scene_info"]
            gts = frame["scene_gt"]
            for j, info in enumerate(infos):
                if info["visib_fract"] < self.min_vis:
                    continue
                if gts is not None and self.obj_take:
                    if gts[j]["obj_id"] not in self.obj_take:
                        continue
                self.mapping_list.append((i, j))
        # persist only full walks (see data/bop.py scene-list rationale)
        if cache_file is not None and self.scenes.num_samples <= 0:
            np.savez(cache_file,
                     mapping_list=np.asarray(self.mapping_list, np.int64))

    def __len__(self):
        return len(self.mapping_list)

    # ------------------------------------------------------------------
    def _preprocess_cloud(self, depth, K, depth_scale, seg_mask):
        """Backproject + clean + FPS; returns (pc (N,3) float32)."""
        import jax.numpy as jnp
        from ..ops import geometry, sampling
        # Pick the pad buffer as the smallest power-of-two bucket that
        # holds this frame's masked pixels (erosion only shrinks the
        # mask). Typical frames carry 3-10k points, so bucketing cuts
        # the outlier-removal / FPS work 3-8x vs always padding to
        # MAX_RAW_POINTS, at the cost of one compile per bucket.
        n_mask = int(np.count_nonzero(np.asarray(seg_mask)))
        bucket = max(4096, 1 << max(n_mask - 1, 1).bit_length())
        bucket = min(bucket, MAX_RAW_POINTS)
        pts, valid = geometry.backproject_depth(
            jnp.asarray(depth), jnp.asarray(K, jnp.float32),
            1000.0 / depth_scale, jnp.asarray(seg_mask),
            max_points=bucket)
        keep = geometry.statistical_outlier_mask(pts, valid)
        n_keep = int(keep.sum())
        if n_keep > self.max_pc:
            idx, sel_valid = sampling.farthest_point_sample(
                pts, keep, self.max_pc)
            pc = np.asarray(pts)[np.asarray(idx)][np.asarray(sel_valid)]
        else:
            pc = np.asarray(pts)[np.asarray(keep)]
        return pc.astype(np.float32)

    def _gt_correspondences(self, cad_xyz, align_pc, radius):
        import jax.numpy as jnp
        from ..ops import geometry

        # Pad both clouds to 512-multiples so the jitted radius mask
        # compiles once per bucket, not once per sample: align_pc's
        # length is unique per frame, and an unpadded call re-tiles and
        # re-compiles the O(V1*V2) kernel every __getitem__ (~5.5 s of
        # XLA compile per cached sample — 10x the actual math).
        def _pad(a):
            n = len(a)
            m512 = 512 * ((n + 511) // 512)
            out = np.zeros((m512, 3), np.float32)
            out[:n] = a
            return out, np.arange(m512) < n

        cad_p, cad_v = _pad(cad_xyz)
        pc_p, pc_v = _pad(align_pc)
        m = geometry.radius_correspondence_mask(
            jnp.asarray(cad_p), jnp.asarray(cad_v),
            jnp.asarray(pc_p), jnp.asarray(pc_v), radius)
        m = np.asarray(m)[:len(cad_xyz), :len(align_pc)]
        pairs = np.argwhere(m)
        o12 = m.any(axis=1).astype(np.int8)
        o21 = m.any(axis=0).astype(np.int8)
        return pairs.astype(np.int64), o12, o21

    def cad_operators(self, obj_id: int):
        """Decimated CAD mesh + spectral operators, cached per object.

        The cache is content-addressed (md5 of the ply file + the build
        knobs) and shared across datasets under <cache_root>/shared_cad:
        corpora rendered from the same CAD bank (e.g. the seed-20 and
        seed-77 LM corpora, or the three eval families) reuse one
        ~2-minute eigsh build instead of paying it once per dataset dir.
        Legacy per-dataset CAD_LBO_<id>.npz files are still honored.
        """
        if obj_id in self._cad_mem:
            return self._cad_mem[obj_id]
        gsuf = "_grad" if self.build_gradients else ""
        cad_path = (self.data_root / self.render_data_name / self.models_dir
                    / f"obj_{obj_id:06d}.ply")
        cache_file = (self.cache_dir / f"CAD_LBO_{obj_id}{gsuf}.npz"
                      if self.cache_dir else None)
        if cache_file is not None and cache_file.exists():
            out = {k: np.ascontiguousarray(v) for k, v in
                   np.load(cache_file, allow_pickle=False).items()}
            self._cad_mem[obj_id] = out
            return out
        shared_file = None
        if self.cache_root is not None:
            if obj_id not in self._cad_hash:
                import hashlib
                self._cad_hash[obj_id] = hashlib.md5(
                    cad_path.read_bytes()).hexdigest()[:16]
            shared_dir = self.cache_root / "shared_cad"
            shared_file = shared_dir / (
                f"CAD_LBO_{self._cad_hash[obj_id]}_f{self.target_faces}"
                f"_k{self.k_eig}{gsuf}.npz")
            if shared_file.exists():
                out = {k: np.ascontiguousarray(v) for k, v in
                       np.load(shared_file, allow_pickle=False).items()}
                self._cad_mem[obj_id] = out
                return out
            shared_dir.mkdir(parents=True, exist_ok=True)
        from ..spectral import gradients_to_gather, mesh_operators
        mesh = read_ply(cad_path)
        verts, faces = decimate_mesh(mesh["verts"], mesh["faces"],
                                     self.target_faces)
        verts = verts * 0.1  # reference scale_cad (object.py:173)
        so = mesh_operators(verts, faces, k_eig=self.k_eig,
                            build_gradients=self.build_gradients)
        out = {
            "xyz": so.xyz, "faces": so.faces.astype(np.int32),
            "norm": so.normals, "frames": so.frames, "mass": so.mass,
            "evals": so.evals, "evecs": so.evecs,
        }
        if self.build_gradients:
            gi, gx, gy = gradients_to_gather(so.gradX, so.gradY)
            out.update(grad_idx=gi, grad_cx=gx, grad_cy=gy)
        if shared_file is not None:
            np.savez(shared_file, **out)
        elif cache_file is not None:
            np.savez(cache_file, **out)
        self._cad_mem[obj_id] = out
        return out

    def pc_operators(self, i: int, j: int, pc: np.ndarray):
        suffix = "_dev" if self.pc_lbo_backend == "device" else ""
        if self.build_gradients:
            suffix += "_grad"
        cache_file = (self.cache_dir / f"{i}_{j}_pc_LBO{suffix}.npz"
                      if self.cache_dir else None)
        if cache_file is not None and cache_file.exists():
            return dict(np.load(cache_file, allow_pickle=False))
        if self.pc_lbo_backend == "device":
            import jax.numpy as jnp
            from ..spectral.device_lbo import device_pc_operators
            v = len(pc)
            vpad = 256 * ((self.max_pc + 255) // 256)  # one compile shape
            pts = np.zeros((vpad, 3), np.float32)
            pts[:v] = pc
            valid = np.arange(vpad) < v
            mass, evals, evecs = device_pc_operators(
                jnp.asarray(pts), jnp.asarray(valid), k_eig=self.k_eig)
            out = {
                "xyz": pc.astype(np.float32),
                "frames": np.zeros((v, 3, 3), np.float32),
                "mass": np.asarray(mass)[:v],
                "evals": np.asarray(evals),
                "evecs": np.asarray(evecs)[:v],
            }
        else:
            from ..spectral import (gradients_to_gather,
                                    point_cloud_operators)
            so = point_cloud_operators(
                pc, k_eig=self.k_eig,
                build_gradients=self.build_gradients)
            out = {
                "xyz": so.xyz, "frames": so.frames, "mass": so.mass,
                "evals": so.evals, "evecs": so.evecs,
            }
            if self.build_gradients:
                gi, gx, gy = gradients_to_gather(so.gradX, so.gradY)
                out.update(grad_idx=gi, grad_cx=gx, grad_cy=gy)
        if cache_file is not None:
            np.savez(cache_file, **out)
        return out

    # ------------------------------------------------------------------
    def __getitem__(self, index):
        i, j = self.mapping_list[index]
        obj_file = (self.cache_dir / f"{i}_{j}_obj.npz"
                    if self.cache_dir else None)
        if obj_file is not None and obj_file.exists():
            obj = dict(np.load(obj_file, allow_pickle=True))
            obj_id = int(obj["obj_id"])
        else:
            frame = self.scenes[i]
            gt = frame["scene_gt"][j] if frame["scene_gt"] else None
            if gt is None:
                raise ValueError(
                    f"frame {i} has no scene_gt.json; GT-dependent sample "
                    "generation needs poses")
            obj_id = gt["obj_id"]
            seg_mask = frame["seg"][j] == 255
            K = np.asarray(frame["camera"]["cam_K"],
                           np.float64).reshape(3, 3)
            pc = self._preprocess_cloud(frame["depth"], K,
                                        frame["camera"]["depth_scale"],
                                        seg_mask)
            R = np.asarray(gt["cam_R_m2c"], np.float64).reshape(3, 3)
            t = np.asarray(gt["cam_t_m2c"], np.float64) * 0.1
            diam = self.models_info[str(obj_id)]["diameter"] * 0.1
            cad = self.cad_operators(obj_id)
            # GT-aligned cloud in the model frame (object.py:174,304-309)
            align_pc = (pc - t.reshape(1, 3)) @ R
            pairs, o12, o21 = self._gt_correspondences(
                cad["xyz"], align_pc, radius=diam * 0.05)
            obj = {
                "visib_fract": frame["scene_info"][j]["visib_fract"],
                "R_m2c": R.astype(np.float32),
                "t_m2c": t.astype(np.float32),
                "obj_id": obj_id,
                # camera intrinsics + image dims: consumed by the pose
                # stage's depth-render flip disambiguation
                "K": K.astype(np.float32),
                "im_hw": np.asarray(frame["depth"].shape, np.int32),
                "pcd_depth": pc,
                "scale_cad": 0.1,
                "diam_cad": diam,
                "align_pc": align_pc.astype(np.float32),
                "P": pairs,
                "overlap_12": o12,
                "overlap_21": o21,
            }
            if obj_file is not None:
                np.savez(obj_file, **obj)
        cad = self.cad_operators(obj_id)
        pc_ops = None
        if self.lbo_pc:
            try:
                pc_ops = self.pc_operators(i, j, np.asarray(obj["pcd_depth"],
                                                            np.float32))
            except Exception as e:
                # self-heal: drop the sample from the mapping list and
                # persist, mirroring reference dataset/object.py:247-251
                self.mapping_list = [m for m in self.mapping_list
                                     if tuple(m) != (i, j)]
                if self.cache_dir is not None:
                    np.savez(self.cache_dir / "mapping_list.npz",
                             mapping_list=np.asarray(self.mapping_list,
                                                     np.int64))
                raise SampleDropped(f"sample ({i},{j}): {e!r}") from e
        return cad, pc_ops, obj
