import json

import numpy as np
import pytest

from pose6d_tpu.data import read_ply, write_ply_mesh, write_ply_points
from pose6d_tpu.data.decimate import decimate_mesh

from bop_fixture import write_bop_scene


@pytest.fixture(scope="module")
def small_mesh():
    m = read_ply("/root/reference/sample-data/lm/models_eval/obj_000001.ply")
    # decimate for test speed
    v, f = decimate_mesh(m["verts"], m["faces"], 2000)
    return {"verts": v, "faces": f}


@pytest.fixture(scope="module")
def bop_root(tmp_path_factory, small_mesh):
    root = tmp_path_factory.mktemp("bop")
    rng = np.random.default_rng(0)
    from scipy.spatial.transform import Rotation
    R = Rotation.from_rotvec([0.3, -0.2, 0.5]).as_matrix()
    t = np.array([20.0, -10.0, 600.0])  # mm
    diam = float(np.linalg.norm(
        small_mesh["verts"].max(0) - small_mesh["verts"].min(0)))
    write_bop_scene(root, "synth", small_mesh, obj_id=7, R=R, t_mm=t,
                    diameter_mm=diam)
    return root, R, t, diam


class TestPlyIO:
    def test_roundtrip_mesh(self, tmp_path, small_mesh):
        p = tmp_path / "m.ply"
        write_ply_mesh(p, small_mesh["verts"], small_mesh["faces"])
        m = read_ply(p)
        np.testing.assert_allclose(m["verts"], small_mesh["verts"], rtol=1e-6)
        assert (m["faces"] == small_mesh["faces"]).all()

    def test_roundtrip_points(self, tmp_path):
        rng = np.random.default_rng(0)
        pts = rng.normal(size=(100, 3)).astype(np.float32)
        col = rng.integers(0, 255, (100, 3)).astype(np.uint8)
        p = tmp_path / "p.ply"
        write_ply_points(p, pts, col)
        m = read_ply(p)
        np.testing.assert_allclose(m["verts"], pts, rtol=1e-6)
        assert (m["colors"] == col).all()

    def test_reads_reference_models(self):
        m = read_ply("/root/reference/sample-data/lm/models/obj_000001.ply")
        assert len(m["verts"]) == 5841
        assert m["normals"] is not None


class TestDecimate:
    def test_reaches_target(self, small_mesh):
        v, f = decimate_mesh(small_mesh["verts"], small_mesh["faces"], 500)
        assert len(f) <= 500
        assert f.min() >= 0 and f.max() < len(v)

    def test_geometry_preserved(self):
        m = read_ply("/root/reference/sample-data/lm/models/obj_000001.ply")
        v, f = decimate_mesh(m["verts"], m["faces"], 4000)
        from sklearn.neighbors import NearestNeighbors
        nn = NearestNeighbors(n_neighbors=1).fit(m["verts"])
        d, _ = nn.kneighbors(v)
        diam = np.linalg.norm(m["verts"].max(0) - m["verts"].min(0))
        assert d.mean() / diam < 0.01

    def test_noop_below_target(self, small_mesh):
        v, f = decimate_mesh(small_mesh["verts"], small_mesh["faces"],
                             10 ** 6)
        assert len(f) == len(small_mesh["faces"])


class TestBOPDataset:
    def test_scene_walk_and_load(self, bop_root):
        root, R, t, diam = bop_root
        from pose6d_tpu.data.bop import BOPSceneDataset
        ds = BOPSceneDataset(root, "synth")
        assert len(ds) == 1
        frame = ds[0]
        assert frame["depth"].shape == (480, 640)
        assert frame["depth"].max() > 0
        assert frame["scene_gt"][0]["obj_id"] == 7

    def test_num_samples_view_and_cache(self, small_mesh, tmp_path):
        """num_samples is a per-run view: it truncates both fresh walks
        and cached scene lists, and a limited run never writes (poisons)
        the shared scene_list.json."""
        from scipy.spatial.transform import Rotation
        from pose6d_tpu.data.bop import BOPSceneDataset
        root = tmp_path / "bop"
        R = Rotation.from_rotvec([0.1, 0.2, -0.3]).as_matrix()
        diam = float(np.linalg.norm(
            small_mesh["verts"].max(0) - small_mesh["verts"].min(0)))
        write_bop_scene(root, "synth", small_mesh, obj_id=7, R=R,
                        t_mm=np.array([0.0, 0.0, 600.0]),
                        diameter_mm=diam, n_frames=3)
        cache = tmp_path / "cache"
        cache.mkdir()
        listing = cache / "synth" / "train_pbr" / "scene_list.json"
        # limited first: view of 2, and no cache file written
        assert len(BOPSceneDataset(root, "synth", num_samples=2,
                                   cache_dir=cache)) == 2
        assert not listing.exists()
        # full walk writes the cache
        assert len(BOPSceneDataset(root, "synth", cache_dir=cache)) == 3
        assert listing.exists()
        # limit applies to the cached list too; cache stays full
        assert len(BOPSceneDataset(root, "synth", num_samples=2,
                                   cache_dir=cache)) == 2
        assert len(BOPSceneDataset(root, "synth", cache_dir=cache)) == 3

    def test_object_dataset_end_to_end(self, bop_root, tmp_path):
        root, R, t, diam = bop_root
        from pose6d_tpu.data.dataset import BOPObjectDataset
        ds = BOPObjectDataset(root, "synth", cache_dir=tmp_path / "cache",
                              target_faces=2000)
        assert len(ds) == 1
        cad, pc, obj = ds[0]
        # CAD operator contract
        assert cad["evecs"].shape[1] == 64
        assert np.isfinite(cad["evecs"]).all()
        # preprocessed cloud lies on the object surface (cm units):
        # align_pc must sit close to CAD verts
        from sklearn.neighbors import NearestNeighbors
        nn = NearestNeighbors(n_neighbors=1).fit(cad["xyz"])
        d, _ = nn.kneighbors(obj["align_pc"])
        assert np.median(d) < 0.02 * diam * 0.1
        # overlap masks consistent with pair list
        P = obj["P"]
        assert len(P) > 0
        assert obj["overlap_12"].sum() > 0
        assert obj["overlap_21"].sum() > 0.9 * len(obj["pcd_depth"])
        # pose fields in cm
        np.testing.assert_allclose(obj["t_m2c"], np.asarray(t) * 0.1,
                                   rtol=1e-5)

    def test_cache_hit_identical(self, bop_root, tmp_path):
        root, *_ = bop_root
        from pose6d_tpu.data.dataset import BOPObjectDataset
        cache = tmp_path / "cache2"
        ds = BOPObjectDataset(root, "synth", cache_dir=cache,
                              target_faces=2000)
        cad1, pc1, obj1 = ds[0]
        ds2 = BOPObjectDataset(root, "synth", cache_dir=cache,
                               target_faces=2000)
        cad2, pc2, obj2 = ds2[0]
        np.testing.assert_array_equal(obj1["pcd_depth"], obj2["pcd_depth"])
        np.testing.assert_array_equal(cad1["evecs"], cad2["evecs"])
        np.testing.assert_array_equal(pc1["evals"], pc2["evals"])

    def test_shared_cad_cache_across_datasets(self, bop_root, small_mesh,
                                              tmp_path):
        """Two datasets rendered from the same CAD bank share one
        content-addressed CAD-LBO build under <cache_root>/shared_cad."""
        root, R, t, diam = bop_root
        from bop_fixture import write_bop_scene as wbs
        from pose6d_tpu.data.dataset import BOPObjectDataset
        wbs(root, "synth_b", small_mesh, obj_id=7, R=R, t_mm=t,
            diameter_mm=diam)
        cache = tmp_path / "cache_shared"
        ds_a = BOPObjectDataset(root, "synth", cache_dir=cache,
                                target_faces=2000)
        cad_a = ds_a.cad_operators(7)
        shared = list((cache / "shared_cad").glob("CAD_LBO_*.npz"))
        assert len(shared) == 1, shared
        ds_b = BOPObjectDataset(root, "synth_b", cache_dir=cache,
                                target_faces=2000)
        cad_b = ds_b.cad_operators(7)
        # still one shared entry (content hash matched), no per-dataset
        # CAD files written, operators identical
        assert len(list((cache / "shared_cad").glob("*.npz"))) == 1
        assert not list(cache.glob("synth*/train_pbr/CAD_LBO_*.npz"))
        for k in cad_a:
            np.testing.assert_array_equal(cad_a[k], cad_b[k])

    def test_gt_correspondence_padding_invariant(self, bop_root, tmp_path):
        """The 512-bucket padding in _gt_correspondences is semantically
        invisible: results equal the unpadded dense-mask computation."""
        root, *_ = bop_root
        import jax.numpy as jnp

        from pose6d_tpu.data.dataset import BOPObjectDataset
        from pose6d_tpu.ops import geometry
        ds = BOPObjectDataset(root, "synth", cache_dir=None,
                              target_faces=2000)
        cad, pc, obj = ds[0]
        cad_xyz = np.asarray(cad["xyz"])
        align_pc = np.asarray(obj["align_pc"])
        radius = float(obj["diam_cad"]) * 0.05
        m = np.asarray(geometry.radius_correspondence_mask(
            jnp.asarray(cad_xyz, jnp.float32),
            jnp.ones(len(cad_xyz), bool),
            jnp.asarray(align_pc, jnp.float32),
            jnp.ones(len(align_pc), bool), radius))
        np.testing.assert_array_equal(obj["P"], np.argwhere(m))
        np.testing.assert_array_equal(obj["overlap_12"],
                                      m.any(axis=1).astype(np.int8))
        np.testing.assert_array_equal(obj["overlap_21"],
                                      m.any(axis=0).astype(np.int8))


class TestPipeline:
    def test_make_sample_and_collate(self, bop_root, tmp_path):
        root, R, t, diam = bop_root
        from pose6d_tpu.data.dataset import BOPObjectDataset
        from pose6d_tpu.data.pipeline import HostLoader, make_sample
        ds = BOPObjectDataset(root, "synth", cache_dir=tmp_path / "c3",
                              target_faces=2000)
        cad, pc, obj = ds[0]
        s = make_sample(cad, pc, obj)
        assert s["cad"]["xyz"].shape == (5120, 3)
        assert s["pc"]["evecs"].shape == (2048, 64)
        assert s["cgt_A"].shape == (30, 30)
        # C_gt from normal equations reproduces direct lstsq on pairs
        P = np.asarray(obj["P"])
        p2 = cad["evecs"][:, :30][P[:, 0]]
        p1 = pc["evecs"][:, :30][P[:, 1]]
        C_ref = np.linalg.lstsq(p1, p2, rcond=None)[0]
        C_ne = np.linalg.solve(s["cgt_A"] + 1e-8 * np.eye(30), s["cgt_B"])
        np.testing.assert_allclose(C_ne, C_ref, atol=1e-3)

        loader = HostLoader(ds, batch_size=1, shuffle=False)
        batch = next(iter(loader))
        assert batch["cad"]["xyz"].shape == (1, 5120, 3)
        assert batch["pairs"].shape == (1, 4096, 2)


class TestHostLoaderIntegrity:
    """The thread-pool producer must never silently drop frames: a
    worker exception used to end the epoch early (swallowed by the
    finally-sentinel), which truncated eval outputs under load."""

    class _StubDataset:
        def __init__(self, n, fail_at=None):
            self.n = n
            self.fail_at = fail_at

        def __len__(self):
            return self.n

        def __getitem__(self, i):
            if i == self.fail_at:
                raise ValueError("boom")
            cad = {"xyz": np.zeros((4, 3), np.float32),
                   "mass": np.ones(4, np.float32),
                   "evals": np.ones(8, np.float32),
                   "evecs": np.zeros((4, 8), np.float32),
                   "frames": np.zeros((4, 3, 3), np.float32),
                   "norm": np.zeros((4, 3), np.float32)}
            pc = dict(cad)
            obj = {"obj_id": i, "diam_cad": 1.0, "visib_fract": 1.0,
                   "R_m2c": np.eye(3, dtype=np.float32),
                   "t_m2c": np.zeros(3, np.float32),
                   "align_pc": np.zeros((4, 3), np.float32),
                   "P": np.zeros((1, 2), np.int64),
                   "overlap_12": np.zeros(4, np.float32),
                   "overlap_21": np.zeros(4, np.float32)}
            return cad, pc, obj

    def _loader(self, ds, **kw):
        from pose6d_tpu.data.pipeline import HostLoader
        return HostLoader(ds, batch_size=2, shuffle=False, drop_last=False,
                          v_cad=8, v_pc=8, **kw)

    def test_all_frames_delivered(self):
        ds = self._StubDataset(7)
        loader = self._loader(ds)
        seen = []
        for batch in loader:  # obj_id doubles as the frame id
            seen.extend(np.asarray(batch["obj_id"]).tolist())
        assert sorted(set(seen)) == list(range(7))

    def test_worker_exception_propagates(self):
        ds = self._StubDataset(7, fail_at=3)
        loader = self._loader(ds)
        with pytest.raises(ValueError, match="boom"):
            for _ in loader:
                pass


class TestNativeDecimate:
    def test_native_matches_python_quality(self):
        from pose6d_tpu.native import available, decimate_qem
        if not available():
            pytest.skip("no native build")
        m = read_ply("/root/reference/sample-data/lm/models/obj_000001.ply")
        vn, fn = decimate_qem(m["verts"], m["faces"], 4000)
        vp, fp = decimate_mesh(m["verts"], m["faces"], 4000,
                               use_native=False)
        assert len(fn) <= 4000 and len(fp) <= 4000
        assert fn.min() >= 0 and fn.max() < len(vn)
        from sklearn.neighbors import NearestNeighbors
        diam = np.linalg.norm(m["verts"].max(0) - m["verts"].min(0))
        for v in (vn, vp):
            nn = NearestNeighbors(n_neighbors=1).fit(m["verts"])
            d, _ = nn.kneighbors(v)
            assert d.mean() / diam < 0.01
        # same geometric fidelity between implementations
        nn = NearestNeighbors(n_neighbors=1).fit(vp)
        d, _ = nn.kneighbors(vn)
        assert d.mean() / diam < 0.01
