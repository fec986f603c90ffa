import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pose6d_tpu.models import DPFMNet, DPFMConfig
from pose6d_tpu.models import attention as attn_mod
from pose6d_tpu.models import fmap as fmap_mod
from pose6d_tpu.models.port_weights import load_reference_checkpoint

WEIGHTS = "/root/reference/weights/weights.pt"


def make_shape(rng, v, v_valid, k=64):
    xyz = rng.normal(size=(v, 3)).astype(np.float32) * 5 + 110
    mass = np.abs(rng.normal(size=(v,))).astype(np.float32)
    evecs = rng.normal(size=(v, k)).astype(np.float32) / np.sqrt(v)
    evals = np.sort(np.abs(rng.normal(size=(k,)))).astype(np.float32)
    valid = np.arange(v) < v_valid
    mass[~valid] = 0.0
    evecs[~valid] = 0.0
    xyz[~valid] = 0.0
    return {"xyz": jnp.asarray(xyz), "mass": jnp.asarray(mass),
            "evals": jnp.asarray(evals), "evecs": jnp.asarray(evecs),
            "valid": jnp.asarray(valid)}


class TestDPFMNet:
    def test_forward_shapes_and_finite(self):
        rng = np.random.default_rng(0)
        cad = make_shape(rng, 256, 200)
        pc = make_shape(rng, 128, 100)
        model = DPFMNet(DPFMConfig())
        params = model.init(jax.random.PRNGKey(0), cad, pc)
        out = model.apply(params, cad, pc)
        assert out["C"].shape == (30, 30)
        assert out["overlap12"].shape == (256,)
        assert out["feat1"].shape == (256, 32)
        for v in jax.tree_util.tree_leaves(out):
            assert np.isfinite(np.asarray(v)).all()
        # overlap scores are probabilities; zero at padded rows
        o12 = np.asarray(out["overlap12"])
        assert ((o12 >= 0) & (o12 <= 1)).all()
        assert (o12[200:] == 0).all()

    def test_param_count_matches_reference(self):
        # The reference checkpoint has ~24k encoder params + refiner
        model = DPFMNet(DPFMConfig())
        rng = np.random.default_rng(0)
        cad = make_shape(rng, 64, 64)
        pc = make_shape(rng, 32, 32)
        params = model.init(jax.random.PRNGKey(0), cad, pc)
        n = sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(params))
        import torch
        sd = torch.load(WEIGHTS, map_location="cpu")
        n_ref = sum(v.numel() for v in sd.values())
        assert n == n_ref

    def test_ported_weights_structure(self):
        import chex
        model = DPFMNet(DPFMConfig())
        rng = np.random.default_rng(0)
        cad = make_shape(rng, 64, 64)
        pc = make_shape(rng, 32, 32)
        init = model.init(jax.random.PRNGKey(0), cad, pc)
        ported = load_reference_checkpoint(WEIGHTS)
        chex.assert_trees_all_equal_shapes(init, ported)

    def test_padding_invariance(self):
        """Extra padded rows must not change outputs on valid rows."""
        rng = np.random.default_rng(1)
        cad = make_shape(rng, 200, 200)
        pc = make_shape(rng, 100, 100)
        model = DPFMNet(DPFMConfig())
        params = load_reference_checkpoint(WEIGHTS)
        out = model.apply(params, cad, pc)

        def pad_shape(s, extra):
            return {
                "xyz": jnp.pad(s["xyz"], ((0, extra), (0, 0)),
                               constant_values=3.3),
                "mass": jnp.pad(s["mass"], (0, extra)),
                "evals": s["evals"],
                "evecs": jnp.pad(s["evecs"], ((0, extra), (0, 0))),
                "valid": jnp.pad(s["valid"], (0, extra)),
            }

        out_p = model.apply(params, pad_shape(cad, 56), pad_shape(pc, 28))
        np.testing.assert_allclose(np.asarray(out_p["C"]),
                                   np.asarray(out["C"]), atol=3e-3)
        np.testing.assert_allclose(np.asarray(out_p["overlap12"])[:200],
                                   np.asarray(out["overlap12"]), atol=1e-3)
        np.testing.assert_allclose(np.asarray(out_p["feat2"])[:100],
                                   np.asarray(out["feat2"]), atol=5e-3)

    def test_vmap_batching(self):
        rng = np.random.default_rng(2)
        model = DPFMNet(DPFMConfig())
        params = load_reference_checkpoint(WEIGHTS)
        cads = [make_shape(rng, 128, n) for n in (100, 120)]
        pcs = [make_shape(rng, 64, n) for n in (50, 60)]
        cad_b = jax.tree_util.tree_map(lambda *x: jnp.stack(x), *cads)
        pc_b = jax.tree_util.tree_map(lambda *x: jnp.stack(x), *pcs)
        out_b = jax.vmap(lambda c, p: model.apply(params, c, p))(cad_b, pc_b)
        out_0 = model.apply(params, cads[0], pcs[0])
        np.testing.assert_allclose(np.asarray(out_b["C"])[0],
                                   np.asarray(out_0["C"]), atol=5e-4)


class TestInstanceNorm:
    def test_matches_torch(self):
        import torch
        import torch.nn.functional as F
        rng = np.random.default_rng(0)
        x = rng.normal(size=(50, 16)).astype(np.float32)
        got = np.asarray(attn_mod.masked_instance_norm(
            jnp.asarray(x), jnp.ones(50, bool)))
        # torch InstanceNorm1d operates on (B, C, N)
        ref = F.instance_norm(torch.tensor(x.T[None])).numpy()[0].T
        np.testing.assert_allclose(got, ref, atol=1e-5)

    def test_masked_ignores_invalid(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=(50, 8)).astype(np.float32)
        valid = np.arange(50) < 30
        x_junk = x.copy()
        x_junk[30:] = 1e6
        a = np.asarray(attn_mod.masked_instance_norm(
            jnp.asarray(x), jnp.asarray(valid)))
        b = np.asarray(attn_mod.masked_instance_norm(
            jnp.asarray(x_junk), jnp.asarray(valid)))
        np.testing.assert_allclose(a[:30], b[:30], atol=1e-4)


class TestAttentionParity:
    def test_multihead_matches_torch_layout(self):
        """Check the (dim, heads) split against the reference einsum layout
        using torch primitives directly (not reference code)."""
        import torch
        rng = np.random.default_rng(0)
        d_model, heads, n, m = 32, 2, 20, 30
        q_in = rng.normal(size=(n, d_model)).astype(np.float32)
        kv_in = rng.normal(size=(m, d_model)).astype(np.float32)

        mha = attn_mod.MultiHeadedAttention(heads, d_model)
        params = mha.init(jax.random.PRNGKey(0), jnp.asarray(q_in),
                          jnp.asarray(kv_in), jnp.asarray(kv_in),
                          jnp.ones(n, bool), jnp.ones(m, bool))
        got = np.asarray(mha.apply(params, jnp.asarray(q_in),
                                   jnp.asarray(kv_in), jnp.asarray(kv_in),
                                   jnp.ones(n, bool), jnp.ones(m, bool)))

        p = params["params"]
        dim = d_model // heads

        def t_lin(pp, x):  # x (N, C) -> (C_out, N) torch conv1d-style
            w = torch.tensor(np.asarray(pp["kernel"]).T)
            b = torch.tensor(np.asarray(pp["bias"]))
            return (w @ torch.tensor(x).T) + b[:, None]

        # torch path with the reference's bdhn layout
        Q = t_lin(p["proj_q"], q_in).view(dim, heads, n)
        K = t_lin(p["proj_k"], kv_in).view(dim, heads, m)
        V = t_lin(p["proj_v"], kv_in).view(dim, heads, m)
        scores = torch.einsum("dhn,dhm->hnm", Q, K) / dim ** 0.5
        prob = torch.nn.functional.softmax(scores, dim=-1)
        out = torch.einsum("hnm,dhm->dhn", prob, V).reshape(d_model, n)
        w = torch.tensor(np.asarray(p["merge"]["kernel"]).T)
        b = torch.tensor(np.asarray(p["merge"]["bias"]))
        ref = (w @ out + b[:, None]).T.numpy()
        np.testing.assert_allclose(got, ref, atol=2e-2)  # bf16 attention path


class TestFmapSolver:
    def test_matches_per_row_inverse(self):
        """Batched solve == the reference's per-row inverse formulation."""
        rng = np.random.default_rng(0)
        k, c = 30, 32
        A = rng.normal(size=(k, c)).astype(np.float32)
        B = rng.normal(size=(k, c)).astype(np.float32)
        ex = np.sort(np.abs(rng.normal(size=(k,)))).astype(np.float32)
        ey = np.sort(np.abs(rng.normal(size=(k,)))).astype(np.float32)
        lam, gamma = 100.0, 0.5
        D = np.asarray(fmap_mod.resolvent_mask(jnp.asarray(ex),
                                               jnp.asarray(ey), gamma))
        AAt, BAt = A @ A.T, B @ A.T
        ref = np.stack([
            np.linalg.solve(AAt + lam * np.diag(D[i]), BAt[i])
            for i in range(k)])
        # drive through solve_fmap with identity evecs_trans
        got = np.asarray(fmap_mod.solve_fmap(
            jnp.asarray(A), jnp.asarray(B), jnp.asarray(ex), jnp.asarray(ey),
            jnp.eye(k), jnp.eye(k), lambda_=lam, gamma=gamma))
        np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)

    def test_recovers_identity_map(self):
        """Same shape on both sides -> C approx identity."""
        rng = np.random.default_rng(1)
        v, k, c = 200, 30, 32
        evecs = np.linalg.qr(rng.normal(size=(v, k)))[0].astype(np.float32)
        mass = np.full((v,), 1.0, np.float32)
        evecs /= np.sqrt(mass.sum() / v)
        feats = rng.normal(size=(v, c)).astype(np.float32)
        evals = np.linspace(0, 5, k).astype(np.float32)
        et = evecs.T * mass[None]
        C = np.asarray(fmap_mod.solve_fmap(
            jnp.asarray(feats), jnp.asarray(feats), jnp.asarray(evals),
            jnp.asarray(evals), jnp.asarray(et), jnp.asarray(et),
            lambda_=100.0))
        # diagonal dominance
        diag_mean = np.abs(np.diag(C)).mean()
        off = C - np.diag(np.diag(C))
        assert diag_mean > 5 * np.abs(off).mean()

    def test_resolvent_mask_zero_diag_for_equal_spectra(self):
        e = jnp.asarray(np.linspace(0.1, 3, 30, dtype=np.float32))
        D = np.asarray(fmap_mod.resolvent_mask(e, e))
        np.testing.assert_allclose(np.diag(D), 0.0, atol=1e-10)
