import numpy as np
import jax.numpy as jnp
import pytest

from pose6d_tpu.spectral import laplacian as lap
from pose6d_tpu.spectral import operators as ops
from pose6d_tpu.spectral import diffusion


def icosphere(subdiv=3):
    """Unit icosphere mesh."""
    t = (1 + 5 ** 0.5) / 2
    verts = np.array([
        [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
        [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
        [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1]], float)
    faces = [(0, 11, 5), (0, 5, 1), (0, 1, 7), (0, 7, 10), (0, 10, 11),
             (1, 5, 9), (5, 11, 4), (11, 10, 2), (10, 7, 6), (7, 1, 8),
             (3, 9, 4), (3, 4, 2), (3, 2, 6), (3, 6, 8), (3, 8, 9),
             (4, 9, 5), (2, 4, 11), (6, 2, 10), (8, 6, 7), (9, 8, 1)]
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    faces = np.asarray(faces)
    for _ in range(subdiv):
        mid = {}
        new_faces = []
        vlist = list(verts)

        def midpoint(a, b):
            key = (min(a, b), max(a, b))
            if key not in mid:
                m = (vlist[a] + vlist[b]) / 2
                m /= np.linalg.norm(m)
                mid[key] = len(vlist)
                vlist.append(m)
            return mid[key]

        for a, b, c in faces:
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            new_faces += [(a, ab, ca), (b, bc, ab), (c, ca, bc), (ab, bc, ca)]
        verts = np.asarray(vlist)
        faces = np.asarray(new_faces)
    return verts, faces


class TestMeshLaplacian:
    def test_sphere_spectrum(self):
        # LBO eigenvalues on the unit sphere: l(l+1), multiplicity 2l+1.
        verts, faces = icosphere(3)
        L, mass = lap.cotan_laplacian(verts, faces)
        evals, evecs = lap.laplacian_eigenbasis(L, mass, 16)
        expected = [0.0] + [2.0] * 3 + [6.0] * 5 + [12.0] * 7
        np.testing.assert_allclose(evals, expected, atol=0.25)

    def test_total_mass_is_area(self):
        verts, faces = icosphere(3)
        _, mass = lap.cotan_laplacian(verts, faces)
        assert abs(mass.sum() - 4 * np.pi) < 0.15

    def test_constant_in_kernel(self):
        verts, faces = icosphere(2)
        L, _ = lap.cotan_laplacian(verts, faces)
        r = L @ np.ones(len(verts))
        assert np.abs(r).max() < 1e-8

    def test_evecs_mass_orthonormal(self):
        verts, faces = icosphere(2)
        L, mass = lap.cotan_laplacian(verts, faces)
        evals, evecs = lap.laplacian_eigenbasis(L, mass, 16)
        G = evecs.T @ (mass[:, None] * evecs)
        np.testing.assert_allclose(G, np.eye(16), atol=1e-4)


class TestPointCloudLaplacian:
    def test_sphere_spectrum_from_points(self):
        verts, _ = icosphere(3)  # 642 points on sphere, no connectivity
        L, mass, normals, frames = lap.point_cloud_laplacian(verts, k=16)
        evals, _ = lap.laplacian_eigenbasis(L, mass, 10)
        expected = [0.0] + [2.0] * 3 + [6.0] * 5 + [12.0]
        # Point-cloud LBO is approximate; spectral structure must be close.
        np.testing.assert_allclose(evals, expected, atol=0.8)

    def test_normals_point_outward_ish(self):
        verts, _ = icosphere(2)
        _, _, normals, _ = lap.point_cloud_laplacian(verts, k=16)
        # normals should align with +-radial direction
        cos = np.abs(np.einsum("ij,ij->i", normals, verts))
        assert cos.mean() > 0.97


class TestOperators:
    def test_mesh_operators_contract(self):
        verts, faces = icosphere(2)
        so = ops.mesh_operators(verts, faces, k_eig=16, build_gradients=True)
        assert so.evecs.shape == (len(verts), 16)
        assert so.frames.shape == (len(verts), 3, 3)
        assert so.gradX is not None
        # gradient of a linear function x -> constant in tangent X dir:
        f = verts[:, 0]
        gx = so.gradX @ f
        gy = so.gradY @ f
        g = np.stack([gx, gy], 1)
        # |tangent gradient| of coordinate function x on sphere = |t_x|
        # where expected tangent grad = P_tangent(e_x)
        ex = np.array([1.0, 0, 0])
        expect = np.stack([so.frames[:, 0] @ ex, so.frames[:, 1] @ ex], 1)
        err = np.linalg.norm(g - expect, axis=1)
        assert np.median(err) < 0.15

    def test_pc_operators_contract(self):
        rng = np.random.default_rng(0)
        pts = rng.normal(size=(200, 3))
        pts /= np.linalg.norm(pts, axis=1, keepdims=True)
        so = ops.point_cloud_operators(pts, k_eig=8)
        assert so.evals.shape == (8,)
        assert so.evecs.shape == (200, 8)
        assert np.isfinite(so.evecs).all()


class TestDiffusion:
    def test_zero_time_identity(self):
        verts, faces = icosphere(2)
        L, mass = lap.cotan_laplacian(verts, faces)
        evals, evecs = lap.laplacian_eigenbasis(L, mass, 32)
        rng = np.random.default_rng(0)
        # use a smooth signal representable in the basis
        coef = rng.normal(size=(32, 4))
        x = evecs @ coef
        out = diffusion.heat_diffusion(
            jnp.asarray(x), jnp.full((4,), 1e-8), jnp.asarray(mass),
            jnp.asarray(evals), jnp.asarray(evecs))
        np.testing.assert_allclose(np.asarray(out), x, atol=1e-3)

    def test_long_time_converges_to_mean(self):
        verts, faces = icosphere(2)
        L, mass = lap.cotan_laplacian(verts, faces)
        evals, evecs = lap.laplacian_eigenbasis(L, mass, 32)
        rng = np.random.default_rng(1)
        x = rng.normal(size=(len(verts), 2)).astype(np.float32)
        out = np.asarray(diffusion.heat_diffusion(
            jnp.asarray(x), jnp.full((2,), 1e3), jnp.asarray(mass),
            jnp.asarray(evals), jnp.asarray(evecs)))
        mean = (mass[:, None] * x).sum(0) / mass.sum()
        spread = out.std(axis=0)
        assert spread.max() < 0.05
        np.testing.assert_allclose(out.mean(0), mean, atol=0.05)

    def test_padding_invariance(self):
        # zero-mass, zero-evec padded rows must not change valid outputs
        verts, faces = icosphere(1)
        L, mass = lap.cotan_laplacian(verts, faces)
        evals, evecs = lap.laplacian_eigenbasis(L, mass, 8)
        rng = np.random.default_rng(2)
        x = rng.normal(size=(len(verts), 3)).astype(np.float32)
        t = np.array([0.1, 0.5, 1.0], np.float32)
        out = np.asarray(diffusion.heat_diffusion(
            jnp.asarray(x), jnp.asarray(t), jnp.asarray(mass),
            jnp.asarray(evals), jnp.asarray(evecs)))
        pad = 20
        xp = np.pad(x, ((0, pad), (0, 0)), constant_values=7.7)
        mp = np.pad(mass, (0, pad))
        ep = np.pad(evecs, ((0, pad), (0, 0)))
        outp = np.asarray(diffusion.heat_diffusion(
            jnp.asarray(xp), jnp.asarray(t), jnp.asarray(mp),
            jnp.asarray(evals), jnp.asarray(ep)))
        np.testing.assert_allclose(outp[:len(verts)], out, atol=1e-5)
        np.testing.assert_allclose(outp[len(verts):], 0.0, atol=1e-6)


class TestRealCAD:
    def test_lm_model_operators(self):
        from pose6d_tpu.data import read_ply
        mesh = read_ply(
            "/root/reference/sample-data/lm/models_eval/obj_000005.ply")
        assert mesh["verts"].shape[1] == 3
        assert mesh["faces"].shape[1] == 3
        verts = mesh["verts"] * 0.1  # reference scale_cad
        so = ops.mesh_operators(verts, mesh["faces"], k_eig=16)
        assert np.isfinite(so.evals).all()
        assert so.evals[0] < 1e-4  # constant mode
        assert (np.diff(so.evals) >= -1e-5).all()
