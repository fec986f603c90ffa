"""ZoomOut spectral upsampling (solvers/zoomout.py).

Synthetic spectral pair with known ground-truth correspondence: the
PC-side basis is a row permutation of the CAD-side one, so the true
functional map is the identity at every width and the true pointwise
map is the permutation. A noisy truncated map must (a) grow to the full
width, (b) converge toward identity, (c) improve the pointwise map.
"""
import jax.numpy as jnp
import numpy as np

from pose6d_tpu.solvers import zoomout_refine
from pose6d_tpu.solvers.fmap2pointmap import naive_fmap2pointmap


def _pair(V=200, k1=24, seed=0):
    rng = np.random.RandomState(seed)
    Q, _ = np.linalg.qr(rng.randn(V, k1))
    ex = Q.astype(np.float32)
    perm = rng.permutation(V)
    return ex, ex[perm], perm


class TestZoomout:
    def test_grows_and_recovers_identity(self):
        ex, ey, perm = _pair()
        k0 = 8
        C0 = np.eye(k0, dtype=np.float32)
        valid = jnp.ones(ex.shape[0], bool)
        C = zoomout_refine(jnp.asarray(C0), jnp.asarray(ex),
                           jnp.asarray(ey), valid, valid, step=4)
        assert C.shape == (24, 24)
        assert float(jnp.abs(C - jnp.eye(24)).max()) < 1e-3

    def test_improves_noisy_map(self):
        ex, ey, perm = _pair(seed=3)
        k0 = 8
        rng = np.random.RandomState(7)
        C0 = (np.eye(k0) + 0.35 * rng.randn(k0, k0)).astype(np.float32)
        valid = jnp.ones(ex.shape[0], bool)

        def acc(C, k):
            pairs, _ = naive_fmap2pointmap(
                C, jnp.asarray(ex[:, :k]), jnp.asarray(ey[:, :k]),
                valid, valid)
            return float((np.asarray(pairs)[0] == perm).mean())

        before = acc(jnp.asarray(C0), k0)
        C = zoomout_refine(jnp.asarray(C0), jnp.asarray(ex),
                           jnp.asarray(ey), valid, valid, step=4)
        after = acc(C, 24)
        assert after > before
        assert after > 0.9

    def test_respects_validity_mask(self):
        """Padded PC rows must not leak into the refit: corrupting them
        with garbage changes nothing."""
        ex, ey, perm = _pair(seed=1)
        k0 = 8
        V = ex.shape[0]
        C0 = np.eye(k0, dtype=np.float32)
        ey_pad = np.concatenate(
            [ey, 1e3 * np.ones((32, ey.shape[1]), np.float32)])
        ex_pad = np.concatenate(
            [ex, np.zeros((32, ex.shape[1]), np.float32)])
        vx = jnp.arange(V + 32) < V
        vy = jnp.arange(V + 32) < V
        C_ref = zoomout_refine(jnp.asarray(C0), jnp.asarray(ex),
                               jnp.asarray(ey),
                               jnp.ones(V, bool), jnp.ones(V, bool))
        C_pad = zoomout_refine(jnp.asarray(C0), jnp.asarray(ex_pad),
                               jnp.asarray(ey_pad), vx, vy)
        np.testing.assert_allclose(np.asarray(C_pad), np.asarray(C_ref),
                                   atol=1e-4)
