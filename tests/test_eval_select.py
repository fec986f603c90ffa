"""Depth-evidence candidate scoring (train/eval_loop._depth_score_fn).

The selection signal must prefer a correct correspondence map over a
globally flipped-but-self-consistent one — exactly the case where
spatial-filter survivor counts tie (pairwise distances are invariant
under the flip)."""
import jax
import jax.numpy as jnp
import numpy as np

from pose6d_tpu.train.eval_loop import _depth_score_fn
from pose6d_tpu.train.pose_stage import _splat_observed

K = np.array([[572.4, 0, 325], [0, 573.6, 242], [0, 0, 1]], np.float32)


def _asymmetric_cloud(n=400, seed=0):
    """Blob + one-sided spike: a 180-degree flip visibly changes depth."""
    rng = np.random.RandomState(seed)
    pts = rng.randn(n, 3).astype(np.float32)
    spike = rng.rand(n // 4, 3).astype(np.float32)
    spike[:, 0] = spike[:, 0] * 0.3 + 1.5   # handle sticking out in +x
    return np.concatenate([pts, spike])


class TestDepthScore:
    def test_prefers_true_map_over_flip(self):
        cad = _asymmetric_cloud()
        V = len(cad)
        R = np.eye(3, dtype=np.float32)
        t = np.array([0, 0, 100], np.float32)
        pc = cad @ R.T + t

        # flipped map: matches pc to the 180-degree-about-z image of the
        # CAD (distance-consistent, depth-inconsistent)
        Rz = np.diag([-1.0, -1.0, 1.0]).astype(np.float32)
        cad_fl = cad @ Rz.T
        from sklearn.neighbors import NearestNeighbors
        nn = NearestNeighbors(n_neighbors=1).fit(cad_fl)
        _, j = nn.kneighbors(cad)          # pc row i ~ cad row j under flip

        P = 512
        idx = np.arange(V)
        pairs_true = np.zeros((2, P), np.int32)
        pairs_true[0, :V] = idx
        pairs_true[1, :V] = idx
        pairs_flip = np.zeros((2, P), np.int32)
        pairs_flip[0, :V] = j[:, 0]
        pairs_flip[1, :V] = idx
        pvalid = np.arange(P) < V

        obs_z, obs_m = _splat_observed(pc, K, 480, 640)
        scorer = _depth_score_fn(512)
        one = lambda pr: float(scorer(   # noqa: E731
            jax.random.split(jax.random.PRNGKey(0), 1),
            jnp.asarray(cad)[None], jnp.ones((1, V), bool),
            jnp.asarray(pc)[None], jnp.asarray(pr)[None],
            jnp.asarray(pvalid)[None], jnp.asarray([4.0], jnp.float32),
            jnp.asarray(K)[None], jnp.asarray(obs_z)[None],
            jnp.asarray(obs_m)[None])[0])
        s_true, s_flip = one(pairs_true), one(pairs_flip)
        assert s_true < s_flip, (s_true, s_flip)
        # and by a decisive factor, not noise
        assert s_flip > 1.5 * s_true, (s_true, s_flip)
