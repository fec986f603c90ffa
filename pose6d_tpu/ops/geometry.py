"""Core geometry ops: mask erosion, depth backprojection, outlier removal,
rigid transforms, pairwise distances, GT correspondence/overlap masks.

TPU-native equivalents of the reference's per-frame NumPy/OpenCV/Open3D
preprocessing (reference dataset/object.py:33-88, 281-317). Everything is
jittable, fixed-shape, and mask-aware so that frames can be batched with
vmap and the whole preprocessing stage fuses into one XLA program.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .masking import BIG, masked_mean


# ---------------------------------------------------------------------------
# Mask erosion  (== cv2.erode with a kxk kernel whose corners are zeroed,
# reference dataset/object.py:52-71; called with kernel_size=3 at :80)
# ---------------------------------------------------------------------------

def erode_mask(mask: jnp.ndarray, kernel_size: int = 3) -> jnp.ndarray:
    """Binary erosion with a square structuring element minus its 4 corners.

    A pixel survives iff every neighbor under the kernel support is set.
    Outside-image pixels count as set (cv2.erode's border convention for
    erosion), so the border is not eroded by padding alone.
    """
    k = kernel_size
    r = k // 2
    m = mask.astype(jnp.bool_)
    padded = jnp.pad(m, r, constant_values=True)
    out = jnp.ones_like(m)
    corner = {(0, 0), (0, k - 1), (k - 1, 0), (k - 1, k - 1)}
    for dy in range(k):
        for dx in range(k):
            if k > 1 and (dy, dx) in corner:
                continue  # zeroed kernel corners do not constrain
            h, w = m.shape
            out = out & jax.lax.dynamic_slice(padded, (dy, dx), (h, w))
    return out


# ---------------------------------------------------------------------------
# Depth -> point cloud backprojection (reference dataset/object.py:73-88)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("max_points", "kernel_size"))
def backproject_depth(depth, K, cam_scale, mask, max_points: int,
                      kernel_size: int = 3):
    """Back-project masked depth pixels to a fixed-size 3D point buffer.

    Matches the reference's convention exactly (dataset/object.py:73-88):
    the instance mask is eroded first, then for each masked pixel with
    row index `i` and column index `j`:

        z = depth[i, j] / cam_scale
        out = [ (j - K[0,2]) * z / K[0,0],
                (i - K[1,2]) * z / K[1,1],
                z ] * 100

    Args:
      depth:  (H, W) raw depth image.
      K:      (3, 3) intrinsics.
      cam_scale: scalar divisor (the reference passes 1000/depth_scale).
      mask:   (H, W) boolean instance mask.
      max_points: static output buffer size.

    Returns:
      points (max_points, 3) float32, valid (max_points,) bool.
    """
    h, w = depth.shape
    mask = erode_mask(mask, kernel_size)
    z = depth.astype(jnp.float32) / cam_scale
    rows = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    x = (cols - K[0, 2]) * z / K[0, 0]
    y = (rows - K[1, 2]) * z / K[1, 1]
    pts = jnp.stack([x, y, z], axis=-1).reshape(-1, 3) * 100.0

    flat_mask = mask.reshape(-1)
    # Fixed-size gather of the masked pixels (row-major order, matching
    # boolean indexing in the reference).
    idx = jnp.nonzero(flat_mask, size=max_points, fill_value=h * w)[0]
    valid = idx < h * w
    safe = jnp.minimum(idx, h * w - 1)
    points = jnp.where(valid[:, None], pts[safe], 0.0)
    return points, valid


# ---------------------------------------------------------------------------
# Pairwise distances
# ---------------------------------------------------------------------------

def pairwise_sqdist(a, b, precision=jax.lax.Precision.HIGHEST):
    """Squared Euclidean distances, (N, 3) x (M, 3) -> (N, M).

    Uses the |a|^2 - 2ab + |b|^2 expansion so the 2ab term rides the MXU.
    Default precision is full f32 (6-pass on the MXU); callers on hot
    paths that tolerate ~1e-3 relative error (spectral embeddings,
    consistency screening) pass Precision.HIGH (bf16x3) for ~2x MXU
    throughput.
    """
    a2 = jnp.sum(a * a, axis=-1, keepdims=True)
    b2 = jnp.sum(b * b, axis=-1, keepdims=True)
    cross = jnp.dot(a, b.T, preferred_element_type=jnp.float32,
                    precision=precision)
    return jnp.maximum(a2 - 2.0 * cross + b2.T, 0.0)


def pairwise_dist(a, b):
    return jnp.sqrt(pairwise_sqdist(a, b))


# ---------------------------------------------------------------------------
# Statistical outlier removal
# (== Open3D remove_statistical_outlier(nb_neighbors=20, std_ratio=0.3),
#  reference dataset/object.py:33-50)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("nb_neighbors", "block"))
def statistical_outlier_mask(points, valid, nb_neighbors: int = 20,
                             std_ratio: float = 0.3, block: int = 2048):
    """Keep-mask for statistical outlier removal on a padded point set.

    For each valid point: mean distance to its `nb_neighbors` nearest
    valid neighbors (self excluded). A point is kept iff that mean is
    below mean + std_ratio * std over all valid points.

    The kNN search is blocked (`block` rows at a time via lax.map) so the
    (N, N) distance matrix is never materialized — at N=32768 the dense
    form is a 4 GB buffer and dominates the cache-build wall time; the
    blocked form keeps the working set at block x N and returns
    numerically identical results.
    """
    n = points.shape[0]
    nb = nb_neighbors
    if n <= block:
        d2 = pairwise_sqdist(points, points)
        invalid = ~(valid[None, :] & valid[:, None])
        d2 = jnp.where(invalid, BIG, d2)
        d2 = jnp.where(jnp.eye(n, dtype=bool), BIG, d2)  # exclude self
        neg, _ = jax.lax.top_k(-d2, nb)
    else:
        n_blocks = -(-n // block)
        npad = n_blocks * block
        pts_p = jnp.pad(points, ((0, npad - n), (0, 0)))
        val_p = jnp.pad(valid, (0, npad - n))
        col = jnp.arange(n)

        def one_block(i):
            rp = jax.lax.dynamic_slice(pts_p, (i * block, 0), (block, 3))
            rv = jax.lax.dynamic_slice(val_p, (i * block,), (block,))
            d2 = pairwise_sqdist(rp, points)
            rows = i * block + jnp.arange(block)[:, None]
            bad = ~(rv[:, None] & valid[None, :]) | (col[None, :] == rows)
            blk_neg, _ = jax.lax.top_k(jnp.where(bad, -BIG, -d2), nb)
            return blk_neg

        neg = jax.lax.map(one_block, jnp.arange(n_blocks))
        neg = neg.reshape(npad, nb)[:n]
    knn_d = jnp.sqrt(jnp.maximum(-neg, 0.0))
    # Rows with fewer than k valid neighbors pick up BIG sentinels; treat
    # those entries as missing in the mean.
    finite = -neg < BIG * 0.5
    mean_d = masked_mean(knn_d, finite, axis=1)
    mu = masked_mean(mean_d, valid)
    var = masked_mean((mean_d - mu) ** 2, valid)
    thresh = mu + std_ratio * jnp.sqrt(jnp.maximum(var, 0.0))
    return valid & (mean_d <= thresh)


# ---------------------------------------------------------------------------
# Rigid transforms (reference dataset/object.py:304-309)
# ---------------------------------------------------------------------------

def transform_points(pc, R, t, inv: bool = False):
    """Apply (or invert) the model-to-camera rigid transform.

    Forward:  pc @ R.T + t       (x' = R x + t)
    Inverse:  pc @ R - t.T @ R   (x  = R.T (x' - t)), written exactly as
    the reference does it so the row/column conventions match.
    """
    t = jnp.reshape(t, (1, 3))
    if inv:
        return pc @ R + (-t @ R)
    return pc @ R.T + t


def pose_matrix(R, t):
    """4x4 homogeneous pose from R (3,3) and t (3,)."""
    T = jnp.eye(4, dtype=R.dtype)
    T = T.at[:3, :3].set(R)
    T = T.at[:3, 3].set(jnp.reshape(t, (3,)))
    return T


# ---------------------------------------------------------------------------
# GT correspondences + overlap masks (reference dataset/object.py:281-317)
# ---------------------------------------------------------------------------

@jax.jit
def radius_correspondence_mask(cad, cad_valid, pc, pc_valid, radius):
    """Dense boolean GT-correspondence mask: pairs within `radius`.

    The reference materializes argwhere(dist <= r) as a ragged pair list
    (dataset/object.py:281-288); the dense (V1, V2) mask is the static-
    shape equivalent, from which overlap masks and sampled NCE pairs are
    derived without ragged tensors.
    """
    d2 = pairwise_sqdist(cad, pc)
    ok = cad_valid[:, None] & pc_valid[None, :]
    return ok & (d2 <= radius * radius)


def overlap_from_mask(corr_mask):
    """overlap_12 (V1,), overlap_21 (V2,) from the dense pair mask."""
    return jnp.any(corr_mask, axis=1), jnp.any(corr_mask, axis=0)


def sample_pairs(key, corr_mask, num_pairs: int):
    """Sample up to `num_pairs` distinct GT pairs from the dense mask.

    Gumbel-top-k over valid entries = uniform sampling without
    replacement (the reference uses np.random.choice without replacement,
    utils/loss.py:27-30). Returns (pairs (num_pairs, 2) int32, valid
    (num_pairs,) bool); invalid slots appear when fewer pairs exist.
    """
    v1, v2 = corr_mask.shape
    flat = corr_mask.reshape(-1)
    g = jax.random.gumbel(key, (v1 * v2,))
    score = jnp.where(flat, g, -jnp.inf)
    _, idx = jax.lax.top_k(score, num_pairs)
    valid = flat[idx]
    return jnp.stack([idx // v2, idx % v2], axis=-1).astype(jnp.int32), valid
