"""Symmetry-flip disambiguation: multi-start ICP over flip hypotheses.

Functional-map correspondences are blind to near-symmetries (pairwise
distances are invariant under them), so both the reference and the base
pipeline here frequently land on a 180-degree-flipped pose: ADD-S is
high while ADD collapses (see the reference's committed avg_results —
obj_5 ADD<0.1d 0.138 vs ADD-S 0.966). The reference ships no
countermeasure.

This stage (an addition over the reference) refines a bank of flip
hypotheses in parallel — the base pose composed with 180-degree
rotations about the CAD's principal axes and +-90-degree rotations
about the dominant axis — each through a short vmapped ICP against the
OBSERVED cloud, and keeps the hypothesis whose one-way
observed-point -> model distance is smallest (every observed point must
be explained by visible model surface; a wrong flip leaves spouts /
handles unexplained).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops.masking import masked_mean
from .icp import icp_cloud_to_model


def _axis_angle(axis, angle):
    axis = axis / jnp.maximum(jnp.linalg.norm(axis), 1e-12)
    x, y, z = axis
    K = jnp.array([[0.0, -z, y], [z, 0.0, -x], [-y, x, 0.0]])
    return (jnp.eye(3) + jnp.sin(angle) * K
            + (1 - jnp.cos(angle)) * (K @ K))


def so3_bank(n: int):
    """First n of a fixed coarse SO(3) rotation bank (max 10): identity,
    180-degree flips about x/y/z, then +-90-degree turns about z/y/x.
    Used by rotation TTA (train/eval_loop.py, api.py) — the bank is a
    static numpy constant that folds into traced programs."""
    import numpy as np

    def aa(ax, ang):
        x, y, z = ax
        K = np.array([[0., -z, y], [z, 0., -x], [-y, x, 0.]])
        return np.eye(3) + np.sin(ang) * K + (1 - np.cos(ang)) * (K @ K)
    mats = [np.eye(3)]
    for ax in ((1, 0, 0), (0, 1, 0), (0, 0, 1)):
        mats.append(aa(ax, np.pi))
    for ax in ((0, 0, 1), (0, 1, 0), (1, 0, 0)):
        mats.append(aa(ax, np.pi / 2))
        mats.append(aa(ax, -np.pi / 2))
    return np.stack(mats[:n]).astype(np.float32)


def flip_hypotheses(cad_xyz, cad_valid, R0, t0, rots=None):
    """Pose bank: identity + 180deg flips about principal axes +
    +-90deg about the dominant axis, all about the CAD centroid.

    rots: optional (H, 3, 3) model-frame rotation bank (e.g. the
    object's detected near-symmetry group, ops/symmetry.py:
    disambiguation_bank) replacing the generic PCA bank — the targeted
    variant spends its ICP+render slots only on rotations the object's
    own geometry can actually be confused by."""
    v = cad_valid.astype(jnp.float32)[:, None]
    mu = jnp.sum(cad_xyz * v, axis=0) / jnp.maximum(jnp.sum(v), 1.0)
    if rots is None:
        centered = (cad_xyz - mu) * v
        cov = centered.T @ centered
        _, axes = jnp.linalg.eigh(cov)  # columns ascending; [:, 2] dominant
        rots = [jnp.eye(3)]
        for k in range(3):
            rots.append(_axis_angle(axes[:, k], jnp.pi))
        rots.append(_axis_angle(axes[:, 2], jnp.pi / 2))
        rots.append(_axis_angle(axes[:, 2], -jnp.pi / 2))
        rots = jnp.stack(rots)           # (H, 3, 3) model-frame rotations
    else:
        rots = jnp.asarray(rots)
    # x_cam = R0 (Rh (x - mu) + mu) + t0
    Rs = jnp.einsum("ij,hjk->hik", R0, rots)
    ts = (t0[None, :] + jnp.einsum("ij,j->i", R0, mu)[None, :]
          - jnp.einsum("hij,j->hi", Rs, mu))
    return Rs, ts


@functools.partial(jax.jit, static_argnames=("icp_iters",))
def disambiguate_pose(cad_xyz, cad_valid, pc_xyz, pc_valid, R0, t0,
                      diam, icp_iters: int = 15):
    """Refine flip hypotheses in parallel, return the best-explaining pose.

    Returns dict R, t, score (one-way PC->model mean distance), best
    hypothesis index.
    """
    Rs, ts = flip_hypotheses(cad_xyz, cad_valid, R0, t0)

    def refine(Rh, th):
        icp = icp_cloud_to_model(cad_xyz, cad_valid, pc_xyz, pc_valid,
                                 Rh, th, max_corr_dist=0.2 * diam,
                                 max_iter=icp_iters)
        return icp["R"], icp["t"]

    Rr, tr = jax.vmap(refine)(Rs, ts)

    def score(Rh, th):
        from ..ops.nn import nearest_valid
        model_cam = cad_xyz @ Rh.T + th
        d2, _ = nearest_valid(pc_xyz, model_cam, cad_valid)
        return masked_mean(jnp.sqrt(jnp.maximum(d2, 0.0)),
                           pc_valid.astype(jnp.float32))

    scores = jax.vmap(score)(Rr, tr)
    best = jnp.argmin(scores)
    return {"R": Rr[best], "t": tr[best], "score": scores[best],
            "hypothesis": best, "all_scores": scores}


@functools.partial(jax.jit,
                   static_argnames=("icp_iters", "stride", "bank_iters",
                                    "icp_coarse_stride"))
def disambiguate_pose_depth(cad_xyz, cad_valid, pc_xyz, pc_valid, R0, t0,
                            diam, K, observed_z, mask,
                            icp_iters: int = 15, stride: int = 4,
                            margin: float = 0.25, bank_iters: int = 5,
                            icp_coarse_stride: int = 4, sym_rots=None):
    """Flip disambiguation ranked by depth-image consistency.

    Geometric one-way distances tie on near-symmetric shapes (measured:
    they cannot rescue flips); rendering each refined hypothesis into a
    coarse z-buffer and comparing against the observed depth
    (solvers/verify_pose.py) uses exactly the evidence symmetry cannot
    fake. observed_z (H, W) in the same units as the CAD (cm), 0 where
    invalid; mask = instance mask.

    sym_rots: optional (H, 3, 3) detected near-symmetry bank
    (ops/symmetry.disambiguation_bank) replacing the generic PCA bank.

    Two-phase refinement: the 6-hypothesis bank gets a coarse
    `bank_iters`-step ICP — flip hypotheses differ by 90-180 degrees,
    so ranking is insensitive to the residual few-mm ICP tail — and
    only the depth-selected winner is refined the remaining
    `icp_iters - bank_iters` steps. The bank ICP was the disambiguation
    stage's dominant cost (6 x 15 NN rounds -> 6 x 5 + 10;
    docs/prof_tpu/stage_summary_postfix.json: 191 ms/16-frame batch).
    """
    from .verify_pose import depth_consistency_score
    Rs, ts = flip_hypotheses(cad_xyz, cad_valid, R0, t0, rots=sym_rots)
    bank_iters = min(bank_iters, icp_iters)

    def refine(Rh, th, iters, fine_iters):
        # coarse-to-fine NN (icp.py): the bank's job is ranking, which
        # is insensitive to the few-mm tail — one full-res polish is
        # enough; the winner gets the standard fine tail.
        icp = icp_cloud_to_model(cad_xyz, cad_valid, pc_xyz, pc_valid,
                                 Rh, th, max_corr_dist=0.2 * diam,
                                 max_iter=iters,
                                 coarse_stride=icp_coarse_stride,
                                 fine_iters=fine_iters)
        return icp["R"], icp["t"]

    Rr, tr = jax.vmap(lambda R, t: refine(R, t, bank_iters, 1))(Rs, ts)
    scores = jax.vmap(
        lambda Rh, th: depth_consistency_score(
            cad_xyz, cad_valid, Rh, th, K, observed_z, mask, diam,
            stride=stride))(Rr, tr)
    # hysteresis: keep the base hypothesis unless an alternative is
    # clearly better — near-ties are rendering noise, not evidence
    handicapped = scores.at[1:].multiply(1.0 + margin)
    best = jnp.argmin(handicapped)
    R_w, t_w = Rr[best], tr[best]
    if icp_iters > bank_iters:
        R_w, t_w = refine(R_w, t_w, icp_iters - bank_iters, 5)
    return {"R": R_w, "t": t_w, "score": scores[best],
            "hypothesis": best, "all_scores": scores}
