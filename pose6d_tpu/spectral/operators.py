"""get_operators equivalent: frames, mass, L, eigenbasis, tangent gradients.

Mirrors the contract of the reference's
`diffusion_net.geometry.get_operators(verts, faces, normals, k_eig=64)`
(consumed at reference dataset/object.py:214,246): returns tangent frames,
lumped mass, Laplacian, k_eig eigenpairs, and tangent-plane gradient
operators gradX/gradY. The trained model runs with
with_gradient_features=False (reference models/dpfm.py:28), so gradients
are optional here (build_gradients=False skips them); they exist for API
parity and for gradient-feature variants.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import scipy.sparse as sp

from . import laplacian as lap


@dataclasses.dataclass
class ShapeOperators:
    """Host-side spectral operators for one shape (mesh or point cloud)."""
    xyz: np.ndarray            # (V, 3) float32
    frames: np.ndarray         # (V, 3, 3) float32 — rows: tangentX, tangentY, normal
    mass: np.ndarray           # (V,) float32 lumped mass
    L: sp.spmatrix             # (V, V) sparse Laplacian (host only)
    evals: np.ndarray          # (k_eig,) float32
    evecs: np.ndarray          # (V, k_eig) float32
    gradX: Optional[sp.spmatrix] = None  # (V, V) sparse, d/dX in tangent frame
    gradY: Optional[sp.spmatrix] = None
    faces: Optional[np.ndarray] = None   # (F, 3) int32 for meshes
    normals: Optional[np.ndarray] = None  # (V, 3)


def _build_gradients(points: np.ndarray, frames: np.ndarray,
                     neighbors: list[np.ndarray]):
    """Per-vertex least-squares tangent-plane gradient operators.

    For vertex i with neighbor set N(i): solve for g in R^2 minimizing
    sum_j (<g, u_ij> - (f_j - f_i))^2 with u_ij the neighbor offset
    projected into i's tangent plane. The solution is linear in f, giving
    one sparse row of (gradX, gradY) each.
    """
    V = len(points)
    rows, cols, vx, vy = [], [], [], []
    for i in range(V):
        nbr = np.asarray(neighbors[i])
        nbr = nbr[nbr != i]
        if len(nbr) < 3:
            continue
        u = (points[nbr] - points[i]) @ frames[i, :2].T  # (k, 2)
        # ridge-regularized normal equations
        A = u.T @ u + 1e-8 * np.eye(2)
        coef = np.linalg.solve(A, u.T)  # (2, k): g = coef @ (f_nbr - f_i)
        rows.append(np.full(len(nbr) + 1, i))
        cols.append(np.concatenate([nbr, [i]]))
        vx.append(np.concatenate([coef[0], [-coef[0].sum()]]))
        vy.append(np.concatenate([coef[1], [-coef[1].sum()]]))
    if not rows:
        empty = sp.csr_matrix((V, V))
        return empty, empty
    rows = np.concatenate(rows)
    cols = np.concatenate(cols)
    gX = sp.coo_matrix((np.concatenate(vx), (rows, cols)), shape=(V, V)).tocsr()
    gY = sp.coo_matrix((np.concatenate(vy), (rows, cols)), shape=(V, V)).tocsr()
    return gX, gY


def gradients_to_gather(gX: sp.spmatrix, gY: sp.spmatrix,
                        max_nnz: int = 32):
    """Sparse (V, V) gradient operators -> fixed-width gather form for
    the device model: (idx (V, max_nnz) int32, cx, cy (V, max_nnz) f32).

    gradX/gradY share a sparsity pattern by construction
    (_build_gradients). Rows wider than max_nnz keep their largest-|cx|
    entries; padding gathers row i itself with zero coefficient.
    """
    gX = gX.tocsr()
    gY = gY.tocsr()
    V = gX.shape[0]
    idx = np.tile(np.arange(V, dtype=np.int32)[:, None], (1, max_nnz))
    cx = np.zeros((V, max_nnz), np.float32)
    cy = np.zeros((V, max_nnz), np.float32)
    for i in range(V):
        cols = gX.indices[gX.indptr[i]:gX.indptr[i + 1]]
        vx = gX.data[gX.indptr[i]:gX.indptr[i + 1]]
        vy = np.asarray(gY[i, cols].todense()).ravel()
        if len(cols) > max_nnz:
            keep = np.argsort(-np.abs(vx))[:max_nnz]
            cols, vx, vy = cols[keep], vx[keep], vy[keep]
        idx[i, :len(cols)] = cols
        cx[i, :len(cols)] = vx
        cy[i, :len(cols)] = vy
    return idx, cx, cy


def mesh_operators(verts: np.ndarray, faces: np.ndarray, k_eig: int = 64,
                   normals: Optional[np.ndarray] = None,
                   build_gradients: bool = False) -> ShapeOperators:
    verts = np.asarray(verts, np.float64)
    faces = np.asarray(faces, np.int64)
    L, mass = lap.cotan_laplacian(verts, faces)
    evals, evecs = lap.laplacian_eigenbasis(L, mass, k_eig)
    if normals is None:
        normals = lap.vertex_normals(verts, faces)
    # tangent frames from the mesh normals
    ref = np.where(np.abs(normals[:, [0]]) < 0.9,
                   np.array([[1.0, 0, 0]]), np.array([[0, 1.0, 0]]))
    tx = np.cross(normals, ref)
    tx /= np.maximum(np.linalg.norm(tx, axis=1, keepdims=True), 1e-12)
    ty = np.cross(normals, tx)
    frames = np.stack([tx, ty, normals], axis=1)
    gX = gY = None
    if build_gradients:
        adj = [[] for _ in range(len(verts))]
        for f in faces:
            for a in range(3):
                adj[f[a]].extend([f[(a + 1) % 3], f[(a + 2) % 3]])
        neighbors = [np.unique(a) for a in adj]
        gX, gY = _build_gradients(verts, frames, neighbors)
    return ShapeOperators(
        xyz=verts.astype(np.float32), frames=frames.astype(np.float32),
        mass=mass.astype(np.float32), L=L, evals=evals, evecs=evecs,
        gradX=gX, gradY=gY, faces=faces.astype(np.int32),
        normals=normals.astype(np.float32))


def point_cloud_operators(points: np.ndarray, k_eig: int = 64, k_nn: int = 30,
                          build_gradients: bool = False) -> ShapeOperators:
    points = np.asarray(points, np.float64)
    L, mass, normals, frames = lap.point_cloud_laplacian(points, k=k_nn)
    evals, evecs = lap.laplacian_eigenbasis(L, mass, k_eig)
    gX = gY = None
    if build_gradients:
        from sklearn.neighbors import NearestNeighbors
        k = min(k_nn, len(points))
        nn = NearestNeighbors(n_neighbors=k).fit(points)
        _, idx = nn.kneighbors(points)
        gX, gY = _build_gradients(points, frames, list(idx))
    return ShapeOperators(
        xyz=points.astype(np.float32), frames=frames.astype(np.float32),
        mass=mass.astype(np.float32), L=L, evals=evals, evecs=evecs,
        gradX=gX, gradY=gY, faces=None, normals=normals.astype(np.float32))
