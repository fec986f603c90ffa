"""pose6d_tpu — TPU-native 6D pose estimation for unseen categories.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
m13ammed/6D-Pose-Estimation-for-Unseen-Categories (partial-to-full
functional maps / DPFM for unseen-category 6D pose from RGB-D + CAD).

Design stance (not a port): the reference's per-frame, host-round-trip,
file-mediated pipeline becomes a batched, jit-compiled, fixed-shape,
mask-aware pipeline. Preprocessing, the Siamese DiffusionNet model,
functional-map solve, correspondence extraction, and robust registration
(RANSAC / GNC-TLS / ICP) all run on device under jit/vmap/pjit. Only
file IO, mesh decimation, and the sparse LBO eigendecomposition stay on
host (one-time cache build, mirroring the reference's generate_cache
stage; see reference scripts/generate_cache.py).
"""

__version__ = "0.1.0"
