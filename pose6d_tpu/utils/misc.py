"""Small host-side utilities (reference utils/utils.py equivalents)."""
from __future__ import annotations

import numpy as np


def quaternion_rotation_matrix(Q):
    """Quaternion (w, x, y, z) -> 3x3 rotation matrix (reference
    utils/utils.py:13-52 convention)."""
    q0, q1, q2, q3 = Q
    return np.array([
        [2 * (q0 * q0 + q1 * q1) - 1, 2 * (q1 * q2 - q0 * q3),
         2 * (q1 * q3 + q0 * q2)],
        [2 * (q1 * q2 + q0 * q3), 2 * (q0 * q0 + q2 * q2) - 1,
         2 * (q2 * q3 - q0 * q1)],
        [2 * (q1 * q3 - q0 * q2), 2 * (q2 * q3 + q0 * q1),
         2 * (q0 * q0 + q3 * q3) - 1],
    ])
