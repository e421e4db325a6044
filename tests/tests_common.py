"""Shared test helpers."""

import numpy as np


def random_pose_np(rng, angle_scale=0.2, trans_scale=0.5):
    aa = rng.randn(3) * angle_scale
    angle = np.linalg.norm(aa)
    axis = aa / (angle + 1e-12)
    K = np.array(
        [[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]], [-axis[1], axis[0], 0]]
    )
    R = np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * K @ K
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = rng.randn(3) * trans_scale
    return T.astype(np.float32)
