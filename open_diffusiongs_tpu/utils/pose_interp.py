"""Camera pose interpolation (quaternion slerp) for eval videos.

Equivalent of the nerfstudio-derived helpers the reference uses for its
camera-path mp4s (models/gsrenderer/cam_utils.py:105-139, 245-280):
slerp between consecutive poses with linear translation blending.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np


def rotmat_to_quat(R: np.ndarray) -> np.ndarray:
    """[3, 3] -> (w, x, y, z) unit quaternion."""
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        w = 0.25 * s
        x = (R[2, 1] - R[1, 2]) / s
        y = (R[0, 2] - R[2, 0]) / s
        z = (R[1, 0] - R[0, 1]) / s
    elif R[0, 0] > R[1, 1] and R[0, 0] > R[2, 2]:
        s = np.sqrt(1.0 + R[0, 0] - R[1, 1] - R[2, 2]) * 2
        w = (R[2, 1] - R[1, 2]) / s
        x = 0.25 * s
        y = (R[0, 1] + R[1, 0]) / s
        z = (R[0, 2] + R[2, 0]) / s
    elif R[1, 1] > R[2, 2]:
        s = np.sqrt(1.0 + R[1, 1] - R[0, 0] - R[2, 2]) * 2
        w = (R[0, 2] - R[2, 0]) / s
        x = (R[0, 1] + R[1, 0]) / s
        y = 0.25 * s
        z = (R[1, 2] + R[2, 1]) / s
    else:
        s = np.sqrt(1.0 + R[2, 2] - R[0, 0] - R[1, 1]) * 2
        w = (R[1, 0] - R[0, 1]) / s
        x = (R[0, 2] + R[2, 0]) / s
        y = (R[1, 2] + R[2, 1]) / s
        z = 0.25 * s
    q = np.asarray([w, x, y, z])
    return q / np.linalg.norm(q)


def quat_to_rotmat(q: np.ndarray) -> np.ndarray:
    w, x, y, z = q / np.linalg.norm(q)
    return np.asarray([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)]])


def quaternion_slerp(q0: np.ndarray, q1: np.ndarray, t: float) -> np.ndarray:
    """Spherical interpolation (cam_utils.py:105-139 semantics)."""
    d = float(np.dot(q0, q1))
    if d < 0:
        q1 = -q1
        d = -d
    if d > 0.9995:
        out = q0 + t * (q1 - q0)
        return out / np.linalg.norm(out)
    theta0 = np.arccos(np.clip(d, -1, 1))
    theta = theta0 * t
    s0 = np.cos(theta) - d * np.sin(theta) / np.sin(theta0)
    s1 = np.sin(theta) / np.sin(theta0)
    return s0 * q0 + s1 * q1


def interpolate_poses(pose_a: np.ndarray, pose_b: np.ndarray,
                      steps: int) -> List[np.ndarray]:
    """slerp rotation + lerp translation between two [4, 4] c2ws
    (`steps` poses, endpoint excluded — cam_utils.get_interpolated_poses)."""
    qa = rotmat_to_quat(pose_a[:3, :3])
    qb = rotmat_to_quat(pose_b[:3, :3])
    out = []
    for t in np.linspace(0.0, 1.0, steps, endpoint=False):
        c2w = np.eye(4, dtype=np.float64)
        c2w[:3, :3] = quat_to_rotmat(quaternion_slerp(qa, qb, float(t)))
        c2w[:3, 3] = pose_a[:3, 3] * (1 - t) + pose_b[:3, 3] * t
        out.append(c2w)
    return out


def get_interpolated_poses_many(poses: np.ndarray,
                                steps_per_transition: int = 10
                                ) -> np.ndarray:
    """[n, 4, 4] keyframes -> smooth path (cam_utils.py:245-280)."""
    out: List[np.ndarray] = []
    for i in range(len(poses) - 1):
        out.extend(interpolate_poses(poses[i], poses[i + 1],
                                     steps_per_transition))
    out.append(poses[-1].astype(np.float64))
    return np.stack(out).astype(np.float32)
