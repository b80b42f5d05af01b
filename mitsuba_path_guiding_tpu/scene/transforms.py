"""4x4 homogeneous transform helpers (host-side scene compile).

Counterpart of /root/reference/include/mitsuba/core/transform.h:415 — but
these only exist at scene-build time; on device everything is pre-transformed
world-space flat arrays.
"""
from __future__ import annotations

import numpy as np


def translate(x, y, z):
    m = np.eye(4)
    m[:3, 3] = [x, y, z]
    return m


def scale(x, y=None, z=None):
    y = x if y is None else y
    z = x if z is None else z
    return np.diag([x, y, z, 1.0])


def rotate(axis, angle_deg):
    """Rotation about ``axis`` by ``angle_deg`` degrees (Rodrigues)."""
    a = np.asarray(axis, dtype=np.float64)
    a = a / np.linalg.norm(a)
    t = np.deg2rad(angle_deg)
    c, s = np.cos(t), np.sin(t)
    K = np.array([[0, -a[2], a[1]], [a[2], 0, -a[0]], [-a[1], a[0], 0]])
    R = np.eye(3) * c + s * K + (1 - c) * np.outer(a, a)
    m = np.eye(4)
    m[:3, :3] = R
    return m


def look_at(origin, target, up=(0.0, 1.0, 0.0)):
    """Camera-to-world: camera space is x-right, y-up, z-forward
    (+z looks at the target)."""
    origin = np.asarray(origin, dtype=np.float64)
    forward = np.asarray(target, dtype=np.float64) - origin
    forward = forward / np.linalg.norm(forward)
    up = np.asarray(up, dtype=np.float64)
    right = np.cross(up, forward)
    nr = np.linalg.norm(right)
    if nr < 1e-9:  # up parallel to forward: pick any perpendicular
        up = np.array([1.0, 0.0, 0.0]) if abs(forward[0]) < 0.9 else np.array([0.0, 1.0, 0.0])
        right = np.cross(up, forward)
        nr = np.linalg.norm(right)
    right = right / nr
    true_up = np.cross(forward, right)
    m = np.eye(4)
    m[:3, 0] = right
    m[:3, 1] = true_up
    m[:3, 2] = forward
    m[:3, 3] = origin
    return m


def apply_points(m, pts):
    """(4,4) x (N,3) points."""
    return pts @ m[:3, :3].T + m[:3, 3]


def apply_normals(m, ns):
    """Transform normals with the inverse-transpose; renormalized."""
    it = np.linalg.inv(m[:3, :3]).T
    out = ns @ it.T
    n = np.linalg.norm(out, axis=-1, keepdims=True)
    return out / np.maximum(n, 1e-12)
