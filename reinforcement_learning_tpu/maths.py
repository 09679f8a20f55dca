"""Vector / rotation math used across the framework.

Conventions (reference: RocketSim/src/Math/MathTypes/MathTypes.h,.cpp):
  - Rotations are stored as 3x3 matrices whose COLUMNS are the body's
    forward / right / up axes expressed in world coordinates (so
    ``R[..., :, 0]`` is forward).  This matches RocketSim's ``RotMat``.
  - Euler angles are (yaw, pitch, roll); ``R = Rz(yaw) Ry(-pitch) Rx(-roll)``
    (reference: MathTypes.cpp:73-78 via bullet setEulerYPR).
  - All functions are shape-polymorphic over leading batch dims and jit/vmap
    safe.
"""

from __future__ import annotations

import jax.numpy as jnp


def norm(v, axis=-1, keepdims=False, eps=0.0):
    return jnp.sqrt(jnp.sum(v * v, axis=axis, keepdims=keepdims) + eps)


def normalize(v, axis=-1, eps=1e-12):
    """Safe normalize: returns 0 for (near-)zero vectors, like
    bullet's safeNormalized()."""
    n = norm(v, axis=axis, keepdims=True)
    return jnp.where(n > eps, v / jnp.maximum(n, eps), jnp.zeros_like(v))


def dot(a, b, keepdims=False):
    return jnp.sum(a * b, axis=-1, keepdims=keepdims)


def cross(a, b):
    return jnp.cross(a, b)


def clamp_norm(v, max_norm, axis=-1):
    """Scale v down so its norm is at most max_norm (exact reference
    semantics: renormalize only when exceeded; Car.cpp:177-190)."""
    n = norm(v, axis=axis, keepdims=True)
    scale = jnp.where(n > max_norm, max_norm / jnp.maximum(n, 1e-12), 1.0)
    return v * scale


def euler_to_rotmat(yaw, pitch=None, roll=None):
    """(yaw, pitch, roll) -> rotation matrix with forward/right/up columns.

    R = Rz(yaw) @ Ry(-pitch) @ Rx(-roll), matching RocketSim
    Angle::ToRotMat (MathTypes.cpp:73-78).
    """
    if pitch is None:
        pitch = jnp.zeros_like(yaw)
    if roll is None:
        roll = jnp.zeros_like(yaw)
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    cp, sp = jnp.cos(-pitch), jnp.sin(-pitch)
    cr, sr = jnp.cos(-roll), jnp.sin(-roll)
    # Rz(yaw) @ Ry(-pitch) @ Rx(-roll), row-major
    r00 = cy * cp
    r01 = cy * sp * sr - sy * cr
    r02 = cy * sp * cr + sy * sr
    r10 = sy * cp
    r11 = sy * sp * sr + cy * cr
    r12 = sy * sp * cr - cy * sr
    r20 = -sp
    r21 = cp * sr
    r22 = cp * cr
    return jnp.stack([
        jnp.stack([r00, r01, r02], axis=-1),
        jnp.stack([r10, r11, r12], axis=-1),
        jnp.stack([r20, r21, r22], axis=-1),
    ], axis=-2)


def rotmat_forward(R):
    return R[..., :, 0]


def rotmat_right(R):
    return R[..., :, 1]


def rotmat_up(R):
    return R[..., :, 2]


def rotmat_to_euler(R):
    """Rotation matrix -> (yaw, pitch, roll), inverse of euler_to_rotmat
    (reference: MathTypes.cpp:62-71, bullet getEulerYPR with pitch/roll
    negated)."""
    # From R = Rz(yaw) Ry(-pitch) Rx(-roll):
    #   R[2,0] = -sin(-pitch) = sin(pitch)
    pitch = jnp.arcsin(jnp.clip(R[..., 2, 0], -1.0, 1.0))
    yaw = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    roll = -jnp.arctan2(R[..., 2, 1], R[..., 2, 2])
    return yaw, pitch, roll


def rotate(R, v):
    """Rotate local vector(s) v into world frame: R @ v."""
    return jnp.einsum('...ij,...j->...i', R, v)


def inv_rotate(R, v):
    """Rotate world vector(s) v into the body frame: R^T @ v."""
    return jnp.einsum('...ji,...j->...i', R, v)


def curve(curve_table, x):
    """Evaluate a LinearPieceCurve (reference: Math.h LinearPieceCurve):
    piecewise-linear with clamping at both ends."""
    xs, ys = curve_table
    return jnp.interp(x, jnp.asarray(xs), jnp.asarray(ys))


def orthonormalize(R):
    """Re-orthonormalize a rotation matrix via Gram-Schmidt on the
    forward/right/up columns (keeps integration drift bounded, mirroring
    bullet's orthonormal basis maintenance)."""
    f = normalize(R[..., :, 0])
    r = R[..., :, 1]
    r = normalize(r - f * dot(f, r, keepdims=True))
    u = jnp.cross(f, r)
    return jnp.stack([f, r, u], axis=-1)


def integrate_rotation(R, ang_vel, dt):
    """Integrate orientation by angular velocity over dt.

    Uses the exponential map (Rodrigues), which matches bullet's quaternion
    integration closely for the small per-tick angles involved.
    """
    theta = norm(ang_vel, axis=-1, keepdims=True)  # (..., 1)
    axis = jnp.where(theta > 1e-12, ang_vel / jnp.maximum(theta, 1e-12),
                     jnp.zeros_like(ang_vel))
    angle = (theta * dt)[..., 0]
    c = jnp.cos(angle)
    s = jnp.sin(angle)
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    C = 1.0 - c
    # Rotation matrix for rotation of `angle` about `axis` (world frame)
    rot = jnp.stack([
        jnp.stack([c + x * x * C, x * y * C - z * s, x * z * C + y * s],
                  axis=-1),
        jnp.stack([y * x * C + z * s, c + y * y * C, y * z * C - x * s],
                  axis=-1),
        jnp.stack([z * x * C - y * s, z * y * C + x * s, c + z * z * C],
                  axis=-1),
    ], axis=-2)
    return orthonormalize(jnp.einsum('...ij,...jk->...ik', rot, R))
