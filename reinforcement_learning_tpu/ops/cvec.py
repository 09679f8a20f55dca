"""Component-form vector/rotation math for the Pallas physics megakernel.

The XLA physics path (`physics/`) stores vectors as trailing-axis arrays
``(..., 3)``.  Inside a Mosaic (Pallas TPU) kernel that layout wastes the
128-wide vector lanes (3 of 128 used), so the kernel path stores every
vector as a tuple of three full env-tiled arrays and every rotation matrix
as a 3x3 nested tuple — all math becomes perfectly lane-parallel
elementwise ops.

Semantics mirror `reinforcement_learning_tpu.maths` exactly (same eps
guards, same orthonormalization) so the two paths agree to float precision.
`atan2`/`atan` are implemented here as polynomials because Mosaic has no
lowering for them.

Conventions (reference: RocketSim MathTypes.h): rotation matrices have the
body's forward/right/up axes as COLUMNS; ``Mat`` is stored row-major:
``R[i][j]`` = row i, col j, so ``forward = (R[0][0], R[1][0], R[2][0])``.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# A Vec is a tuple (x, y, z) of identically-shaped arrays.
# A Mat is a tuple of 3 rows, each a tuple of 3 arrays.


# --- basic vector ops ------------------------------------------------------

def v(x, y, z):
    return (x, y, z)


def splat(scalar, like):
    return jnp.full_like(like, scalar)


def vzero(like):
    z = jnp.zeros_like(like)
    return (z, z, z)


def vconst(xyz, like):
    return tuple(jnp.full_like(like, float(c)) for c in xyz)


def vadd(*vs):
    return tuple(sum(c[i] for c in vs) for i in range(3))


def vsub(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def vneg(a):
    return (-a[0], -a[1], -a[2])


def vscale(a, s):
    """Multiply vector by scalar array (broadcasting) or python float."""
    return (a[0] * s, a[1] * s, a[2] * s)


def vdot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def vcross(a, b):
    return (a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0])


def vnorm2(a):
    return vdot(a, a)


def vnorm(a):
    return jnp.sqrt(vnorm2(a))


def vnormalize(a, eps=1e-12):
    """Safe normalize matching maths.normalize: 0 for near-zero vectors."""
    n = vnorm(a)
    inv = jnp.where(n > eps, 1.0 / jnp.maximum(n, eps), 0.0)
    return vscale(a, inv)


def vclamp_norm(a, max_norm, eps=1e-12):
    """maths.clamp_norm: rescale only when the norm exceeds max_norm."""
    n = vnorm(a)
    scale = jnp.where(n > max_norm, max_norm / jnp.maximum(n, eps), 1.0)
    return vscale(a, scale)


def vwhere(mask, a, b):
    return tuple(jnp.where(mask, a[i], b[i]) for i in range(3))


def vbroadcast(a, shape):
    return tuple(jnp.broadcast_to(c, shape) for c in a)


# --- matrices --------------------------------------------------------------

def mat_rows(r0, r1, r2):
    return (r0, r1, r2)


def midentity(like):
    o = jnp.ones_like(like)
    z = jnp.zeros_like(like)
    return ((o, z, z), (z, o, z), (z, z, o))


def mcol(R, j):
    """Column j as a Vec (forward=0, right=1, up=2)."""
    return (R[0][j], R[1][j], R[2][j])


def forward(R):
    return mcol(R, 0)


def right(R):
    return mcol(R, 1)


def up(R):
    return mcol(R, 2)


def matvec(R, a):
    """R @ a: rotate local vector into world frame (maths.rotate)."""
    return (R[0][0] * a[0] + R[0][1] * a[1] + R[0][2] * a[2],
            R[1][0] * a[0] + R[1][1] * a[1] + R[1][2] * a[2],
            R[2][0] * a[0] + R[2][1] * a[1] + R[2][2] * a[2])


def mat_t_vec(R, a):
    """R^T @ a: world vector into body frame (maths.inv_rotate)."""
    return (R[0][0] * a[0] + R[1][0] * a[1] + R[2][0] * a[2],
            R[0][1] * a[0] + R[1][1] * a[1] + R[2][1] * a[2],
            R[0][2] * a[0] + R[1][2] * a[1] + R[2][2] * a[2])


def matmul(A, B):
    return tuple(
        tuple(sum(A[i][k] * B[k][j] for k in range(3)) for j in range(3))
        for i in range(3))


def mwhere(mask, A, B):
    return tuple(
        tuple(jnp.where(mask, A[i][j], B[i][j]) for j in range(3))
        for i in range(3))


def inv_inertia_world(R, inv_diag):
    """R diag(inv_diag) R^T — symmetric (car.inv_inertia_world).

    inv_diag: tuple of 3 python floats or arrays.
    """
    d0, d1, d2 = inv_diag
    out = []
    for i in range(3):
        row = []
        for k in range(3):
            row.append(R[i][0] * d0 * R[k][0] + R[i][1] * d1 * R[k][1]
                       + R[i][2] * d2 * R[k][2])
        out.append(tuple(row))
    return tuple(out)


def orthonormalize(R):
    """Gram-Schmidt on forward/right/up columns (maths.orthonormalize)."""
    f = vnormalize(forward(R))
    r = right(R)
    r = vnormalize(vsub(r, vscale(f, vdot(f, r))))
    u = vcross(f, r)
    # Columns back to rows
    return ((f[0], r[0], u[0]), (f[1], r[1], u[1]), (f[2], r[2], u[2]))


def axis_angle_mat(axis, c, s):
    """Rotation matrix for rotation about unit ``axis`` with cos ``c`` /
    sin ``s`` (Rodrigues)."""
    x, y, z = axis
    C = 1.0 - c
    return ((c + x * x * C, x * y * C - z * s, x * z * C + y * s),
            (y * x * C + z * s, c + y * y * C, y * z * C - x * s),
            (z * x * C - y * s, z * y * C + x * s, c + z * z * C))


def integrate_rotation(R, ang_vel, dt):
    """maths.integrate_rotation: exponential map + orthonormalize."""
    theta = vnorm(ang_vel)
    inv = jnp.where(theta > 1e-12, 1.0 / jnp.maximum(theta, 1e-12), 0.0)
    axis = vscale(ang_vel, inv)
    angle = theta * dt
    c = jnp.cos(angle)
    s = jnp.sin(angle)
    rot = axis_angle_mat(axis, c, s)
    return orthonormalize(matmul(rot, R))


def yaw_mat(yaw):
    """Rz(yaw) — euler_to_rotmat with pitch=roll=0."""
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    z = jnp.zeros_like(yaw)
    o = jnp.ones_like(yaw)
    return ((cy, -sy, z), (sy, cy, z), (z, z, o))


# --- transcendentals Mosaic can't lower ------------------------------------

# Degree-11 odd minimax polynomial for atan on [-1, 1]; max abs error ~1e-6.
_ATAN_COEFFS = (0.99997726, -0.33262347, 0.19354346,
                -0.11643287, 0.05265332, -0.01172120)


def atan(z):
    z2 = z * z
    acc = _ATAN_COEFFS[-1]
    for c in _ATAN_COEFFS[-2::-1]:
        acc = acc * z2 + c
    return z * acc


def atan2(y, x):
    """Polynomial atan2 (Mosaic has no atan2 lowering); matches
    np.arctan2 to ~1e-6 including quadrant/zero handling."""
    abs_y = jnp.abs(y)
    abs_x = jnp.abs(x)
    swap = abs_y > abs_x
    num = jnp.where(swap, abs_x, abs_y)
    den = jnp.where(swap, abs_y, abs_x)
    z = num / jnp.maximum(den, 1e-30)
    a = atan(z)
    a = jnp.where(swap, (np.pi / 2) - a, a)
    a = jnp.where(x < 0, np.pi - a, a)
    return jnp.where(y < 0, -a, a)


def roll_angle(R):
    """Roll of R = Rz(yaw) Ry(-pitch) Rx(-roll): -atan2(R21, R22)
    (maths.rotmat_to_euler)."""
    return -atan2(R[2][1], R[2][2])


# --- piecewise-linear curves (gather-free) ---------------------------------

def curve(table, x):
    """Evaluate a LinearPieceCurve, matching jnp.interp semantics (clamped
    at both ends) without gathers: the table is unrolled at trace time.

    table: (xs, ys) python/numpy sequences.
    """
    xs, ys = [np.asarray(t, np.float64) for t in table]
    out = jnp.full_like(x, float(ys[0]))
    for k in range(len(xs) - 1):
        x0, x1 = float(xs[k]), float(xs[k + 1])
        y0, y1 = float(ys[k]), float(ys[k + 1])
        t = jnp.clip((x - x0) / (x1 - x0), 0.0, 1.0)
        seg = y0 + t * (y1 - y0)
        out = jnp.where(x >= x0, seg, out)
    return out


def bsel(mask, a, b):
    """Bool-valued select as pure logical ops.  Mosaic cannot lower
    ``select_n`` on i1 vectors (it materializes an i8 operand and the
    i8->i1 truncation is unsupported), so bool state updates use this
    instead of jnp.where.  ``a``/``b`` may be python bools."""
    if isinstance(a, bool):
        t = mask if a else jnp.zeros_like(mask)
    else:
        t = mask & a
    if isinstance(b, bool):
        f = ~mask if b else jnp.zeros_like(mask)
    else:
        f = ~mask & b
    return t | f


def sel(mask, a, b):
    """Dtype-dispatching select: bsel for bools, jnp.where otherwise."""
    if getattr(a, 'dtype', None) == jnp.bool_:
        return bsel(mask, a, b)
    return jnp.where(mask, a, b)
