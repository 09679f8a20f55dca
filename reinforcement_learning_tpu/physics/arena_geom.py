"""Analytic soccar arena collision geometry.

The reference collides against 16 triangle meshes loaded from ``.cmf`` files
(reference: CollisionMeshFile/, RocketSim.cpp:102-212) plus four implicit
planes.  For a TPU-native engine we want collision queries that are pure
branch-free array math, so the arena is modeled as a fixed set of half-space
planes with region-of-validity masks:

  * floor z=0, ceiling z=2048
  * side walls |x| = 4096
  * back walls |y| = 5120 with the goal opening cut out
  * 45-degree corner walls |x| + |y| = 8064
  * goal box: side walls |x| = GOAL_HALF_WIDTH, ceiling z = GOAL_HEIGHT,
    net back wall |y| = 5120 + GOAL_DEPTH

This matches the real arena's plan-view footprint and bounce behavior on all
flat sections; the curved floor/wall/ceiling transition ramps of the real
mesh are approximated by the sharp plane intersections (upgrade path: swap
`query_*` for a baked SDF/mesh-grid lookup with identical signatures).

All queries are shape-polymorphic and vmap/jit safe.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from reinforcement_learning_tpu import constants as C
from reinforcement_learning_tpu import maths as m

# Plane set: (normal, offset d) with plane eq  n . p - d = 0, n pointing into
# the arena interior.  Conditional planes get a validity mask computed from
# the query position.
_SQ2 = 1.0 / np.sqrt(2.0)

# Static plane table, built once at import (host-side numpy).
#   [nx, ny, nz, d] with signed distance = n . p + d  (>0 inside the arena)
_PLANES = np.array([
    [0, 0, 1, 0],                               # floor
    [0, 0, -1, C.ARENA_HEIGHT],                 # ceiling
    [1, 0, 0, C.ARENA_EXTENT_X],                # wall x = -4096
    [-1, 0, 0, C.ARENA_EXTENT_X],               # wall x = +4096
    [0, 1, 0, C.ARENA_EXTENT_Y],                # back wall y = -5120
    [0, -1, 0, C.ARENA_EXTENT_Y],               # back wall y = +5120
    [_SQ2, _SQ2, 0, C.ARENA_CORNER_INTERCEPT * _SQ2],    # corner -x -y
    [-_SQ2, _SQ2, 0, C.ARENA_CORNER_INTERCEPT * _SQ2],   # corner +x -y
    [_SQ2, -_SQ2, 0, C.ARENA_CORNER_INTERCEPT * _SQ2],   # corner -x +y
    [-_SQ2, -_SQ2, 0, C.ARENA_CORNER_INTERCEPT * _SQ2],  # corner +x +y
    # goal box (valid only when inside the goal opening / behind the wall)
    [1, 0, 0, C.GOAL_HALF_WIDTH],               # goal side x = -893
    [-1, 0, 0, C.GOAL_HALF_WIDTH],              # goal side x = +893
    [0, 0, -1, C.GOAL_HEIGHT],                  # goal ceiling
    [0, 1, 0, C.ARENA_EXTENT_Y + C.GOAL_DEPTH],   # net y = -6000
    [0, -1, 0, C.ARENA_EXTENT_Y + C.GOAL_DEPTH],  # net y = +6000
], dtype=np.float32)

NUM_PLANES = _PLANES.shape[0]
PLANE_N = jnp.asarray(_PLANES[:, :3])
PLANE_D = jnp.asarray(_PLANES[:, 3])

# Indices for readability
FLOOR, CEILING, WALL_XN, WALL_XP, WALL_YN, WALL_YP = range(6)
CORNER0 = 6
GOAL_XN, GOAL_XP, GOAL_CEIL, NET_YN, NET_YP = 10, 11, 12, 13, 14

# Which planes are real btStaticPlaneShapes in the reference arena
# (floor/ceiling/side walls, Arena.cpp:1060-1100) as opposed to
# plane-approximations of triangle-mesh surfaces (back walls, corners,
# goal box).  Car-vs-true-plane contacts go through Bullet's
# btConvexPlaneCollisionAlgorithm (single support-vertex manifold point);
# car-vs-mesh contacts go through GJK with the 2uu triangle margin.
_TRUE_PLANE = np.zeros(NUM_PLANES, bool)
_TRUE_PLANE[[FLOOR, CEILING, WALL_XN, WALL_XP]] = True
TRUE_PLANE = jnp.asarray(_TRUE_PLANE)


# --- hoops arena plane table ------------------------------------------------
# The hoops arena ("Dunk House", reference extents RLConst.h:18-20) is a
# rounded rectangle with solid walls (no goal openings; the baskets are
# inside the volume and scoring is positional, Arena.cpp:958-971).  The
# rounded corners are approximated by 45-degree cuts sized proportionally
# to the soccar corner cut (real hoops meshes replace this when supplied
# to physics/mesh.py).
_HOOPS_CORNER_CUT = 1152.0 * (C.ARENA_EXTENT_X_HOOPS / C.ARENA_EXTENT_X)
_HOOPS_CORNER_INTERCEPT = (C.ARENA_EXTENT_X_HOOPS + C.ARENA_EXTENT_Y_HOOPS
                           - _HOOPS_CORNER_CUT)
_PLANES_HOOPS = np.array([
    [0, 0, 1, 0],
    [0, 0, -1, C.ARENA_HEIGHT_HOOPS],
    [1, 0, 0, C.ARENA_EXTENT_X_HOOPS],
    [-1, 0, 0, C.ARENA_EXTENT_X_HOOPS],
    [0, 1, 0, C.ARENA_EXTENT_Y_HOOPS],
    [0, -1, 0, C.ARENA_EXTENT_Y_HOOPS],
    [_SQ2, _SQ2, 0, _HOOPS_CORNER_INTERCEPT * _SQ2],
    [-_SQ2, _SQ2, 0, _HOOPS_CORNER_INTERCEPT * _SQ2],
    [_SQ2, -_SQ2, 0, _HOOPS_CORNER_INTERCEPT * _SQ2],
    [-_SQ2, -_SQ2, 0, _HOOPS_CORNER_INTERCEPT * _SQ2],
], dtype=np.float32)
PLANE_N_HOOPS = jnp.asarray(_PLANES_HOOPS[:, :3])
PLANE_D_HOOPS = jnp.asarray(_PLANES_HOOPS[:, 3])

# Hoops adds real y-wall planes (Arena.cpp:1104-1117); corners stay
# mesh-approximations.
_TRUE_PLANE_HOOPS = np.zeros(_PLANES_HOOPS.shape[0], bool)
_TRUE_PLANE_HOOPS[:6] = True
TRUE_PLANE_HOOPS = jnp.asarray(_TRUE_PLANE_HOOPS)


def get_true_plane_mask(mode: str = "soccar"):
    """(P,) bool: which planes are real btStaticPlaneShapes in the
    reference (single support-point manifolds) vs mesh stand-ins."""
    if mode == "hoops":
        return TRUE_PLANE_HOOPS
    return TRUE_PLANE


def get_planes(mode: str = "soccar"):
    """(PLANE_N, PLANE_D) for a game mode's arena (soccar geometry also
    serves heatseeker and snowday, like the reference's mesh selection)."""
    if mode == "hoops":
        return PLANE_N_HOOPS, PLANE_D_HOOPS
    return PLANE_N, PLANE_D


def plane_validity(pos: jnp.ndarray, mode: str = "soccar") -> jnp.ndarray:
    """(..., P) bool: which planes can act on a query at ``pos``.

    The soccar back wall is cut out over the goal opening; the goal-box
    planes act only near/inside the goal.  Hoops planes are unconditional.
    """
    if mode == "hoops":
        return jnp.ones(pos.shape[:-1] + (PLANE_N_HOOPS.shape[0],), bool)
    x, y, z = pos[..., 0], pos[..., 1], pos[..., 2]
    in_goal_xz = (jnp.abs(x) < C.GOAL_HALF_WIDTH) & (z < C.GOAL_HEIGHT)
    behind_wall = jnp.abs(y) > C.ARENA_EXTENT_Y

    valid = jnp.ones(pos.shape[:-1] + (NUM_PLANES,), bool)
    # Back walls do not apply inside the goal opening
    valid = valid.at[..., WALL_YN].set(~(in_goal_xz & (y < 0)))
    valid = valid.at[..., WALL_YP].set(~(in_goal_xz & (y > 0)))
    # Goal box planes apply only when behind the goal line (inside goal)
    valid = valid.at[..., GOAL_XN].set(behind_wall)
    valid = valid.at[..., GOAL_XP].set(behind_wall)
    valid = valid.at[..., GOAL_CEIL].set(behind_wall)
    valid = valid.at[..., NET_YN].set(y < 0)
    valid = valid.at[..., NET_YP].set(y > 0)
    return valid


def signed_distances(pos: jnp.ndarray, mode: str = "soccar") -> jnp.ndarray:
    """(..., P) signed distance of ``pos`` to each plane (positive =
    inside the arena)."""
    pn, pd = get_planes(mode)
    return jnp.einsum('...i,pi->...p', pos, pn) + pd


def sphere_contacts(pos: jnp.ndarray, radius: float,
                    mode: str = "soccar"):
    """Sphere-vs-arena contacts.

    Returns (normal (..., P, 3), depth (..., P), active (..., P)): for each
    plane, penetration depth (>0 means touching) and whether the contact is
    active.
    """
    pn, _ = get_planes(mode)
    dist = signed_distances(pos, mode)
    valid = plane_validity(pos, mode)
    depth = radius - dist
    active = valid & (depth > 0)
    normals = jnp.broadcast_to(pn, pos.shape[:-1] + pn.shape)
    return normals, depth, active


def box_support_radius(rot: jnp.ndarray, half_extents: jnp.ndarray
                       ) -> jnp.ndarray:
    """(..., P): effective radius of an oriented box against each plane
    normal — sum_i |h_i * (n . axis_i)|."""
    # rot columns are local axes in world frame: (..., 3, 3)
    # n . axis_i  => (..., P, 3)
    proj = jnp.einsum('pi,...ij->...pj', PLANE_N, rot)
    return jnp.sum(jnp.abs(proj) * half_extents[..., None, :], axis=-1)


def box_contacts(pos: jnp.ndarray, rot: jnp.ndarray,
                 half_extents: jnp.ndarray):
    """Oriented-box-vs-arena contacts (one representative contact per plane).

    Returns (normal (..., P, 3), point (..., P, 3), depth (..., P),
    active (..., P)).  The contact point is the box support point in the
    -normal direction, matching what bullet's one-deepest-point manifold
    converges to against a flat surface.
    """
    dist = signed_distances(pos)
    valid = plane_validity(pos)
    r_eff = box_support_radius(rot, half_extents)
    depth = r_eff - dist
    active = valid & (depth > 0)
    # support point: center - sum_i sign(n . a_i) h_i a_i
    proj = jnp.einsum('pi,...ij->...pj', PLANE_N, rot)  # (..., P, 3)
    signs = jnp.sign(proj)
    # (..., P, 3): sum over local axes j of sign*h_j*axis_j
    offset = jnp.einsum('...pj,...ij->...pi', signs * half_extents[..., None, :],
                        rot)
    point = pos[..., None, :] - offset
    normals = jnp.broadcast_to(PLANE_N, dist.shape + (3,))
    return normals, point, depth, active


def raycast_down_dir(start: jnp.ndarray, direction: jnp.ndarray,
                     max_len, mode: str = "soccar", true_planes_only=False
                     ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Raycast against the arena planes.

    start: (..., 3), direction: (..., 3) unit, max_len: scalar or (...,).
    Returns (hit (...,), dist (...,), normal (..., 3)); dist = max_len when
    no hit.  Mirrors the suspension raycast the reference does against the
    world meshes (btVehicleRL.cpp:118-212) for the planar arena model.
    ``true_planes_only`` keeps only the real btStaticPlaneShapes (used when
    a MeshGrid supplies the mesh surfaces).
    """
    pn, _ = get_planes(mode)
    dist_p = signed_distances(start, mode)                 # (..., P)
    valid = plane_validity(start, mode)
    if true_planes_only:
        valid = valid & get_true_plane_mask(mode)
    denom = -jnp.einsum('...i,pi->...p', direction, pn)    # approach rate
    t = jnp.where(denom > 1e-6, dist_p / jnp.maximum(denom, 1e-6), jnp.inf)
    t = jnp.where(valid & (t >= 0), t, jnp.inf)
    t_min = jnp.min(t, axis=-1)
    idx = jnp.argmin(t, axis=-1)
    hit = t_min <= max_len
    dist = jnp.where(hit, t_min, max_len)
    normal = pn[idx]
    return hit, dist, normal


def is_ball_scored(ball_pos: jnp.ndarray,
                   ball_radius: float = C.BALL_COLLISION_RADIUS_SOCCAR,
                   goal_threshold_y: float = C.SOCCAR_GOAL_SCORE_BASE_THRESHOLD_Y):
    """Reference: Arena::IsBallScored (Arena.cpp:949-957)."""
    return jnp.abs(ball_pos[..., 1]) > (goal_threshold_y + ball_radius)
