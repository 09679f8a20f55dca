"""Triangle-mesh collision pipeline tests (physics/mesh.py).

Validates the .cmf round-trip + hash, the procedural soccar mesh, and that
MeshGrid queries agree with the analytic plane geometry (arena_geom) on the
flat sections of the arena — where both must be exact.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from reinforcement_learning_tpu import constants as C
from reinforcement_learning_tpu.physics import arena_geom as geom
from reinforcement_learning_tpu.physics import mesh as meshmod


@pytest.fixture(scope="module")
def soccar():
    verts, tris = meshmod.build_soccar_mesh()
    return verts, tris


@pytest.fixture(scope="module")
def grid(soccar):
    verts, tris = soccar
    return meshmod.MeshGrid.bake(verts, tris)


def test_cmf_roundtrip(tmp_path, soccar):
    verts, tris = soccar
    p = str(tmp_path / "mesh.cmf")
    meshmod.write_cmf(p, verts, tris)
    v2, t2 = meshmod.read_cmf(p)
    assert np.array_equal(v2, verts.astype(np.float32))
    assert np.array_equal(t2, tris.astype(np.int32))
    # hash is deterministic and stable across the round trip
    assert meshmod.cmf_hash(v2, t2) == meshmod.cmf_hash(verts, tris)


def test_cmf_hash_known_value():
    # A fixed tiny mesh; the hash algorithm is pinned to the reference's
    # (CollisionMeshFile.cpp:75-99) so this value must never change.
    verts = np.array([[0, 0, 0], [100, 0, 0], [0, 100, 0]], np.float32)
    tris = np.array([[0, 1, 2]], np.int32)
    h = meshmod.cmf_hash(verts, tris)
    assert 0 <= h < 2**32
    assert h == meshmod.cmf_hash(verts, tris)


def test_soccar_mesh_sane(soccar):
    verts, tris = soccar
    assert len(verts) > 100 and len(tris) > 200
    assert tris.min() >= 0 and tris.max() < len(verts)
    # bounds: the octagon footprint + goals
    assert np.isclose(abs(verts[:, 0]).max(), C.ARENA_EXTENT_X)
    assert np.isclose(abs(verts[:, 1]).max(), C.ARENA_EXTENT_Y + C.GOAL_DEPTH)
    assert np.isclose(verts[:, 2].min(), 0.0)
    assert np.isclose(verts[:, 2].max(), C.ARENA_HEIGHT)
    # no degenerate triangles
    a = verts[tris[:, 0]]
    ab = verts[tris[:, 1]] - a
    ac = verts[tris[:, 2]] - a
    areas = 0.5 * np.linalg.norm(np.cross(ab, ac), axis=-1)
    assert areas.min() > 1.0


def test_sphere_contact_matches_planes_on_flat(grid):
    r = C.BALL_COLLISION_RADIUS_SOCCAR
    # centre floor, side wall, back wall away from fillets/goal, ceiling
    queries = np.array([
        [0, 0, r - 5.0],                                    # floor
        [C.ARENA_EXTENT_X - r + 3.0, 1000, 800],            # +x wall
        [2500, C.ARENA_EXTENT_Y - r + 2.0, 900],            # +y wall
        [-700, -1200, C.ARENA_HEIGHT - r + 4.0],            # ceiling
    ], np.float32)
    n_m, d_m, a_m = grid.sphere_contacts(jnp.asarray(queries), r)
    n_p, d_p, a_p = geom.sphere_contacts(jnp.asarray(queries), r)
    for q in range(len(queries)):
        # deepest active contact agrees between mesh and plane geometry
        dm = np.where(np.asarray(a_m[q]), np.asarray(d_m[q]), -np.inf)
        dp = np.where(np.asarray(a_p[q]), np.asarray(d_p[q]), -np.inf)
        im, ip = dm.argmax(), dp.argmax()
        assert dm[im] > 0, f"query {q}: mesh found no contact"
        assert np.isclose(dm[im], dp[ip], atol=1e-3)
        assert np.allclose(np.asarray(n_m[q][im]), np.asarray(n_p[q][ip]),
                           atol=1e-4)


def test_sphere_no_contact_midair(grid):
    n, d, act = grid.sphere_contacts(jnp.asarray([0.0, 0.0, 500.0]), 92.0)
    assert not bool(jnp.any(act))


def test_fillet_is_curved(grid):
    """In the floor->wall fillet band the mesh contact normal is slanted —
    the thing the plane model can't represent."""
    r = 30.0
    x = C.ARENA_EXTENT_X - meshmod.FLOOR_FILLET_RADIUS * 0.3
    pos = jnp.asarray([x, 0.0, 40.0])
    n, d, act = grid.sphere_contacts(pos, 60.0)
    act = np.asarray(act)
    assert act.any()
    k = np.where(act, np.asarray(d), -np.inf).argmax()
    nk = np.asarray(n)[k]
    # slanted: neither pure floor normal nor pure wall normal
    assert 0.05 < abs(nk[0]) and 0.05 < abs(nk[2])


def test_raycast_down_matches_planes(grid):
    starts = jnp.asarray(np.array([
        [0, 0, 80.0],
        [1500, -2000, 50.0],
    ], np.float32))
    dirs = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0]), starts.shape)
    hit, dist, n = grid.raycast(starts, dirs, 120.0)
    hit_p, dist_p, n_p = geom.raycast_down_dir(starts, dirs, 120.0)
    assert np.array_equal(np.asarray(hit), np.asarray(hit_p))
    assert np.allclose(np.asarray(dist), np.asarray(dist_p), atol=1e-3)
    assert np.allclose(np.asarray(n), np.asarray(n_p), atol=1e-4)


def test_raycast_miss(grid):
    hit, dist, _ = grid.raycast(jnp.asarray([0.0, 0.0, 1000.0]),
                                jnp.asarray([0.0, 0.0, -1.0]), 100.0)
    assert not bool(hit)
    assert np.isclose(float(dist), 100.0)


def test_box_contacts_on_floor(grid):
    pos = jnp.asarray([[100.0, 200.0, 15.0]])
    rot = jnp.broadcast_to(jnp.eye(3), (1, 3, 3))
    he = jnp.asarray([[60.0, 40.0, 18.0]])
    n, p, d, act = grid.box_contacts(pos, rot, he)
    n_p, p_p, d_p, act_p = geom.box_contacts(pos, rot, he)
    dm = np.where(np.asarray(act[0]), np.asarray(d[0]), -np.inf)
    dp = np.where(np.asarray(act_p[0]), np.asarray(d_p[0]), -np.inf)
    assert dm.max() > 0
    assert np.isclose(dm.max(), dp.max(), atol=1e-3)
    k = dm.argmax()
    assert np.allclose(np.asarray(n[0][k]), [0, 0, 1], atol=1e-5)


def test_goal_opening_is_open(grid):
    """A ball in the goal mouth (inside the opening) touches nothing; the
    back of the net is solid."""
    r = C.BALL_COLLISION_RADIUS_SOCCAR
    mouth = jnp.asarray([0.0, C.ARENA_EXTENT_Y + 100.0, 200.0])
    _, _, act = grid.sphere_contacts(mouth, r)
    assert not bool(jnp.any(act))
    net = jnp.asarray([0.0, C.ARENA_EXTENT_Y + C.GOAL_DEPTH - r + 5.0, 200.0])
    n, d, act = grid.sphere_contacts(net, r)
    act = np.asarray(act)
    assert act.any()
    k = np.where(act, np.asarray(d), -np.inf).argmax()
    assert np.allclose(np.asarray(n)[k], [0, -1, 0], atol=1e-4)


def test_load_arena_mesh_roundtrip(tmp_path, soccar):
    """load_arena_mesh with a directory of .cmf files merges them."""
    verts, tris = soccar
    meshmod.write_cmf(str(tmp_path / "a.cmf"), verts, tris)
    g = meshmod.load_arena_mesh(str(tmp_path))
    assert g.tri_a.shape[0] == len(tris)


def test_hoops_procedural_mesh():
    """Hoops bowl + baskets: grid bakes, walls/fillets/rim are queryable."""
    from reinforcement_learning_tpu import constants as C
    from reinforcement_learning_tpu.physics import mesh as meshmod

    verts, tris = meshmod.build_hoops_mesh()
    assert len(tris) > 500
    assert np.abs(verts[:, 2]).max() <= C.ARENA_HEIGHT_HOOPS + 1e-3
    grid = meshmod.MeshGrid.bake(verts, tris)

    # ball resting against the x+ wall: one contact at ~radius
    r = C.BALL_COLLISION_RADIUS_HOOPS
    pos = jnp.asarray([C.ARENA_EXTENT_X_HOOPS - r + 0.5, 0.0, 500.0])
    n, depth, act = grid.sphere_contacts(pos, r)
    assert bool(jnp.any(act))

    # ball dropped onto the rim lip: hits basket geometry at z~365
    cy = C.HOOPS_GOAL_OFFSET_Y / C.HOOPS_GOAL_SCALE_Y
    rim_x = C.HOOPS_GOAL_RADIUS + 20.0
    hit, dist, nrm = grid.raycast(
        jnp.asarray([rim_x, cy, 500.0]),
        jnp.asarray([0.0, 0.0, -1.0]), 400.0)
    assert bool(hit) and 100.0 < float(dist) < 160.0  # 500 - 365 = 135

    # wheel-style ray at mid-field hits nothing above the floor plane
    hit2, dist2, _ = grid.raycast(
        jnp.asarray([0.0, 0.0, 300.0]), jnp.asarray([0.0, 0.0, -1.0]),
        100.0)
    assert not bool(hit2)
