"""facet_arena vs MeshGrid: the analytic facet set must reproduce the
procedural soccar mesh's surfaces (same geometry, gather-free queries)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reinforcement_learning_tpu import constants as C
from reinforcement_learning_tpu.physics import facet_arena as fa
from reinforcement_learning_tpu.physics import mesh as meshmod


@pytest.fixture(scope="module")
def grid():
    return meshmod.load_arena_mesh(None)


@pytest.fixture(scope="module")
def wall_tri_mask(grid):
    """Mesh triangles that the facet set models: everything except the
    arena floor/ceiling sheets (covered by the infinite static planes)."""
    a = np.asarray(grid.tri_a)
    b = a + np.asarray(grid.edge_ab)
    c = a + np.asarray(grid.edge_ac)
    ey = C.ARENA_EXTENT_Y
    hz = np.stack([a[:, 2], b[:, 2], c[:, 2]])
    hy = np.abs(np.stack([a[:, 1], b[:, 1], c[:, 1]]))
    floor = (hz < 1.0).all(0) & (hy <= ey + 1.0).all(0)
    ceil = (hz > C.ARENA_HEIGHT - 1.0).all(0)
    return ~(floor | ceil)


def _mesh_min_dist(grid, mask, pts):
    """Min distance from each point to any modeled mesh triangle
    (exhaustive, not grid-limited)."""
    a = jnp.asarray(np.asarray(grid.tri_a)[mask])
    ab = jnp.asarray(np.asarray(grid.edge_ab)[mask])
    ac = jnp.asarray(np.asarray(grid.edge_ac)[mask])

    def one(p):
        cp = meshmod._closest_point_triangle(p[None, :], a, ab, ac)
        return jnp.min(jnp.linalg.norm(p[None, :] - cp, axis=-1))

    return jax.vmap(one)(pts)


def _facet_min_dist(pts):
    px, py, pz = pts[:, 0], pts[:, 1], pts[:, 2]
    _, _, _, gaps, _ = fa.sphere_contacts(px, py, pz, 0.0, 1e9)
    return jnp.min(gaps, axis=0)


def _sample_points(grid, mask, n, seed, off_lo=-5.0, off_hi=140.0):
    rng = np.random.RandomState(seed)
    a = np.asarray(grid.tri_a)[mask]
    ab = np.asarray(grid.edge_ab)[mask]
    ac = np.asarray(grid.edge_ac)[mask]
    nrm = np.asarray(grid.normal)[mask]
    ti = rng.randint(0, len(a), n)
    u, v = rng.uniform(0, 1, (2, n, 1))
    sw = (u + v) > 1
    u, v = np.where(sw, 1 - u, u), np.where(sw, 1 - v, v)
    pts = (a[ti] + ab[ti] * u + ac[ti] * v
           + nrm[ti] * rng.uniform(off_lo, off_hi, (n, 1)))
    return jnp.asarray(pts, jnp.float32)


def test_surface_distance_matches_mesh(grid, wall_tri_mask):
    pts = _sample_points(grid, wall_tri_mask, 4000, seed=0)
    d_mesh = _mesh_min_dist(grid, wall_tri_mask, pts)
    d_facet = _facet_min_dist(pts)
    err = np.abs(np.asarray(d_mesh) - np.abs(np.asarray(d_facet)))
    assert np.max(err) < 0.75, (np.max(err), np.argmax(err),
                                np.asarray(pts)[np.argmax(err)])


def test_random_volume_distance_matches_mesh(grid, wall_tri_mask):
    rng = np.random.RandomState(3)
    pts = jnp.asarray(rng.uniform(
        [-4300, -6100, 0], [4300, 6100, C.ARENA_HEIGHT], (3000, 3)),
        jnp.float32)
    d_mesh = _mesh_min_dist(grid, wall_tri_mask, pts)
    d_facet = _facet_min_dist(pts)
    err = np.abs(np.asarray(d_mesh) - np.abs(np.asarray(d_facet)))
    assert np.max(err) < 0.75, (np.max(err),
                                np.asarray(pts)[np.argmax(err)])


def test_resting_ball_contact_normals(grid, wall_tri_mask):
    """A ball resting on a wall facet: the facet contact with the smallest
    gap must use that facet's face normal (matching the mesh face
    contact)."""
    rng = np.random.RandomState(1)
    # non-horizontal tris only: the inward-orientation heuristic below
    # keys on the xy normal component
    mask = wall_tri_mask & (np.abs(np.asarray(grid.normal)[:, 2]) < 0.9)
    a = np.asarray(grid.tri_a)[mask]
    ab = np.asarray(grid.edge_ab)[mask]
    ac = np.asarray(grid.edge_ac)[mask]
    nrm = np.asarray(grid.normal)[mask]
    ti = rng.randint(0, len(a), 500)
    # interior points, away from edges
    u = rng.uniform(0.3, 0.4, (500, 1))
    v = rng.uniform(0.3, 0.4, (500, 1))
    r = 91.25
    # orient the triangle normal toward the arena interior (the ball side)
    cen = a[ti] + ab[ti] * u + ac[ti] * v
    inward = np.sign(-(cen[:, :2] * nrm[ti][:, :2]).sum(-1, keepdims=True))
    inward = np.where(inward == 0, 1.0, inward)
    n_in = nrm[ti] * inward
    pts = jnp.asarray(cen + n_in * r, jnp.float32)
    nx_s, ny_s, nz_s, gaps_s, _ = fa.sphere_contacts(
        pts[:, 0], pts[:, 1], pts[:, 2], r, 2.0)
    gaps = jnp.moveaxis(gaps_s, 0, -1)               # (N, F)
    res_n = jnp.moveaxis(jnp.stack([nx_s, ny_s, nz_s], -1), 0, 1)
    # (N, F, 3)
    # some facet must reproduce the sampled surface: face normal matching
    # the triangle's, gap ~ 0 (the ball may simultaneously touch OTHER
    # surfaces more deeply, e.g. inside the goal box)
    dots = jnp.sum(res_n * jnp.asarray(n_in, jnp.float32)[:, None, :], -1)
    match = (dots > 0.9999) & (jnp.abs(gaps) < 0.1)
    ok = np.asarray(jnp.any(match, axis=1))
    assert ok.all(), np.asarray(pts)[~ok][:5]


def test_raycasts_match_mesh(grid, wall_tri_mask):
    """Short downward-ish rays near surfaces: nearest-hit distance must
    match the mesh raycast restricted to modeled triangles."""
    rng = np.random.RandomState(2)
    pts = _sample_points(grid, wall_tri_mask, 800, seed=5,
                         off_lo=20.0, off_hi=60.0)
    dirs = rng.normal(size=(800, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    dirs = jnp.asarray(dirs, jnp.float32)
    max_len = 80.0

    a = jnp.asarray(np.asarray(grid.tri_a)[wall_tri_mask])
    ab = jnp.asarray(np.asarray(grid.edge_ab)[wall_tri_mask])
    ac = jnp.asarray(np.asarray(grid.edge_ac)[wall_tri_mask])

    def mesh_ray(o, d):
        t, valid = meshmod._ray_triangle(o[None, :], d[None, :], a, ab, ac)
        t = jnp.where(valid & (t >= 0), t, jnp.inf)
        return jnp.min(t)

    t_mesh = jax.vmap(mesh_ray)(pts, dirs)
    d_f, _, _, _, hit = fa.raycasts(pts[:, 0], pts[:, 1], pts[:, 2],
                                    dirs[:, 0], dirs[:, 1], dirs[:, 2],
                                    max_len)
    t_mesh_c = np.minimum(np.asarray(t_mesh), max_len)
    d_f = np.asarray(jnp.where(hit, d_f, max_len))
    err = np.abs(t_mesh_c - d_f)
    assert np.max(err) < 0.75, (np.max(err),
                                np.asarray(pts)[np.argmax(err)])
