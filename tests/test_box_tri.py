"""box_tri: exact OBB-vs-triangle closest pair + SAT penetration.

Validated against dense barycentric sampling (the closest-pair enumeration
must lower-bound any sampled surface distance) and separation feasibility
of the SAT MTV.
"""
import jax
import jax.numpy as jnp
import numpy as np

from reinforcement_learning_tpu.physics import box_tri


def _sample_tri(tv, n=60):
    u = np.linspace(0, 1, n)
    uu, vv = np.meshgrid(u, u)
    mask = uu + vv <= 1
    uu, vv = uu[mask], vv[mask]
    return tv[0] + np.outer(uu, tv[1] - tv[0]) + np.outer(vv, tv[2] - tv[0])


def test_closest_pair_and_sat_vs_bruteforce():
    rng = np.random.default_rng(0)
    N = 64
    he = jnp.asarray(rng.uniform(0.3, 2.0, (N, 3)), jnp.float32)
    tv = rng.uniform(-4, 4, (N, 3, 3)).astype(np.float32)
    v0, v1, v2 = (jnp.asarray(tv[:, i]) for i in range(3))

    pb, pt, dist = jax.jit(box_tri.closest_pair_box_triangle)(he, v0, v1, v2)
    ov, mtv, pen = jax.jit(box_tri.sat_box_triangle)(he, v0, v1, v2)
    pb, pt, dist, ov, mtv, pen = map(np.asarray, (pb, pt, dist, ov, mtv,
                                                  pen))

    for i in range(N):
        pts = _sample_tri(tv[i])
        h = np.asarray(he[i])
        d_sampled = np.linalg.norm(pts - np.clip(pts, -h, h), axis=1).min()
        if ov[i]:
            # SAT overlap implies sampled distance ~0 is possible but not
            # guaranteed (triangle may pass near the box); check separation:
            shifted = pts - mtv[i] * (pen[i] + 1e-4)
            assert not np.all(np.abs(shifted) <= h + 1e-6, axis=1).any()
        else:
            assert dist[i] <= d_sampled + 1e-5
            assert dist[i] >= d_sampled - 0.15  # sampling resolution
            assert np.all(np.abs(pb[i]) <= h + 1e-4)


def test_contact_on_flat_floor_matches_bullet_probe():
    # identity-rotation box over a big floor triangle: gjk_probe-measured
    # bullet distances (core = he - 0.04, minus the 0.03616 safe margin)
    he = jnp.asarray([1.1801, 0.8420, 0.3616])
    tri = (jnp.asarray([0.0, -10.0, 0.0]), jnp.asarray([20.48, -10.0, 0.0]),
           jnp.asarray([20.48, 10.48, 0.0]))
    for z, want in [(0.45, 0.092240), (0.40, 0.042240), (0.3616, 0.003840),
                    (0.30, -0.057754)]:
        n, pt, dist = box_tri.box_triangle_contact(
            jnp.asarray([15.0, -2.0, z]), jnp.eye(3), he, 0.04, 0.03616,
            *tri)
        assert abs(float(dist) - want) < 2e-3, (z, float(dist), want)
        assert float(n[2]) > 0.99
