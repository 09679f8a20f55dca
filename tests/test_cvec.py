"""Component-form math (ops/cvec) agrees with the array-form maths module."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reinforcement_learning_tpu import constants as C
from reinforcement_learning_tpu import maths as m
from reinforcement_learning_tpu.ops import cvec


def _rand_vecs(key, n=64):
    return jax.random.normal(key, (n, 3)) * 3.0


def _to_c(a):
    return (a[:, 0], a[:, 1], a[:, 2])


def _from_c(t):
    return jnp.stack(t, axis=-1)


def _rand_rots(key, n=64):
    yaw, pitch, roll = jax.random.uniform(key, (3, n), minval=-3, maxval=3)
    return m.euler_to_rotmat(yaw, pitch, roll)


def _mat_to_c(R):
    return tuple(tuple(R[:, i, j] for j in range(3)) for i in range(3))


def _mat_from_c(Rc):
    return jnp.stack([jnp.stack(list(row), axis=-1) for row in Rc], axis=-2)


def test_vector_ops():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    a, b = _rand_vecs(k1), _rand_vecs(k2)
    ac, bc = _to_c(a), _to_c(b)
    np.testing.assert_allclose(cvec.vdot(ac, bc), m.dot(a, b), rtol=1e-6)
    np.testing.assert_allclose(_from_c(cvec.vcross(ac, bc)),
                               m.cross(a, b), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(cvec.vnorm(ac), m.norm(a), rtol=1e-6)
    np.testing.assert_allclose(_from_c(cvec.vnormalize(ac)),
                               m.normalize(a), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(_from_c(cvec.vclamp_norm(ac, 2.0)),
                               m.clamp_norm(a, 2.0), rtol=1e-6)
    # zero vector normalize -> zero
    z = (jnp.zeros(4), jnp.zeros(4), jnp.zeros(4))
    assert np.all(_from_c(cvec.vnormalize(z)) == 0)


def test_matrix_ops():
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    R = _rand_rots(k1)
    a = _rand_vecs(k2)
    Rc, ac = _mat_to_c(R), _to_c(a)
    np.testing.assert_allclose(_from_c(cvec.matvec(Rc, ac)),
                               m.rotate(R, a), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(_from_c(cvec.mat_t_vec(Rc, ac)),
                               m.inv_rotate(R, a), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(_from_c(cvec.forward(Rc)),
                               m.rotmat_forward(R), atol=1e-7)
    np.testing.assert_allclose(_mat_from_c(cvec.orthonormalize(Rc)),
                               m.orthonormalize(R), rtol=1e-5, atol=1e-5)


def test_inv_inertia_world():
    R = _rand_rots(jax.random.PRNGKey(2))
    diag = jnp.array([0.3, 0.5, 0.9])
    ref = jnp.einsum('nij,j,nkj->nik', R, diag, R)
    got = cvec.inv_inertia_world(_mat_to_c(R), (0.3, 0.5, 0.9))
    np.testing.assert_allclose(_mat_from_c(got), ref, rtol=1e-5, atol=1e-5)


def test_integrate_rotation():
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    R = _rand_rots(k1)
    w = _rand_vecs(k2) * 2.0
    ref = m.integrate_rotation(R, w, 1 / 120)
    got = cvec.integrate_rotation(_mat_to_c(R), _to_c(w), 1 / 120)
    np.testing.assert_allclose(_mat_from_c(got), ref, rtol=1e-4, atol=1e-5)
    # zero angular velocity: orthonormalized identity rotation
    z = _to_c(jnp.zeros_like(w))
    got0 = cvec.integrate_rotation(_mat_to_c(R), z, 1 / 120)
    np.testing.assert_allclose(_mat_from_c(got0), m.orthonormalize(R),
                               rtol=1e-5, atol=1e-6)


def test_yaw_mat():
    yaw = jnp.linspace(-3, 3, 16)
    np.testing.assert_allclose(_mat_from_c(cvec.yaw_mat(yaw)),
                               m.euler_to_rotmat(yaw), atol=1e-6)


def test_atan2():
    ys = np.linspace(-5, 5, 101)
    xs = np.linspace(-5, 5, 101)
    Y, X = np.meshgrid(ys, xs)
    got = np.asarray(cvec.atan2(jnp.asarray(Y), jnp.asarray(X)))
    ref = np.arctan2(Y, X)
    np.testing.assert_allclose(got, ref, atol=3e-6)
    # axes / origin conventions
    assert abs(float(cvec.atan2(jnp.zeros(()), jnp.ones(())))) < 1e-6
    np.testing.assert_allclose(
        float(cvec.atan2(jnp.zeros(()), -jnp.ones(()))), np.pi, atol=1e-6)


def test_roll_angle():
    yaw, pitch, roll = jax.random.uniform(
        jax.random.PRNGKey(4), (3, 64), minval=-1.4, maxval=1.4)
    R = m.euler_to_rotmat(yaw, pitch, roll)
    _, _, ref = m.rotmat_to_euler(R)
    got = cvec.roll_angle(_mat_to_c(R))
    np.testing.assert_allclose(got, ref, atol=5e-6)


@pytest.mark.parametrize("table", [
    C.DRIVE_SPEED_TORQUE_FACTOR_CURVE,
    C.STEER_ANGLE_FROM_SPEED_CURVE,
    C.LAT_FRICTION_CURVE,
    C.BALL_CAR_EXTRA_IMPULSE_FACTOR_CURVE,
    C.BUMP_VEL_AMOUNT_GROUND_CURVE,
    C.NON_STICKY_FRICTION_FACTOR_CURVE,
])
def test_curves_match_interp(table):
    xs = np.asarray(table[0], np.float64)
    lo, hi = xs.min() - abs(xs.min()) - 1, xs.max() * 1.5 + 1
    x = jnp.asarray(np.linspace(lo, hi, 257), jnp.float32)
    ref = m.curve(table, x)
    got = cvec.curve(table, x)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
