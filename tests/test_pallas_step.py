"""The Pallas physics megakernel (ops/pallas_step) reproduces the
component-form tick (ops/ctick) it wraps.

On CPU the kernel runs in interpret mode; on TPU the same parity holds
for the compiled Mosaic kernel (checked by the bench driver scripts).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reinforcement_learning_tpu import constants as C

# Interpret-mode megakernel execution is minutes-per-test on small CPU
# hosts (the kernel emulates the whole multi-tick step element-wise).
# The XLA-vs-ctick equality (test_ctick) already guards the kernel BODY
# on every run; this file additionally guards the Mosaic wrapper, so it
# runs on TPU always and on CPU only when opted in.
pytestmark = pytest.mark.skipif(
    jax.default_backend() == "cpu"
    and not os.environ.get("RLT_PALLAS_TESTS"),
    reason="interpret-mode pallas parity: set RLT_PALLAS_TESTS=1 or run "
           "on TPU")
from reinforcement_learning_tpu import maths as m
from reinforcement_learning_tpu.ops import ctick, pack, pallas_step
from reinforcement_learning_tpu.physics import step as stepmod

E, CARS = 8, 4
TEAMS = (0, 0, 1, 1)


def _random_phys(key, params):
    ks = jax.random.split(key, 8)
    phys = jax.vmap(lambda _: stepmod.make_physics_state(params))(
        jnp.arange(E))
    cars = phys.arena.cars
    grid = jnp.asarray(
        [[-2000.0, -2000.0], [2000.0, -2000.0],
         [-2000.0, 2000.0], [2000.0, 2000.0]], jnp.float32)
    xy = grid[None] + jax.random.uniform(ks[0], (E, CARS, 2),
                                         minval=-300, maxval=300)
    z = jax.random.uniform(ks[1], (E, CARS), minval=50.0, maxval=900.0)
    pos = jnp.concatenate([xy, z[..., None]], axis=-1)
    vel = jax.random.uniform(ks[2], (E, CARS, 3), minval=-800, maxval=800)
    yaw = jax.random.uniform(ks[4], (E, CARS), minval=-3.1, maxval=3.1)
    rot = m.euler_to_rotmat(yaw, jnp.zeros_like(yaw), jnp.zeros_like(yaw))
    cars = cars.replace(
        pos=pos, vel=vel, rot=rot,
        boost=jax.random.uniform(ks[3], (E, CARS), minval=0, maxval=100))
    return phys.replace(arena=phys.arena.replace(cars=cars))


@pytest.mark.parametrize("full_fidelity", [False, True])
def test_pallas_step_matches_ctick(full_fidelity):
    params = stepmod.ArenaParams(num_cars=CARS, use_mesh=full_fidelity,
                                 dynamic_wheel_rays=full_fidelity)
    key = jax.random.PRNGKey(3)
    phys = _random_phys(key, params)
    ks = jax.random.split(key, 2)
    controls = jax.random.uniform(ks[0], (E, CARS, 8), minval=-1, maxval=1)
    controls = controls.at[..., 5:].set(
        (controls[..., 5:] > 0).astype(jnp.float32))
    ridx = jax.random.randint(ks[1], (E, CARS), 0, 4)

    out = pallas_step.pallas_arena_step(
        phys, controls, ridx, params=params, teams=TEAMS, interpret=True)

    S = pallas_step._env_shape(E)
    k = ctick.make_consts(params, TEAMS)
    st = pack.to_components(phys, S=S)
    nc = tuple(jnp.swapaxes(controls[..., c], 0, 1).reshape((CARS,) + S)
               for c in range(8))
    ri = jnp.swapaxes(ridx, 0, 1).reshape((CARS,) + S)
    ref_st = jax.jit(lambda st, nc, ri: ctick.step(k, st, nc, ri))(
        st, nc, ri)
    ref = pack.from_components(ref_st, E)

    flat_a = jax.tree_util.tree_leaves(out)
    flat_b = jax.tree_util.tree_leaves(ref)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=1e-5, atol=1e-3)
