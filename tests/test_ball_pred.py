"""BallPredTracker: the ball-only predictor must reproduce the full
engine's ball trajectory exactly when no cars interfere."""

import jax
import jax.numpy as jnp
import numpy as np

from reinforcement_learning_tpu.physics import ball_pred, step as stepmod


def test_prediction_matches_engine():
    params = stepmod.ArenaParams(num_cars=1)
    phys = stepmod.make_physics_state(params)
    ball = phys.arena.ball.replace(
        pos=jnp.asarray([800.0, -2000.0, 600.0]),
        vel=jnp.asarray([400.0, 900.0, -200.0]),
        ang_vel=jnp.asarray([1.0, -2.0, 0.5]))
    # park the car far from the ball's path
    cars = phys.arena.cars
    cars = cars.replace(pos=cars.pos.at[0].set(
        jnp.asarray([-3000.0, 3000.0, 17.01])))
    phys = phys.replace(arena=phys.arena.replace(ball=ball, cars=cars))

    T = 120
    pred = ball_pred.predict_ball(ball, params.mutators, T)

    teams = jnp.array([0])
    controls = jnp.zeros((1, 8))
    key = jax.random.PRNGKey(0)
    state = phys
    engine_pos = []
    for i in range(T // 8):
        state = jax.jit(
            lambda p, k: stepmod.arena_step(p, controls, teams, k, params)
        )(state, key)
        engine_pos.append(np.asarray(state.arena.ball.pos))
    # engine snapshot i is after (i+1)*8 ticks = prediction index (i+1)*8-1
    for i, ep in enumerate(engine_pos):
        pp = np.asarray(jax.tree.map(lambda x: x[(i + 1) * 8 - 1],
                                     pred).pos)
        np.testing.assert_allclose(pp, ep, atol=1e-3)


def test_tracker_api():
    params = stepmod.ArenaParams(num_cars=1)
    ball = stepmod.make_physics_state(params).arena.ball.replace(
        pos=jnp.asarray([0.0, 0.0, 1000.0]),
        vel=jnp.asarray([0.0, 0.0, -100.0]))
    tr = ball_pred.BallPredTracker(num_pred_ticks=60)
    pred = tr.update(ball)
    assert pred.pos.shape == (60, 3)
    # predData[0] is the CURRENT state (BallPredTracker.cpp semantics)
    np.testing.assert_allclose(np.asarray(pred.pos[0]),
                               np.asarray(ball.pos), atol=1e-6)
    s = tr.get_ball_state_for_time(0.0)
    np.testing.assert_allclose(np.asarray(s.pos),
                               np.asarray(ball.pos), atol=1e-6)
    s = tr.get_ball_state_for_time(0.25)  # floor(0.25 * 120) = tick 30
    np.testing.assert_allclose(np.asarray(s.pos),
                               np.asarray(pred.pos[30]), atol=1e-6)
    # falling under gravity
    assert float(pred.pos[30, 2]) < 1000.0
