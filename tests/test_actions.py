"""Action table + mask tests (reference: DefaultAction.cpp; count 90
verified against run_out.log:54)."""

import jax.numpy as jnp
import numpy as np

from reinforcement_learning_tpu.envs.actions import DefaultAction
from reinforcement_learning_tpu.physics.state import make_cars_state


def test_table_shape_and_count():
    a = DefaultAction()
    assert a.num_actions == 90
    assert a.num_ground == 24
    assert a.table_np.shape == (90, 8)


def test_ground_actions_have_no_air_controls():
    a = DefaultAction()
    ground = a.table_np[:24]
    # pitch, roll, jump all zero on ground actions
    assert np.all(ground[:, 2] == 0)
    assert np.all(ground[:, 4] == 0)
    assert np.all(ground[:, 5] == 0)
    # steer == yaw on ground actions (reference builds them identically)
    assert np.all(ground[:, 1] == ground[:, 3])


def test_boost_implies_full_throttle_on_ground():
    a = DefaultAction()
    ground = a.table_np[:24]
    boosting = ground[:, 6] == 1
    assert np.all(ground[boosting, 0] == 1)


def test_air_jump_actions_have_no_yaw():
    a = DefaultAction()
    air = a.table_np[24:]
    jumping = air[:, 5] == 1
    assert np.all(air[jumping, 3] == 0)


def test_masks_ground_state():
    a = DefaultAction()
    cars = make_cars_state(1)
    mask = np.asarray(a.action_mask(cars))[0]
    # On ground with boost + flip available: all ground actions + jumps
    assert mask[:24].all()
    ground_np = np.asarray(a.ground_mask)
    jump_np = np.asarray(a.jump_mask)
    air_np = np.asarray(a.air_mask)
    expected = ground_np | jump_np
    np.testing.assert_array_equal(mask, expected)


def test_masks_no_boost():
    a = DefaultAction()
    cars = make_cars_state(1).replace(boost=jnp.zeros((1,)))
    mask = np.asarray(a.action_mask(cars))[0]
    boost_np = np.asarray(a.boost_mask)
    jump_np = np.asarray(a.jump_mask)
    # Boost actions are removed... except those re-enabled by the jump OR
    # (the reference applies the jump mask AFTER the boost removal,
    # DefaultAction.cpp:104-117 — replicated exactly)
    assert not mask[boost_np & ~jump_np].any()


def test_masks_air_no_flip():
    a = DefaultAction()
    cars = make_cars_state(1).replace(
        is_on_ground=jnp.zeros((1,), bool),
        has_flipped=jnp.ones((1,), bool),
        has_double_jumped=jnp.ones((1,), bool))
    mask = np.asarray(a.action_mask(cars))[0]
    jump_np = np.asarray(a.jump_mask)
    air_np = np.asarray(a.air_mask)
    # no flip/jump available -> no jump actions beyond air mask
    assert not mask[jump_np & ~air_np].any()
    assert mask[air_np & ~np.asarray(a.boost_mask)].sum() > 0


def test_parse_roundtrip():
    a = DefaultAction()
    idx = jnp.array([0, 45, 89])
    controls = np.asarray(a.parse(idx))
    np.testing.assert_array_equal(controls, a.table_np[[0, 45, 89]])
