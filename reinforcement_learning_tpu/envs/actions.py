"""Discrete action parsers.

``DefaultAction``: the reference's 90-entry discrete lookup table with
ground/air/jump/boost masks (reference: RLGymCPP/ActionParsers/
DefaultAction.cpp:3-118).  The table and static masks are built once in
numpy at import; per-state masking is vectorized boolean algebra compiled
into the env step.

Action float layout: [throttle, steer, pitch, yaw, roll, jump, boost,
handbrake] (same as physics controls).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from reinforcement_learning_tpu import constants as C


def _build_default_action_table():
    actions = []
    R_B = (0.0, 1.0)
    R_F = (-1.0, 0.0, 1.0)

    # Ground actions (DefaultAction.cpp:12-29)
    for throttle in R_F:
        for steer in R_F:
            for boost in R_B:
                for handbrake in R_B:
                    if boost == 1 and throttle != 1:
                        continue
                    actions.append([throttle, steer, 0, steer, 0, 0, boost,
                                    handbrake])
    num_ground = len(actions)

    # Aerial actions (DefaultAction.cpp:33-58)
    for pitch in R_F:
        for yaw in R_F:
            for roll in R_F:
                for jump in R_B:
                    for boost in R_B:
                        if jump == 1 and yaw != 0:
                            continue
                        if pitch == roll and roll == jump and jump == 0:
                            continue
                        handbrake = float(
                            jump == 1 and (pitch != 0 or yaw != 0
                                           or roll != 0))
                        actions.append([boost, yaw, pitch, yaw, roll, jump,
                                        boost, handbrake])

    table = np.array(actions, np.float32)
    n = len(actions)

    jump_mask = table[:, 5] > 0
    boost_mask = table[:, 6] > 0
    ground_mask = np.arange(n) < num_ground
    # NOTE: strictly '>' — index num_ground excluded, replicating the
    # reference exactly (DefaultAction.cpp:80)
    air_mask = (np.arange(n) > num_ground) & ~jump_mask
    # Yaw-only ground actions also allowed in air (DefaultAction.cpp:84-89)
    for i in range(num_ground):
        a = table[i]
        if a[0] == a[6] and (a[3] != 0) == (a[7] != 0):
            air_mask[i] = True

    return table, ground_mask, air_mask, jump_mask, boost_mask, num_ground


class DefaultAction:
    """90-action discrete parser (matches reference count, run_out.log:54)."""

    def __init__(self):
        (table, ground, air, jump, boost, num_ground) = \
            _build_default_action_table()
        self.table_np = table
        self.num_actions = table.shape[0]
        self.table = jnp.asarray(table)
        self.ground_mask = jnp.asarray(ground)
        self.air_mask = jnp.asarray(air)
        self.jump_mask = jnp.asarray(jump)
        self.boost_mask = jnp.asarray(boost)
        self.num_ground = num_ground

    def parse(self, action_indices: jnp.ndarray) -> jnp.ndarray:
        """(...,) int -> (..., 8) control floats."""
        return self.table[action_indices]

    def action_mask(self, cars, prev_cars=None) -> jnp.ndarray:
        """Per-player action masks (DefaultAction.cpp:91-118).

        ``cars``: a CarsState (leading player axis).  Returns (P, A) bool.
        """
        on_ground = cars.is_on_ground
        base = jnp.where(on_ground[:, None], self.ground_mask[None, :],
                         self.air_mask[None, :])
        no_boost = cars.boost == 0
        base = jnp.where((no_boost[:, None]) & self.boost_mask[None, :],
                         False, base)
        turtled = cars.has_world_contact & (
            cars.world_contact_normal[:, 2] > 0.9)
        can_jump = cars.has_flip_or_jump() | turtled
        base = base | (can_jump[:, None] & self.jump_mask[None, :])
        return base
