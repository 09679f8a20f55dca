"""RLBot deployment agent.

The reference deploys trained policies into the real game via a C++ RLBot
client that rebuilds a ``GameState`` from game packets and infers every
``tick_skip`` ticks with the training-time ``action_delay`` emulated
(reference: src/RLBotClient.cpp:27-150 + rlbot/CppPythonAgent.py).

This module is the framework-side equivalent, engine-agnostic: an
``RLBotAdapter`` holds the tick/delay state machine and obs construction;
``packet_to_state`` converts an RLBot-style packet dict into the obs
builder's inputs.  Inference runs either through the native C++ runtime
(deploy/native.py — no JAX needed on the game machine) or InferUnit.

An actual RLBot python agent subclass is a thin shim::

    from rlbot.agents.base_agent import BaseAgent
    class Agent(BaseAgent):
        def initialize_agent(self):
            self.adapter = RLBotAdapter.from_checkpoint(...)
        def get_output(self, packet):
            return SimpleControllerState(*self.adapter.get_output(
                packet_to_dict(packet), self.index))
"""

from __future__ import annotations

import dataclasses

import numpy as np

from reinforcement_learning_tpu import maths as m
from reinforcement_learning_tpu.envs.actions import DefaultAction
from reinforcement_learning_tpu.envs.obs import AdvancedObs


def euler_to_rotmat_np(yaw, pitch, roll):
    import jax.numpy as jnp
    return np.asarray(m.euler_to_rotmat(jnp.asarray(yaw), jnp.asarray(pitch),
                                        jnp.asarray(roll)))


@dataclasses.dataclass
class PacketPlayer:
    pos: np.ndarray
    yaw: float
    pitch: float
    roll: float
    vel: np.ndarray
    ang_vel: np.ndarray
    boost: float
    team: int
    is_on_ground: bool = True
    has_jumped: bool = False
    is_demoed: bool = False


class RLBotAdapter:
    """Tick-skip / action-delay state machine around a deployed policy
    (reference: RLBotBot::GetOutput, RLBotClient.cpp:94-139)."""

    def __init__(self, infer_fn, obs_builder: AdvancedObs,
                 action_parser: DefaultAction | None = None,
                 tick_skip: int = 8, action_delay: int = 7):
        self.infer_fn = infer_fn  # (obs (P,D), masks) -> action idx for us
        self.obs_builder = obs_builder
        self.action_parser = action_parser or DefaultAction()
        self.tick_skip = tick_skip
        self.action_delay = action_delay
        self.ticks = -1
        self.prev_time = 0.0
        self.update_action = True
        self.controls = np.zeros(8, np.float32)
        self.pending_action = np.zeros(8, np.float32)

    @classmethod
    def from_npz(cls, npz_path: str, team_size: int,
                 my_index: int, **kwargs) -> "RLBotAdapter":
        from reinforcement_learning_tpu.deploy.native import NativePolicy
        from reinforcement_learning_tpu.learn.ppo import PPOParams
        import sys, os
        sys.path.insert(0, os.path.join(os.path.dirname(__file__),
                                        "..", "..", "tools"))
        from checkpoint_converter import load_npz_params
        raw = load_npz_params(npz_path)
        params = PPOParams(shared_head=raw.get("shared_head"),
                           policy=raw["policy"], critic=raw["critic"])
        teams = np.array([0] * team_size + [1] * team_size)
        obs_builder = AdvancedObs(2 * team_size, teams)
        parser = DefaultAction()
        policy = NativePolicy.from_params(params, obs_builder.obs_size,
                                          parser.num_actions)

        def infer(obs_row, mask_row):
            return int(policy.infer(obs_row[None], mask_row[None],
                                    deterministic=True)[0])

        adapter = cls(infer, obs_builder, parser, **kwargs)
        adapter.my_index = my_index
        return adapter

    def build_obs(self, ball_pos, ball_vel, ball_ang_vel, players,
                  pads_active, my_index: int) -> np.ndarray:
        """Assemble the local player's obs row from packet data using the
        same AdvancedObs layout as training."""
        import jax.numpy as jnp
        from reinforcement_learning_tpu.physics.state import (
            make_ball_state, make_cars_state, make_pads_state)
        from reinforcement_learning_tpu.envs.obs import PAD_PERMUTATION

        P = len(players)
        cars = make_cars_state(P)
        cars = cars.replace(
            pos=jnp.asarray([p.pos for p in players], jnp.float32),
            rot=jnp.asarray(np.stack([euler_to_rotmat_np(
                p.yaw, p.pitch, p.roll) for p in players]), jnp.float32),
            vel=jnp.asarray([p.vel for p in players], jnp.float32),
            ang_vel=jnp.asarray([p.ang_vel for p in players], jnp.float32),
            boost=jnp.asarray([p.boost for p in players], jnp.float32),
            is_on_ground=jnp.asarray([p.is_on_ground for p in players]),
            has_jumped=jnp.asarray([p.has_jumped for p in players]),
            is_demoed=jnp.asarray([p.is_demoed for p in players]))
        ball = make_ball_state().replace(
            pos=jnp.asarray(ball_pos, jnp.float32),
            vel=jnp.asarray(ball_vel, jnp.float32),
            ang_vel=jnp.asarray(ball_ang_vel, jnp.float32))
        pads = make_pads_state()
        # Packet pads arrive in canonical order; store in arena order
        inv_perm = np.argsort(PAD_PERMUTATION)
        arena_active = np.asarray(pads_active)[inv_perm]
        pads = pads.replace(is_active=jnp.asarray(arena_active, bool))

        teams = jnp.asarray([p.team for p in players], jnp.int32)
        prev_actions = jnp.zeros((P, 8), jnp.float32)
        prev_actions = prev_actions.at[my_index].set(
            jnp.asarray(self.controls))
        obs = self.obs_builder.build(cars, ball, pads, prev_actions, teams)
        mask = self.action_parser.action_mask(cars)
        return np.asarray(obs[my_index]), np.asarray(mask[my_index])

    def get_output(self, seconds_elapsed: float, ball_pos, ball_vel,
                   ball_ang_vel, players, pads_active,
                   my_index: int) -> np.ndarray:
        """Per-game-tick entry (120 Hz): returns the 8-float controls."""
        delta = seconds_elapsed - self.prev_time
        self.prev_time = seconds_elapsed
        ticks_elapsed = int(round(delta * 120.0))
        if self.ticks >= 0:
            self.ticks += ticks_elapsed

        if self.update_action:
            self.update_action = False
            obs_row, mask_row = self.build_obs(
                ball_pos, ball_vel, ball_ang_vel, players, pads_active,
                my_index)
            idx = self.infer_fn(obs_row, mask_row)
            self.pending_action = np.asarray(
                self.action_parser.table_np[idx])

        if self.ticks >= (self.action_delay - 1) or self.ticks == -1:
            self.controls = self.pending_action

        if self.ticks >= self.tick_skip or self.ticks == -1:
            self.ticks = 0
            self.update_action = True

        return self.controls
