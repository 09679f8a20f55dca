"""Standalone deployment inference.

Re-design of ``InferUnit`` (reference: Util/InferUnit.{h,cpp}): load a
trained policy (+ optional shared head) from a checkpoint and infer
actions for game states outside the training loop — e.g. the RLBot client
on CPU.  Obs building and action parsing use the same plugin objects as
training, guaranteeing the obs-size contract (InferUnit.cpp:45-52).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from reinforcement_learning_tpu.envs.actions import DefaultAction
from reinforcement_learning_tpu.envs.obs import AdvancedObs
from reinforcement_learning_tpu.learn.ppo import (PPOConfig, PPOLearner,
                                                  PPOParams)


class InferUnit:
    """Policy inference for deployment.

    Build from a training checkpoint directory (orbax) or a converted
    ``.npz`` params file (tools/checkpoint_converter.py).
    """

    def __init__(self, obs_builder, action_parser, params: PPOParams,
                 ppo_config: PPOConfig, deterministic: bool = True):
        self.obs_builder = obs_builder
        self.action_parser = action_parser
        self.learner = PPOLearner(obs_builder.obs_size,
                                  action_parser.num_actions, ppo_config)
        self.params = params
        self.deterministic = deterministic
        self._infer = jax.jit(self._infer_impl)

    @classmethod
    def from_checkpoint(cls, path: str, team_size: int,
                        ppo_config: PPOConfig | None = None,
                        deterministic: bool = True) -> "InferUnit":
        import orbax.checkpoint as ocp

        with ocp.PyTreeCheckpointer() as ckptr:
            tree = ckptr.restore(os.path.join(os.path.abspath(path),
                                              "state"))
        raw = tree["ppo"]["params"]
        params = PPOParams(shared_head=raw.get("shared_head"),
                           policy=raw["policy"], critic=raw["critic"])
        num_players = team_size * 2
        teams = np.array([0] * team_size + [1] * team_size)
        obs_builder = AdvancedObs(num_players, teams)
        action_parser = DefaultAction()
        cfg = ppo_config or _config_from_params(raw, obs_builder.obs_size,
                                                action_parser.num_actions)
        return cls(obs_builder, action_parser, params, cfg, deterministic)

    @classmethod
    def from_npz(cls, path: str, team_size: int,
                 ppo_config: PPOConfig | None = None,
                 deterministic: bool = True) -> "InferUnit":
        import sys
        sys.path.insert(0, os.path.join(os.path.dirname(__file__),
                                        "..", "..", "tools"))
        from checkpoint_converter import load_npz_params
        raw = load_npz_params(path)
        params = PPOParams(shared_head=raw.get("shared_head"),
                           policy=raw["policy"], critic=raw["critic"])
        num_players = team_size * 2
        teams = np.array([0] * team_size + [1] * team_size)
        obs_builder = AdvancedObs(num_players, teams)
        action_parser = DefaultAction()
        cfg = ppo_config or _config_from_params(raw, obs_builder.obs_size,
                                                action_parser.num_actions)
        return cls(obs_builder, action_parser, params, cfg, deterministic)

    def _infer_impl(self, params, obs, masks, key):
        actions, _ = self.learner.sample_actions(
            params, obs, masks, key, deterministic=self.deterministic)
        return actions

    def infer_actions(self, obs: np.ndarray, masks: np.ndarray | None = None,
                      key=None) -> np.ndarray:
        """(B, obs_size) -> (B,) action indices (InferUnit.cpp:36-81)."""
        obs = jnp.asarray(obs, jnp.float32)
        if masks is None:
            masks = jnp.ones((obs.shape[0], self.action_parser.num_actions),
                             bool)
        else:
            masks = jnp.asarray(masks, bool)
        key = key if key is not None else jax.random.PRNGKey(0)
        return np.asarray(self._infer(self.params, obs, masks, key))

    def infer_controls(self, obs, masks=None, key=None) -> np.ndarray:
        """Action indices -> 8-float control rows."""
        idx = self.infer_actions(obs, masks, key)
        return np.asarray(self.action_parser.table_np[idx])


def _config_from_params(raw_params: dict, obs_size: int,
                        num_actions: int) -> PPOConfig:
    """Recover layer sizes from a params tree (mirrors the reference's
    model_info_from_dict in tools/checkpoint_converter.py)."""
    def sizes(tree):
        if tree is None:
            return ()
        return tuple(int(l["b"].shape[0]) for l in tree["layers"])

    return PPOConfig(
        policy_layers=sizes(raw_params["policy"]),
        critic_layers=sizes(raw_params["critic"]),
        shared_head_layers=sizes(raw_params.get("shared_head")),
        layer_norm="ln_scale" in raw_params["policy"]["layers"][0],
        half_precision=False)
