"""Transfer learning: distill an old policy into a new network.

Re-design of the reference transfer-learn path (reference:
Learner::StartTransferLearn Learner.cpp:299-480 +
PPOLearner::TransferLearn PPOLearner.cpp:583-637 + TransferLearnConfig.h):
step the envs with the NEW policy while building obs through BOTH obs
builders, then match the new policy's masked action distribution to the
frozen old policy's (L1 or |KL|^exponent loss, scaled), with an optional
action-index mapping when the action spaces differ.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from reinforcement_learning_tpu.learn.ppo import PPOLearner, PPOParams


@dataclasses.dataclass(frozen=True)
class TransferLearnConfig:
    """Mirror of TransferLearnConfig.h:14-52."""
    lr: float = 3e-4
    batch_size: int = 50_000
    epochs: int = 5
    use_kl_div: bool = False
    loss_scale: float = 500.0
    loss_exponent: float = 1.0


class TransferLearner:
    """Distillation step over collected (new_obs, old_obs) pairs.

    ``old_learner``/``old_params``: the frozen teacher (possibly different
    obs size / action count).  ``action_map``: optional (num_new_actions,)
    index map from new action indices into the old policy's action space
    (gathered per sample; reference PPOLearner.cpp:598-599).
    """

    def __init__(self, learner: PPOLearner, old_learner: PPOLearner,
                 config: TransferLearnConfig = TransferLearnConfig()):
        self.learner = learner
        self.old_learner = old_learner
        self.config = config
        self._tx = optax.chain(optax.clip_by_global_norm(0.5),
                               optax.adam(config.lr))
        self._update = jax.jit(self._update_impl)

    def init_opt(self, params: PPOParams):
        trainable = {"policy": params.policy}
        if self.learner.has_shared:
            trainable["shared_head"] = params.shared_head
        return self._tx.init(trainable)

    def _distill_loss(self, trainable, params: PPOParams, old_probs,
                      new_obs, new_masks):
        cfg = self.config
        params = params.replace(policy=trainable["policy"],
                                shared_head=trainable.get(
                                    "shared_head", params.shared_head))
        new_probs = self.learner.policy_probs(params, new_obs, new_masks,
                                              half=False)
        if cfg.use_kl_div:
            loss = jnp.abs(old_probs * jnp.log(old_probs / new_probs))
        else:
            loss = jnp.abs(old_probs - new_probs)
        loss = jnp.mean(loss ** cfg.loss_exponent) * cfg.loss_scale
        acc = jnp.mean((jnp.argmax(new_probs, -1)
                        == jnp.argmax(old_probs, -1)).astype(jnp.float32))
        return loss, acc

    def _update_impl(self, params: PPOParams, opt_state, old_params,
                     new_obs, old_obs, new_masks, old_masks,
                     action_map=None):
        cfg = self.config

        old_probs = jax.lax.stop_gradient(self.old_learner.policy_probs(
            old_params, old_obs, old_masks, half=False))
        if action_map is not None:
            # old prob of each new action index (gather)
            old_probs = old_probs[..., action_map]

        trainable = {"policy": params.policy}
        if self.learner.has_shared:
            trainable["shared_head"] = params.shared_head

        metrics = {}
        for epoch in range(cfg.epochs):
            (loss, acc), grads = jax.value_and_grad(
                self._distill_loss, has_aux=True)(
                trainable, params, old_probs, new_obs, new_masks)
            updates, opt_state = self._tx.update(grads, opt_state, trainable)
            trainable = optax.apply_updates(trainable, updates)
            if epoch == 0:
                metrics["transfer_learn_loss"] = loss
                metrics["transfer_learn_accuracy"] = acc

        params = params.replace(
            policy=trainable["policy"],
            shared_head=trainable.get("shared_head", params.shared_head))
        return params, opt_state, metrics

    def update(self, params, opt_state, old_params, new_obs, old_obs,
               new_masks, old_masks, action_map=None):
        return self._update(params, opt_state, old_params, new_obs,
                            old_obs, new_masks, old_masks, action_map)

    # ------------------------------------------------------------------
    def run(self, env, params: PPOParams, old_params: PPOParams,
            old_obs_builder, iterations: int, key,
            old_action_parser=None, action_map=None, log_fn=None):
        """The StartTransferLearn equivalent (reference:
        Learner.cpp:299-480): step the envs with the NEW policy while
        building observations through BOTH obs builders on the same game
        states, then distill per collected batch.

        ``old_obs_builder``: builder producing the teacher's obs layout;
        ``old_action_parser``: supplies the teacher's action mask (defaults
        to the env's).  Returns (params, final metrics).
        """
        learner = self.learner
        n_players = env.config.num_envs * env.config.cars_per_arena
        steps = max(self.config.batch_size // n_players, 1)
        teams = env.teams

        def collect(carry, _):
            states, obs, masks, key = carry
            key, ksample = jax.random.split(key)
            flat_obs = obs.reshape(-1, obs.shape[-1])
            flat_masks = masks.reshape(-1, masks.shape[-1])
            actions, _ = learner.sample_actions(params_cur, flat_obs,
                                                flat_masks, ksample)
            # teacher-side obs/mask from the SAME state
            arena = states.phys.arena
            old_obs = jax.vmap(
                lambda cars, ball, pads, prev: old_obs_builder.build(
                    cars, ball, pads, prev, teams))(
                arena.cars, arena.ball, arena.pads, states.prev_actions)
            if old_action_parser is not None:
                old_masks = jax.vmap(
                    lambda cars: old_action_parser.action_mask(cars))(
                    arena.cars)
            else:
                old_masks = masks
            states, out = env.step(states,
                                   actions.reshape(obs.shape[:-1]))
            data = (obs, masks, old_obs, old_masks)
            return (states, out.obs, out.action_mask, key), data

        opt_state = self.init_opt(params)
        key, kreset = jax.random.split(key)
        states, obs, masks = env.reset(kreset)
        metrics = {}
        for it in range(iterations):
            params_cur = params
            (states, obs, masks, key), batch = jax.lax.scan(
                collect, (states, obs, masks, key), None, length=steps)
            new_obs, new_masks, old_obs, old_masks = (
                x.reshape((-1,) + x.shape[3:]) for x in batch)
            params, opt_state, metrics = self.update(
                params, opt_state, old_params, new_obs, old_obs,
                new_masks, old_masks, action_map)
            if log_fn is not None:
                log_fn(it, {k: float(v) for k, v in metrics.items()})
        return params, metrics
