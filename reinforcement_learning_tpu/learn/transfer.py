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
