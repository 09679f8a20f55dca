"""PPO learner: masked discrete policy + clipped surrogate update.

Faithful re-derivation of the reference PPO (reference:
GigaLearnCPP/PPO/PPOLearner.cpp):

  * masked softmax with disabled-logit -1e10, min prob 1e-11, temperature
    (:78-114)
  * entropy normalized by log(num actions) (or log(valid actions) when
    mask_entropy) (:253-276)
  * clip-surrogate loss, normalized entropy bonus, MSE critic loss,
    per-model grad-norm clip 0.5, Adam/AdamW/MagSGD optimizers (:278-581)
  * advantage normalization per batch (:363-370)
  * KL / clip-fraction / ratio diagnostics accumulated on device (:481-490)

The whole update runs as one jitted function: epochs x shuffled batches as
a ``lax.scan`` over gathered minibatches.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from reinforcement_learning_tpu.models import mlp

ACTION_MIN_PROB = 1e-11
ACTION_DISABLED_LOGIT = -1e10


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    """Mirror of PPOLearnerConfig (reference: PPO/PPOLearnerConfig.h)."""
    ts_per_itr: int = 50_000
    batch_size: int = 50_000
    mini_batch_size: int = 0       # 0 => batch_size
    overbatching: bool = True
    max_episode_duration: float = 120.0
    deterministic: bool = False
    half_precision: bool = True

    policy_layers: tuple = (256, 256, 256)
    critic_layers: tuple = (256, 256, 256)
    shared_head_layers: tuple = (256,)   # () => no shared head
    activation: str = "relu"
    layer_norm: bool = True
    optim: str = "adam"   # adam | adamw | adagrad | rmsprop | magsgd
                          # (reference enum set, ModelConfig.h:6-43)

    epochs: int = 2
    policy_lr: float = 3e-4
    critic_lr: float = 3e-4
    entropy_scale: float = 0.018
    mask_entropy: bool = False
    clip_range: float = 0.2
    policy_temperature: float = 1.0
    gae_lambda: float = 0.95
    gae_gamma: float = 0.99
    reward_clip_range: float = 200.0
    guiding_strength: float = 0.0  # > 0 enables guiding policy loss


@struct.dataclass
class PPOParams:
    shared_head: Any   # None or mlp params
    policy: Any
    critic: Any


@struct.dataclass
class PPOTrainState:
    params: PPOParams
    opt_state_policy: Any
    opt_state_critic: Any
    opt_state_shared: Any


class PPOLearner:
    """Holds static config + model cfgs; all state lives in PPOTrainState."""

    def __init__(self, obs_size: int, num_actions: int, config: PPOConfig):
        self.config = config
        self.obs_size = obs_size
        self.num_actions = num_actions

        has_shared = len(config.shared_head_layers) > 0
        self.has_shared = has_shared
        feat = (config.shared_head_layers[-1] if has_shared else obs_size)
        self.shared_cfg = mlp.MLPConfig(
            num_inputs=obs_size, layer_sizes=tuple(config.shared_head_layers),
            num_outputs=0, activation=config.activation,
            layer_norm=config.layer_norm, add_output_layer=False) \
            if has_shared else None
        self.policy_cfg = mlp.MLPConfig(
            num_inputs=feat, layer_sizes=tuple(config.policy_layers),
            num_outputs=num_actions, activation=config.activation,
            layer_norm=config.layer_norm)
        self.critic_cfg = mlp.MLPConfig(
            num_inputs=feat, layer_sizes=tuple(config.critic_layers),
            num_outputs=1, activation=config.activation,
            layer_norm=config.layer_norm)

        self._tx_policy = self._make_optim(config.policy_lr)
        self._tx_critic = self._make_optim(config.critic_lr)
        self._tx_shared = self._make_optim(config.policy_lr)

    def _make_optim(self, lr: float):
        clip = optax.clip_by_global_norm(0.5)
        if self.config.optim == "adam":
            base = optax.adam(lr)
        elif self.config.optim == "adamw":
            base = optax.adamw(lr)
        elif self.config.optim == "adagrad":
            base = optax.adagrad(lr)
        elif self.config.optim == "rmsprop":
            base = optax.rmsprop(lr)
        elif self.config.optim == "magsgd":
            base = mag_sgd(lr)
        else:
            raise ValueError(self.config.optim)
        return optax.chain(clip, base)

    def init(self, key) -> PPOTrainState:
        k1, k2, k3 = jax.random.split(key, 3)
        params = PPOParams(
            shared_head=(mlp.init_mlp(k1, self.shared_cfg)
                         if self.has_shared else None),
            policy=mlp.init_mlp(k2, self.policy_cfg),
            critic=mlp.init_mlp(k3, self.critic_cfg))
        return PPOTrainState(
            params=params,
            opt_state_policy=self._tx_policy.init(params.policy),
            opt_state_critic=self._tx_critic.init(params.critic),
            opt_state_shared=(self._tx_shared.init(params.shared_head)
                              if self.has_shared else None))

    def param_counts(self) -> dict:
        dummy = self.init(jax.random.PRNGKey(0)).params
        out = {"policy": mlp.param_count(dummy.policy),
               "critic": mlp.param_count(dummy.critic)}
        if self.has_shared:
            out["shared_head"] = mlp.param_count(dummy.shared_head)
        out["total"] = sum(out.values())
        return out

    # --- inference --------------------------------------------------------

    def _features(self, params: PPOParams, obs, half=None):
        half = self.config.half_precision if half is None else half
        if self.has_shared:
            return mlp.apply_mlp(params.shared_head, self.shared_cfg, obs,
                                 half)
        return obs

    def policy_probs(self, params: PPOParams, obs, action_masks,
                     half=None):
        """Masked softmax action probabilities
        (PPOLearner.cpp:78-114)."""
        half = self.config.half_precision if half is None else half
        feat = self._features(params, obs, half)
        logits = mlp.apply_mlp(params.policy, self.policy_cfg, feat, half)
        if self.config.policy_temperature != 1.0:
            logits = logits / self.config.policy_temperature
        logits = logits + ACTION_DISABLED_LOGIT * (~action_masks)
        probs = jax.nn.softmax(logits, axis=-1)
        return jnp.clip(probs, ACTION_MIN_PROB, 1.0)

    def sample_actions(self, params: PPOParams, obs, action_masks, key,
                       deterministic=False):
        """Returns (actions, log_probs) (PPOLearner.cpp:116-184)."""
        probs = self.policy_probs(params, obs, action_masks)
        if deterministic:
            actions = jnp.argmax(probs, axis=-1)
            return actions, jnp.log(
                jnp.take_along_axis(probs, actions[..., None],
                                    axis=-1))[..., 0]
        actions = jax.random.categorical(key, jnp.log(probs), axis=-1)
        logp = jnp.log(jnp.take_along_axis(probs, actions[..., None],
                                           axis=-1))[..., 0]
        return actions, logp

    def values(self, params: PPOParams, obs, half=None):
        feat = self._features(params, obs, half)
        return mlp.apply_mlp(params.critic, self.critic_cfg, feat,
                             half if half is not None
                             else self.config.half_precision)[..., 0]

    def _entropy(self, probs, action_masks):
        """Normalized entropy (PPOLearner.cpp:253-276)."""
        ent = -jnp.sum(jnp.log(probs) * probs, axis=-1)
        if self.config.mask_entropy:
            valid = jnp.sum(action_masks.astype(jnp.float32), axis=-1)
            return ent / jnp.log(jnp.maximum(valid, 2.0))
        return ent / jnp.log(float(self.num_actions))

    # --- update -----------------------------------------------------------

    def _loss(self, params: PPOParams, batch, guiding_params=None):
        cfg = self.config
        obs = batch["obs"]
        # Optional per-sample weights: 0 excludes a row (used to drop
        # old-version opponent steps from self-play batches, mirroring the
        # reference's newPlayerIndices gather, Learner.cpp:733-778)
        w = batch.get("weight")
        if w is None:
            wmean = jnp.mean
        else:
            wsum = jnp.maximum(jnp.sum(w), 1.0)

            def wmean(x):
                return jnp.sum(x * w) / wsum
        # Training forward passes run fp32 (reference trains fp32, infers
        # bf16 — PPOLearner.cpp:401 'false')
        feat = self._features(params, obs, half=False)
        logits = mlp.apply_mlp(params.policy, self.policy_cfg, feat, False)
        if cfg.policy_temperature != 1.0:
            logits = logits / cfg.policy_temperature
        logits = logits + ACTION_DISABLED_LOGIT * (~batch["mask"])
        probs = jnp.clip(jax.nn.softmax(logits, axis=-1), ACTION_MIN_PROB,
                         1.0)
        logp = jnp.log(jnp.take_along_axis(
            probs, batch["action"][..., None], axis=-1))[..., 0]

        entropy = wmean(self._entropy(probs, batch["mask"]))

        log_ratio = logp - batch["old_logp"]
        ratio = jnp.exp(log_ratio)
        clipped = jnp.clip(ratio, 1.0 - cfg.clip_range, 1.0 + cfg.clip_range)
        adv = batch["advantage"]
        policy_loss = -wmean(jnp.minimum(ratio * adv, clipped * adv))

        ppo_loss = policy_loss - entropy * cfg.entropy_scale

        guiding_loss = jnp.zeros(())
        if guiding_params is not None and cfg.guiding_strength > 0:
            gprobs = jax.lax.stop_gradient(self.policy_probs(
                guiding_params, obs, batch["mask"]))
            guiding_loss = wmean(jnp.mean(jnp.abs(gprobs - probs),
                                         axis=-1))
            ppo_loss = ppo_loss + guiding_loss * cfg.guiding_strength

        vals = mlp.apply_mlp(params.critic, self.critic_cfg, feat,
                             False)[..., 0]
        critic_loss = wmean((vals - batch["target_value"]) ** 2)

        total = ppo_loss + critic_loss

        kl = wmean(jnp.exp(log_ratio) - 1.0 - log_ratio)
        clip_frac = wmean(
            (jnp.abs(ratio - 1.0) > cfg.clip_range).astype(jnp.float32))
        aux = dict(entropy=entropy, policy_loss=policy_loss,
                   critic_loss=critic_loss, kl=kl, clip_fraction=clip_frac,
                   ratio=wmean(ratio), guiding_loss=guiding_loss)
        return total, aux

    def update(self, state: PPOTrainState, data: dict, key,
               guiding_params=None):
        """One PPO learn phase (PPOLearner::Learn, :278-581).

        data: dict of flat (B, ...) arrays: obs, mask, action, old_logp,
        advantage, target_value.  B should be a multiple of batch_size
        (the env-step grid makes this natural); each batch gets advantage
        normalization and one optimizer step.
        """
        cfg = self.config
        total = data["obs"].shape[0]
        # Even-split batching: no experience is dropped to batch-size
        # rounding, the same goal as the reference's overbatching
        # (ExperienceBuffer.h:41-116, PPOLearnerConfig.h overbatching).
        num_batches = max(total // max(cfg.batch_size, 1), 1)
        batch_size = total // num_batches
        used = num_batches * batch_size

        def epoch_body(carry, epoch_key):
            st = carry
            perm = jax.random.permutation(epoch_key, total)[:used]
            perm = perm.reshape(num_batches, batch_size)

            def batch_body(st, idx):
                batch = {k: v[idx] for k, v in data.items()}
                adv = batch["advantage"]
                adv = (adv - jnp.mean(adv)) / (jnp.std(adv) + 1e-8)
                batch["advantage"] = adv

                grads, aux = jax.grad(self._loss, has_aux=True)(
                    st.params, batch, guiding_params)

                up_p, os_p = self._tx_policy.update(
                    grads.policy, st.opt_state_policy, st.params.policy)
                up_c, os_c = self._tx_critic.update(
                    grads.critic, st.opt_state_critic, st.params.critic)
                new_params = PPOParams(
                    shared_head=st.params.shared_head,
                    policy=optax.apply_updates(st.params.policy, up_p),
                    critic=optax.apply_updates(st.params.critic, up_c))
                os_s = st.opt_state_shared
                if self.has_shared:
                    up_s, os_s = self._tx_shared.update(
                        grads.shared_head, st.opt_state_shared,
                        st.params.shared_head)
                    new_params = new_params.replace(
                        shared_head=optax.apply_updates(
                            st.params.shared_head, up_s))
                return PPOTrainState(new_params, os_p, os_c, os_s), aux

            st, auxes = jax.lax.scan(batch_body, st, perm)
            return st, auxes

        epoch_keys = jax.random.split(key, cfg.epochs)
        state, auxes = jax.lax.scan(epoch_body, state, epoch_keys)
        metrics = {k: jnp.mean(v) for k, v in auxes.items()}
        return state, metrics


def mag_sgd(lr: float):
    """MagSGD (reference: Util/MagSGD.h:11-48): normalize the global grad
    to unit magnitude, then SGD — LR is a fixed update magnitude."""
    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        g_norm = optax.global_norm(updates)
        scale = -lr / jnp.maximum(g_norm, 1e-12)
        return jax.tree.map(lambda g: g * scale, updates), state

    return optax.GradientTransformation(init_fn, update_fn)
