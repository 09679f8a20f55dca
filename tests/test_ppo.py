"""PPO learner unit tests: masked softmax, entropy normalization, MagSGD,
and a tiny contextual-bandit learning check (reference semantics:
PPOLearner.cpp:78-276, MagSGD.h:11-48)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from reinforcement_learning_tpu.learn.ppo import (PPOConfig, PPOLearner,
                                                  mag_sgd)


def make_learner(num_actions=8, obs=6, shared=True, lr=3e-4):
    cfg = PPOConfig(policy_layers=(16, 16), critic_layers=(16, 16),
                    shared_head_layers=(16,) if shared else (),
                    batch_size=256, epochs=2, half_precision=False,
                    entropy_scale=0.0, policy_lr=lr, critic_lr=lr)
    return PPOLearner(obs, num_actions, cfg)


def test_masked_probs():
    learner = make_learner()
    state = learner.init(jax.random.PRNGKey(0))
    obs = jnp.zeros((4, 6))
    masks = jnp.ones((4, 8), bool).at[:, :4].set(False)
    probs = learner.policy_probs(state.params, obs, masks)
    p = np.asarray(probs)
    assert p.shape == (4, 8)
    # disabled actions get (essentially) zero probability
    assert np.all(p[:, :4] <= 1.1e-11)
    np.testing.assert_allclose(p[:, 4:].sum(-1), 1.0, atol=1e-5)


def test_sampling_respects_mask():
    learner = make_learner()
    state = learner.init(jax.random.PRNGKey(0))
    obs = jnp.zeros((256, 6))
    masks = jnp.ones((256, 8), bool).at[:, :6].set(False)
    actions, logp = learner.sample_actions(state.params, obs, masks,
                                           jax.random.PRNGKey(1))
    a = np.asarray(actions)
    assert np.all(a >= 6)
    assert np.all(np.isfinite(np.asarray(logp)))


def test_entropy_normalization():
    learner = make_learner()
    # uniform over all 8 actions -> normalized entropy 1
    probs = jnp.full((2, 8), 1.0 / 8)
    masks = jnp.ones((2, 8), bool)
    ent = learner._entropy(probs, masks)
    np.testing.assert_allclose(np.asarray(ent), 1.0, atol=1e-5)


def test_mag_sgd_update_magnitude():
    tx = mag_sgd(0.01)
    params = {"a": jnp.ones((3, 3)), "b": jnp.ones((5,))}
    grads = {"a": jnp.full((3, 3), 2.0), "b": jnp.full((5,), -1.0)}
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)
    norm = float(optax.global_norm(updates))
    assert abs(norm - 0.01) < 1e-6
    # direction opposite to gradient
    assert float(updates["a"][0, 0]) < 0


def test_ppo_learns_contextual_bandit():
    """One-step bandit: action == argmax(obs) gives reward 1; PPO should
    sharply increase that action's probability."""
    learner = make_learner(num_actions=4, obs=4, shared=False, lr=3e-3)
    state = learner.init(jax.random.PRNGKey(0))

    rng = np.random.RandomState(0)
    B = 512
    obs = jnp.asarray(rng.randn(B, 4).astype(np.float32))
    best = jnp.argmax(obs, axis=-1)
    masks = jnp.ones((B, 4), bool)

    key = jax.random.PRNGKey(1)
    update = jax.jit(lambda st, data, k: learner.update(st, data, k))

    for i in range(25):
        key, k1, k2 = jax.random.split(key, 3)
        actions, logp = learner.sample_actions(state.params, obs, masks, k1)
        reward = (actions == best).astype(jnp.float32)
        # advantage = reward - mean (simple baseline), target value = reward
        adv = reward - jnp.mean(reward)
        data = dict(obs=obs, mask=masks, action=actions, old_logp=logp,
                    advantage=adv, target_value=reward)
        state, metrics = update(state, data, k2)

    probs = learner.policy_probs(state.params, obs, masks)
    p_best = np.asarray(jnp.take_along_axis(probs, best[:, None], 1))[:, 0]
    assert p_best.mean() > 0.6, p_best.mean()
