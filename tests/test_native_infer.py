"""Native C++ inference runtime vs the JAX forward pass
(deploy/native/mlp_infer.cpp must reproduce models/mlp.py exactly)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reinforcement_learning_tpu.deploy import native
from reinforcement_learning_tpu.learn.ppo import PPOConfig, PPOLearner


@pytest.fixture(scope="module")
def setup():
    cfg = PPOConfig(policy_layers=(32, 32), critic_layers=(16,),
                    shared_head_layers=(24,), half_precision=False)
    learner = PPOLearner(20, 10, cfg)
    params = learner.init(jax.random.PRNGKey(0)).params
    pol = native.NativePolicy.from_params(params, 20, 10)
    return learner, params, pol


def test_logits_match_jax(setup):
    learner, params, pol = setup
    rng = np.random.RandomState(0)
    obs = rng.randn(16, 20).astype(np.float32)

    native_logits = pol.logits(obs)

    from reinforcement_learning_tpu.models import mlp
    feat = mlp.apply_mlp(params.shared_head, learner.shared_cfg,
                         jnp.asarray(obs), False)
    jax_logits = np.asarray(mlp.apply_mlp(params.policy, learner.policy_cfg,
                                          feat, False))
    np.testing.assert_allclose(native_logits, jax_logits, rtol=2e-4,
                               atol=2e-5)


def test_deterministic_actions_match(setup):
    learner, params, pol = setup
    rng = np.random.RandomState(1)
    obs = rng.randn(32, 20).astype(np.float32)
    masks = rng.rand(32, 10) > 0.3
    masks[:, 0] = True  # at least one legal action

    native_actions = pol.infer(obs, masks, deterministic=True)
    jax_actions, _ = learner.sample_actions(
        params, jnp.asarray(obs), jnp.asarray(masks), jax.random.PRNGKey(0),
        deterministic=True)
    np.testing.assert_array_equal(native_actions, np.asarray(jax_actions))


def test_masked_sampling_legal(setup):
    _, _, pol = setup
    rng = np.random.RandomState(2)
    obs = rng.randn(64, 20).astype(np.float32)
    masks = np.zeros((64, 10), bool)
    masks[:, 3] = True
    masks[:, 7] = True
    actions = pol.infer(obs, masks, deterministic=False, seed=42)
    assert set(np.unique(actions)).issubset({3, 7})
