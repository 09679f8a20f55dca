"""Welford running stats vs numpy (reference: Util/WelfordStat.h)."""

import jax.numpy as jnp
import numpy as np

from reinforcement_learning_tpu.learn import welford


def test_scalar_running_std():
    rng = np.random.RandomState(0)
    data = rng.randn(1000).astype(np.float32) * 3 + 2
    st = welford.WelfordState.make(())
    for chunk in np.split(data, 10):
        st = welford.update_batch(st, jnp.asarray(chunk))
    assert abs(float(st.mean) - data.mean()) < 1e-3
    assert abs(float(st.std) - data.std()) < 1e-2


def test_per_feature_stats_and_standardize():
    rng = np.random.RandomState(1)
    data = rng.randn(500, 4).astype(np.float32) * np.array([1, 5, 0.01, 2])
    st = welford.WelfordState.make((4,))
    st = welford.update_batch(st, jnp.asarray(data))
    np.testing.assert_allclose(np.asarray(st.mean), data.mean(0), atol=1e-3)
    np.testing.assert_allclose(np.asarray(st.std), data.std(0), rtol=1e-2)

    out = np.asarray(welford.standardize_obs(st, jnp.asarray(data),
                                             min_std=0.1))
    # feature 2 has tiny std -> clamped to 0.1, so its output std << 1
    assert out[:, 0].std() < 1.5
    assert out[:, 2].std() < 0.2
