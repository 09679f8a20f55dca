"""GAE vs a straightforward NumPy oracle, including terminal/truncation
bootstrapping and reward normalization (reference: GAE.cpp:7-208)."""

import numpy as np

from reinforcement_learning_tpu.envs.terminals import (NORMAL, NOT_TERMINAL,
                                                       TRUNCATED)
from reinforcement_learning_tpu.learn.gae import compute_gae


def numpy_gae(rews, terms, vals, next_vals, gamma, lam, return_std,
              clip_range):
    """Direct transcription of the reference recurrence."""
    T = len(rews)
    norm = return_std not in (0.0, 1.0)
    used = rews / return_std if norm else rews.copy()
    if norm and clip_range > 0:
        used = np.clip(used, -clip_range, clip_range)

    advs = np.zeros(T)
    rets = np.zeros(T)
    prev_adv = 0.0
    prev_ret = 0.0
    for t in reversed(range(T)):
        if terms[t] == NORMAL:
            nv = 0.0
        else:
            nv = next_vals[t]
        not_done = 1.0 if terms[t] == NOT_TERMINAL else 0.0
        delta = used[t] + gamma * nv - vals[t]
        prev_adv = delta + gamma * lam * not_done * prev_adv
        advs[t] = prev_adv
        prev_ret = rews[t] + gamma * not_done * prev_ret
        rets[t] = prev_ret
    return advs, vals + advs, rets


def test_gae_matches_oracle():
    rng = np.random.RandomState(0)
    T = 40
    rews = rng.randn(T).astype(np.float32) * 2
    vals = rng.randn(T).astype(np.float32)
    next_vals = rng.randn(T).astype(np.float32)
    terms = np.zeros(T, np.int32)
    terms[10] = NORMAL
    terms[25] = TRUNCATED
    terms[39] = NORMAL

    for return_std in (1.0, 0.5):
        a, tv, r, _ = compute_gae(
            rews[:, None], terms[:, None], vals[:, None], next_vals[:, None],
            gamma=0.99, lam=0.95, return_std=return_std,
            reward_clip_range=200.0)
        a_np, tv_np, r_np = numpy_gae(rews, terms, vals, next_vals, 0.99,
                                      0.95, return_std, 200.0)
        np.testing.assert_allclose(np.asarray(a)[:, 0], a_np, rtol=2e-4,
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(tv)[:, 0], tv_np, rtol=2e-4,
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(r)[:, 0], r_np, rtol=2e-4,
                                   atol=1e-4)


def test_gae_truncation_bootstraps_value():
    """At a truncation the next value must feed the delta; at a normal
    terminal it must not."""
    T = 2
    rews = np.zeros((T, 1), np.float32)
    vals = np.zeros((T, 1), np.float32)
    next_vals = np.full((T, 1), 10.0, np.float32)

    terms_trunc = np.array([[TRUNCATED], [NOT_TERMINAL]], np.int32)
    a_trunc, *_ = compute_gae(rews, terms_trunc, vals, next_vals,
                              gamma=0.9, lam=1.0, return_std=None)
    assert abs(float(a_trunc[0, 0]) - 9.0) < 1e-5

    terms_norm = np.array([[NORMAL], [NOT_TERMINAL]], np.int32)
    a_norm, *_ = compute_gae(rews, terms_norm, vals, next_vals,
                             gamma=0.9, lam=1.0, return_std=None)
    assert abs(float(a_norm[0, 0])) < 1e-6


def test_reward_clipping_portion():
    rews = np.array([[100.0], [0.1]], np.float32)
    terms = np.zeros((2, 1), np.int32)
    vals = np.zeros((2, 1), np.float32)
    nv = np.zeros((2, 1), np.float32)
    _, _, _, clip_portion = compute_gae(rews, terms, vals, nv,
                                        return_std=0.5,
                                        reward_clip_range=10.0)
    # normalized rewards: 200, 0.2 -> clipped to 10, 0.2
    expected = (200.2 - 10.2) / 200.2
    assert abs(float(clip_portion) - expected) < 1e-4
