"""Welford running statistics, device-resident.

Reference: GigaLearnCPP/Util/WelfordStat.h — a scalar running STD for
return standardization (:7-67) and a batched per-feature version for obs
standardization (:69-243).  Both live as small pytrees updated inside jit
and serialized into RUNNING_STATS.json-equivalent checkpoint metadata.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class WelfordState:
    count: jnp.ndarray      # ()
    mean: jnp.ndarray       # () or (D,)
    m2: jnp.ndarray         # () or (D,)

    @staticmethod
    def make(shape=()):
        return WelfordState(count=jnp.zeros(()),
                            mean=jnp.zeros(shape),
                            m2=jnp.zeros(shape))

    @property
    def variance(self):
        return jnp.where(self.count > 1, self.m2 / jnp.maximum(
            self.count, 1.0), jnp.ones_like(self.m2))

    @property
    def std(self):
        return jnp.sqrt(jnp.maximum(self.variance, 1e-12))


def update_batch(state: WelfordState, x: jnp.ndarray) -> WelfordState:
    """Merge a batch of samples (leading axis = samples; trailing dims must
    match state.mean shape) via the parallel Welford/Chan update."""
    x = x.reshape((-1,) + state.mean.shape)
    n_b = jnp.asarray(x.shape[0], jnp.float32)
    mean_b = jnp.mean(x, axis=0)
    m2_b = jnp.sum((x - mean_b) ** 2, axis=0)

    n_a = state.count
    n = n_a + n_b
    delta = mean_b - state.mean
    mean = state.mean + delta * (n_b / jnp.maximum(n, 1.0))
    m2 = state.m2 + m2_b + delta ** 2 * (n_a * n_b / jnp.maximum(n, 1.0))
    return WelfordState(count=n, mean=mean, m2=m2)


def standardize_obs(state: WelfordState, obs: jnp.ndarray,
                    min_std: float = 0.1,
                    max_mean_range: float = 3.0) -> jnp.ndarray:
    """Reference in-place obs standardization (WelfordStat.h:132-215):
    clamp mean to +-max_mean_range, lower-bound STD by min_std."""
    mean = jnp.clip(state.mean, -max_mean_range, max_mean_range)
    std = jnp.maximum(state.std, min_std)
    return (obs - mean) / std
