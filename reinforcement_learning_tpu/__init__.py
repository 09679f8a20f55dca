"""reinforcement_learning_tpu: a TPU-native Rocket League RL framework.

From-scratch JAX/XLA re-design of the capabilities of the reference stack
(RocketSim + RLGymCPP + GigaLearnCPP): batched on-device physics, vectorized
gym envs, and a fused PPO actor-learner.
"""

import os as _os

__version__ = "0.1.0"


def _enable_compilation_cache():
    """Persist compiled XLA programs across processes.  The training
    programs are large and (on remote-compile TPU backends) expensive to
    build; caching cuts warmup from minutes to seconds."""
    try:
        import jax
        if jax.config.jax_compilation_cache_dir is None:
            cache_dir = _os.environ.get(
                "RLT_COMPILATION_CACHE",
                _os.path.expanduser("~/.cache/rlt_jax_cache"))
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              1.0)
    except Exception:
        pass


_enable_compilation_cache()
