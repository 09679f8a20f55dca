"""reinforcement_learning_tpu: a TPU-native Rocket League RL framework.

From-scratch JAX/XLA re-design of the capabilities of the reference stack
(RocketSim + RLGymCPP + GigaLearnCPP): batched on-device physics, vectorized
gym envs, and a fused PPO actor-learner.
"""

__version__ = "0.1.0"
