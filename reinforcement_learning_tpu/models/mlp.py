"""MLP models as pure parameter pytrees.

Re-design of the reference model builder (reference:
GigaLearnCPP/Util/Models.cpp:7-34): a stack of Linear layers each followed
by optional LayerNorm and an activation, plus an optional linear output
layer.  Initialization matches torch's Linear default (kaiming-uniform
with a = sqrt(5), i.e. U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both weight
and bias) so learning dynamics are comparable.

bf16 inference (reference useHalfPrecision, Models.cpp:42-65) is a dtype
cast at apply time — no shadow networks needed on TPU.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class MLPConfig:
    """Mirror of ModelConfig (reference: Util/ModelConfig.h:6-43)."""
    num_inputs: int
    layer_sizes: tuple
    num_outputs: int = 0          # 0 => no output layer
    activation: str = "relu"      # relu | leaky_relu | sigmoid | tanh
    layer_norm: bool = True
    add_output_layer: bool = True


_ACTIVATIONS = {
    "relu": jax.nn.relu,
    "leaky_relu": lambda x: jax.nn.leaky_relu(x, 0.01),
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
}


def init_mlp(key, cfg: MLPConfig) -> dict:
    params = {"layers": []}
    sizes = [cfg.num_inputs] + list(cfg.layer_sizes)
    keys = jax.random.split(key, len(cfg.layer_sizes) + 1)
    for i, (fan_in, fan_out) in enumerate(zip(sizes[:-1], sizes[1:])):
        bound = 1.0 / np.sqrt(fan_in)
        kw, kb = jax.random.split(keys[i])
        layer = {
            "w": jax.random.uniform(kw, (fan_in, fan_out), jnp.float32,
                                    -bound, bound),
            "b": jax.random.uniform(kb, (fan_out,), jnp.float32,
                                    -bound, bound),
        }
        if cfg.layer_norm:
            layer["ln_scale"] = jnp.ones((fan_out,), jnp.float32)
            layer["ln_bias"] = jnp.zeros((fan_out,), jnp.float32)
        params["layers"].append(layer)
    if cfg.add_output_layer and cfg.num_outputs > 0:
        fan_in = sizes[-1]
        bound = 1.0 / np.sqrt(fan_in)
        kw, kb = jax.random.split(keys[-1])
        params["out"] = {
            "w": jax.random.uniform(kw, (fan_in, cfg.num_outputs),
                                    jnp.float32, -bound, bound),
            "b": jax.random.uniform(kb, (cfg.num_outputs,), jnp.float32,
                                    -bound, bound),
        }
    return params


def apply_mlp(params: dict, cfg: MLPConfig, x: jnp.ndarray,
              half_precision: bool = False) -> jnp.ndarray:
    """Forward pass.  With half_precision, compute hidden layers in
    bfloat16 (MXU-friendly) and return float32."""
    act = _ACTIVATIONS[cfg.activation]
    dtype = jnp.bfloat16 if half_precision else jnp.float32
    h = x.astype(dtype)
    for layer in params["layers"]:
        h = h @ layer["w"].astype(dtype) + layer["b"].astype(dtype)
        if cfg.layer_norm:
            h32 = h.astype(jnp.float32)
            mean = jnp.mean(h32, axis=-1, keepdims=True)
            var = jnp.var(h32, axis=-1, keepdims=True)
            h32 = (h32 - mean) * jax.lax.rsqrt(var + 1e-5)
            h32 = h32 * layer["ln_scale"] + layer["ln_bias"]
            h = h32.astype(dtype)
        h = act(h)
    if "out" in params:
        h = h @ params["out"]["w"].astype(dtype) \
            + params["out"]["b"].astype(dtype)
    return h.astype(jnp.float32)


def param_count(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
