"""Checkpoint save/load/retention + converter round-trip
(reference: Learner.cpp:224-279, tools/checkpoint_converter.py)."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reinforcement_learning_tpu.envs.env import EnvConfig, RocketLeagueEnv
from reinforcement_learning_tpu.learn.ppo import PPOConfig
from reinforcement_learning_tpu.learn.trainer import Trainer, TrainerConfig
from reinforcement_learning_tpu.utils import checkpoint as ckpt

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


@pytest.fixture(scope="module")
def trainer():
    env = RocketLeagueEnv(EnvConfig(num_envs=2, team_size=1))
    return Trainer(env, PPOConfig(policy_layers=(16, 16),
                                  critic_layers=(16,),
                                  shared_head_layers=(16,),
                                  batch_size=32, half_precision=False),
                   TrainerConfig(ts_per_itr=16))


def test_save_load_bit_identical(trainer, tmp_path):
    state = trainer.init(jax.random.PRNGKey(0))
    state = state.replace(total_timesteps=jnp.asarray(1000, jnp.int32))
    path = ckpt.save_checkpoint(str(tmp_path), state)
    assert os.path.basename(path) == "1000"
    assert os.path.exists(os.path.join(path, "RUNNING_STATS.json"))

    restored, stats = ckpt.load_latest(str(tmp_path), state)
    assert stats["total_timesteps"] == 1000
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_retention(trainer, tmp_path):
    state = trainer.init(jax.random.PRNGKey(0))
    for ts in (100, 200, 300, 400):
        st = state.replace(total_timesteps=jnp.asarray(ts, jnp.int32))
        ckpt.save_checkpoint(str(tmp_path), st, keep=2)
    dirs = ckpt._numbered_dirs(str(tmp_path))
    assert dirs == [300, 400]


def test_converter_roundtrip(trainer, tmp_path):
    import checkpoint_converter as conv

    state = trainer.init(jax.random.PRNGKey(1))
    path = ckpt.save_checkpoint(str(tmp_path / "ck"), state)

    torch_dir = str(tmp_path / "torch")
    conv.export_to_torch(path, torch_dir)
    assert os.path.exists(os.path.join(torch_dir, "PPO_POLICY.pt"))

    npz_path = str(tmp_path / "back.npz")
    conv.import_from_torch(torch_dir, npz_path)
    params = conv.load_npz_params(npz_path)

    orig = jax.device_get(state.ppo.params)
    for i, layer in enumerate(params["policy"]["layers"]):
        np.testing.assert_allclose(layer["w"],
                                   np.asarray(orig.policy["layers"][i]["w"]),
                                   atol=1e-6)
    np.testing.assert_allclose(params["policy"]["out"]["w"],
                               np.asarray(orig.policy["out"]["w"]),
                               atol=1e-6)


def test_env_state_snapshot_roundtrip(tmp_path):
    """Arena/env state serialization (the reference's Arena::Serialize
    equivalent, Arena.h:114-117): bit-exact npz round-trip."""
    import jax
    import numpy as np
    from reinforcement_learning_tpu.envs.env import (EnvConfig,
                                                     RocketLeagueEnv)
    from reinforcement_learning_tpu.utils import checkpoint as ckpt

    env = RocketLeagueEnv(EnvConfig(num_envs=2, team_size=1))
    states, _, _ = env.reset(jax.random.PRNGKey(7))
    p = str(tmp_path / "env_state.npz")
    ckpt.save_env_state(p, states)
    back = ckpt.load_env_state(p, states)
    for a, b in zip(jax.tree_util.tree_leaves(states),
                    jax.tree_util.tree_leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_lt_converter_roundtrip():
    """GigaLearnCPP .lt torchscript export/import (reference:
    Models.cpp:116-195 torch::save of nn::Sequential; the reference's own
    converter reads these with torch.jit.load): params -> .lt -> params is
    exact and the torchscript forward matches apply_mlp."""
    import tempfile

    import torch

    import checkpoint_converter as conv
    from reinforcement_learning_tpu.models.mlp import MLPConfig, apply_mlp

    rng = np.random.default_rng(11)

    def layer(fi, fo, ln=True):
        out = {"w": rng.normal(size=(fi, fo)).astype(np.float32),
               "b": rng.normal(size=fo).astype(np.float32)}
        if ln:
            out["ln_scale"] = rng.normal(size=fo).astype(np.float32)
            out["ln_bias"] = rng.normal(size=fo).astype(np.float32)
        return out

    params = {"layers": [layer(9, 24), layer(24, 24)],
              "out": {"w": rng.normal(size=(24, 6)).astype(np.float32),
                      "b": rng.normal(size=6).astype(np.float32)}}
    seq = conv._build_torch_sequential(params)
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "POLICY.lt")
        torch.jit.save(torch.jit.script(seq), path)
        loaded = torch.jit.load(path)
    back = conv._sequential_to_params(loaded)
    for a, b in zip(params["layers"], back["layers"]):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])
    np.testing.assert_array_equal(params["out"]["w"], back["out"]["w"])

    x = rng.normal(size=(4, 9)).astype(np.float32)
    ours = np.asarray(apply_mlp(params, MLPConfig(9, (24, 24), 6),
                                jnp.asarray(x)))
    theirs = loaded(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(ours, theirs, atol=3e-5)
