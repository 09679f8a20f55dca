"""Checkpoint save / load / retention.

Reference behavior (Learner.cpp:224-279): folder-per-timestep under the
checkpoint folder, model weights + optimizer states + a RUNNING_STATS.json
sidecar (total timesteps, iterations, return/obs Welford stats, skill
ratings); keep the newest ``checkpoints_to_keep``; auto-resume from the
highest-numbered folder.

Storage is orbax (one train-state pytree) + the same JSON sidecar.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any

import jax
import numpy as np


def _numbered_dirs(folder: str) -> list[int]:
    """Reference Utils::FindNumberedDirs (Util/Utils.h:27)."""
    if not os.path.isdir(folder):
        return []
    out = []
    for name in os.listdir(folder):
        if name.isdigit() and os.path.isdir(os.path.join(folder, name)):
            out.append(int(name))
    return sorted(out)


def save_checkpoint(folder: str, state, extra_stats: dict | None = None,
                    keep: int = 8) -> str:
    """Save ``state`` (a TrainState pytree) under folder/<total_timesteps>/.

    Returns the checkpoint path."""
    import orbax.checkpoint as ocp

    ts = int(jax.device_get(state.total_timesteps))
    path = os.path.abspath(os.path.join(folder, str(ts)))
    os.makedirs(folder, exist_ok=True)
    if os.path.exists(path):
        shutil.rmtree(path)

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.join(path, "state"), jax.device_get(state))

    stats = {
        "total_timesteps": ts,
        "iterations": int(jax.device_get(state.iterations)),
        "return_stat": {
            "count": float(jax.device_get(state.return_stat.count)),
            "mean": float(jax.device_get(state.return_stat.mean)),
            "m2": float(jax.device_get(state.return_stat.m2)),
        },
    }
    if extra_stats:
        stats.update(extra_stats)
    with open(os.path.join(path, "RUNNING_STATS.json"), "w") as f:
        json.dump(stats, f, indent=1)

    # Retention (Learner.cpp:236-251)
    if keep > 0:
        existing = _numbered_dirs(folder)
        for old in existing[:-keep]:
            shutil.rmtree(os.path.join(folder, str(old)),
                          ignore_errors=True)
    return path


def latest_checkpoint(folder: str) -> str | None:
    nums = _numbered_dirs(folder)
    if not nums:
        return None
    return os.path.join(folder, str(nums[-1]))


def load_checkpoint(path: str, template_state):
    """Restore a TrainState saved by save_checkpoint; ``template_state`` is
    an abstract/concrete pytree with the target structure."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(
            os.path.join(os.path.abspath(path), "state"),
            jax.tree.map(ocp.utils.to_shape_dtype_struct,
                         jax.device_get(template_state)))
    return restored


def load_latest(folder: str, template_state):
    """Auto-resume (Learner.cpp:259-279): newest checkpoint or None."""
    path = latest_checkpoint(folder)
    if path is None:
        return None, None
    state = load_checkpoint(path, template_state)
    with open(os.path.join(path, "RUNNING_STATS.json")) as f:
        stats = json.load(f)
    return state, stats


# ---------------------------------------------------------------------------
# Env-state snapshots (the reference's binary arena serialization,
# Arena::Serialize/DeserializeNew Arena.h:114-117 + DataStream/): here any
# env/physics pytree round-trips through one flat .npz.

def save_env_state(path: str, state) -> None:
    """Snapshot an env/arena state pytree (any nesting of arrays) to
    ``path`` (.npz)."""
    leaves, treedef = jax.tree_util.tree_flatten(jax.device_get(state))
    np.savez_compressed(path, __treedef__=np.frombuffer(
        repr(treedef).encode(), dtype=np.uint8),
        **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)})


def load_env_state(path: str, template_state):
    """Restore a snapshot saved by ``save_env_state``; ``template_state``
    supplies the pytree structure (shapes/dtypes are taken from the
    file)."""
    data = np.load(path)
    treedef = jax.tree_util.tree_structure(template_state)
    leaves = [data[f"leaf_{i}"] for i in range(treedef.num_leaves)]
    return jax.tree_util.tree_unflatten(treedef, leaves)
