"""Checkpoint converter: our JAX pytree checkpoints <-> torch state dicts.

The ecosystem interop point (reference: tools/checkpoint_converter.py,
which bridges GigaLearn ``.lt`` torchscript and rlgym-ppo ``.pt`` state
dicts).  This tool bridges the same two formats from our side:

  to_torch   <checkpoint dir>  -> PPO_POLICY.pt / PPO_VALUE_NET.pt state
                                  dicts in the rlgym-ppo naming scheme
                                  ("model.<idx>.weight"/".bias")
  from_torch <torch dir>       -> a params .npz importable by
                                  reinforcement_learning_tpu

Notes:
  * rlgym-ppo's DiscreteFF/ValueEstimator are plain Linear+ReLU stacks; a
    shared-head model is flattened by exporting head+policy (and
    head+critic) as one sequential stack only when layer norm is disabled.
    With layer norm, LN parameters are exported as
    "model.<idx>.ln_scale/ln_bias" (our own extension).
  * torch Linear stores weight as (out, in): transposed from ours.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _flatten_mlp_to_torch(params: dict, prefix: str = "model") -> dict:
    """Our MLP params -> rlgym-ppo-style ordered state dict (numpy)."""
    out = {}
    idx = 0
    for layer in params["layers"]:
        out[f"{prefix}.{idx}.weight"] = np.asarray(layer["w"]).T
        out[f"{prefix}.{idx}.bias"] = np.asarray(layer["b"])
        if "ln_scale" in layer:
            out[f"{prefix}.{idx}.ln_scale"] = np.asarray(layer["ln_scale"])
            out[f"{prefix}.{idx}.ln_bias"] = np.asarray(layer["ln_bias"])
        idx += 2  # Linear + activation, matching nn.Sequential indexing
    if "out" in params:
        out[f"{prefix}.{idx}.weight"] = np.asarray(params["out"]["w"]).T
        out[f"{prefix}.{idx}.bias"] = np.asarray(params["out"]["b"])
    return out


def _torch_to_mlp(state_dict: dict) -> dict:
    """Inverse of _flatten_mlp_to_torch (accepts torch tensors or numpy)."""
    def to_np(v):
        try:
            return v.detach().cpu().numpy()
        except AttributeError:
            return np.asarray(v)

    by_idx: dict[int, dict] = {}
    for key, val in state_dict.items():
        parts = key.split(".")
        idx = int(parts[-2])
        by_idx.setdefault(idx, {})[parts[-1]] = to_np(val)

    idxs = sorted(by_idx)
    layers = []
    out = None
    for n, idx in enumerate(idxs):
        entry = by_idx[idx]
        layer = {"w": entry["weight"].T.copy(), "b": entry["bias"].copy()}
        if "ln_scale" in entry:
            layer["ln_scale"] = entry["ln_scale"].copy()
            layer["ln_bias"] = entry["ln_bias"].copy()
        if n == len(idxs) - 1 and "ln_scale" not in entry:
            out = layer
        else:
            layers.append(layer)
    params = {"layers": layers}
    if out is not None:
        params["out"] = out
    return params


def export_to_torch(checkpoint_dir: str, output_dir: str):
    import torch

    from reinforcement_learning_tpu.utils import checkpoint as ckpt

    # Load the raw orbax tree without a template (read as numpy)
    import orbax.checkpoint as ocp
    with ocp.PyTreeCheckpointer() as ckptr:
        tree = ckptr.restore(os.path.join(os.path.abspath(checkpoint_dir),
                                          "state"))
    params = tree["ppo"]["params"]

    os.makedirs(output_dir, exist_ok=True)
    policy_sd = _flatten_mlp_to_torch(params["policy"])
    critic_sd = _flatten_mlp_to_torch(params["critic"])
    torch.save({k: torch.from_numpy(v.copy()) for k, v in policy_sd.items()},
               os.path.join(output_dir, "PPO_POLICY.pt"))
    torch.save({k: torch.from_numpy(v.copy()) for k, v in critic_sd.items()},
               os.path.join(output_dir, "PPO_VALUE_NET.pt"))
    if params.get("shared_head") is not None:
        head_sd = _flatten_mlp_to_torch(params["shared_head"])
        torch.save({k: torch.from_numpy(v.copy())
                    for k, v in head_sd.items()},
                   os.path.join(output_dir, "PPO_SHARED_HEAD.pt"))
    print(f"Exported torch state dicts to {output_dir}")


def import_from_torch(torch_dir: str, output_path: str):
    import torch

    policy_sd = torch.load(os.path.join(torch_dir, "PPO_POLICY.pt"),
                           map_location="cpu", weights_only=True)
    critic_sd = torch.load(os.path.join(torch_dir, "PPO_VALUE_NET.pt"),
                           map_location="cpu", weights_only=True)
    params = {
        "policy": _torch_to_mlp(policy_sd),
        "critic": _torch_to_mlp(critic_sd),
        "shared_head": None,
    }
    head_path = os.path.join(torch_dir, "PPO_SHARED_HEAD.pt")
    if os.path.exists(head_path):
        head_sd = torch.load(head_path, map_location="cpu",
                             weights_only=True)
        params["shared_head"] = _torch_to_mlp(head_sd)

    flat = {}

    def _store(prefix, tree):
        if tree is None:
            return
        for i, layer in enumerate(tree["layers"]):
            for k, v in layer.items():
                flat[f"{prefix}/layers/{i}/{k}"] = v
        if "out" in tree:
            for k, v in tree["out"].items():
                flat[f"{prefix}/out/{k}"] = v

    for name in ("policy", "critic", "shared_head"):
        _store(name, params[name])
    np.savez(output_path, **flat)
    print(f"Imported params saved to {output_path}")


def load_npz_params(path: str):
    """Load params exported by import_from_torch into the PPOParams layout."""
    data = np.load(path)
    params = {"policy": {"layers": []}, "critic": {"layers": []},
              "shared_head": {"layers": []}}
    for key in sorted(data.files):
        parts = key.split("/")
        model = params[parts[0]]
        if parts[1] == "layers":
            i = int(parts[2])
            while len(model["layers"]) <= i:
                model["layers"].append({})
            model["layers"][i][parts[3]] = data[key]
        else:
            model.setdefault("out", {})[parts[2]] = data[key]
    if not params["shared_head"]["layers"]:
        params["shared_head"] = None
    return params


# ---------------------------------------------------------------------------
# GigaLearnCPP ``.lt`` torchscript archives (the reference learner's native
# checkpoint format: Models.cpp:116-127 saves each model's nn::Sequential
# via torch::save, loadable from Python with torch.jit.load — see the
# reference's own tools/checkpoint_converter.py:90-92).

_LT_NAMES = {"policy": "POLICY.lt", "critic": "CRITIC.lt",
             "shared_head": "SHARED_HEAD.lt"}


def _build_torch_sequential(params: dict, activation: str = "relu"):
    """Our MLP params -> an nn.Sequential with the exact module layout the
    reference builds (Models.cpp:16-29: Linear [+LayerNorm] +activation per
    hidden layer, then the output Linear)."""
    import torch
    import torch.nn as nn

    acts = {"relu": nn.ReLU, "leaky_relu": nn.LeakyReLU,
            "sigmoid": nn.Sigmoid, "tanh": nn.Tanh}
    mods = []

    def _linear(layer):
        w = np.asarray(layer["w"])
        lin = nn.Linear(w.shape[0], w.shape[1])
        with torch.no_grad():
            lin.weight.copy_(torch.from_numpy(w.T.copy()))
            lin.bias.copy_(torch.from_numpy(np.asarray(layer["b"]).copy()))
        return lin

    for layer in params["layers"]:
        mods.append(_linear(layer))
        if "ln_scale" in layer:
            ln = nn.LayerNorm(len(layer["ln_scale"]))
            with torch.no_grad():
                ln.weight.copy_(torch.from_numpy(
                    np.asarray(layer["ln_scale"]).copy()))
                ln.bias.copy_(torch.from_numpy(
                    np.asarray(layer["ln_bias"]).copy()))
            mods.append(ln)
        mods.append(acts[activation]())
    if "out" in params:
        mods.append(_linear(params["out"]))
    return nn.Sequential(*mods)


def _sequential_to_params(module) -> dict:
    """torch.jit-loaded Sequential -> our MLP params dict.  Linear weights
    are 2-D, LayerNorm weights 1-D.  The output layer (addOutputLayer,
    Models.cpp:25-28) is detected STRUCTURALLY: every hidden Linear is
    followed by an activation module in the Sequential, so a Linear that is
    the sequence's final module is the output layer.  (Inferring from
    LayerNorm presence would misfile the last hidden Linear of a model
    built with addLayerNorm=false and addOutputLayer=false.)"""
    entries = []  # (kind, {w,b})
    sd = module.state_dict()
    by_idx: dict[int, dict] = {}
    for key, val in sd.items():
        parts = key.split(".")
        by_idx.setdefault(int(parts[-2]), {})[parts[-1]] = \
            val.detach().cpu().numpy()
    for idx in sorted(by_idx):
        e = by_idx[idx]
        entries.append(("linear" if e["weight"].ndim == 2 else "ln", e))

    # Index of the last module in the Sequential (activations included —
    # they are children even though they carry no parameters).
    last_module_idx = max(
        (int(name) for name, _ in module.named_children()
         if name.isdigit()), default=-1)
    last_param_idx = max(by_idx) if by_idx else -1
    has_output_layer = (last_module_idx == last_param_idx
                        and len(entries) > 1 and entries[-1][0] == "linear")

    layers, out = [], None
    i = 0
    while i < len(entries):
        kind, e = entries[i]
        assert kind == "linear", "unexpected module order in .lt archive"
        layer = {"w": e["weight"].T.copy(), "b": e["bias"].copy()}
        if i + 1 < len(entries) and entries[i + 1][0] == "ln":
            layer["ln_scale"] = entries[i + 1][1]["weight"].copy()
            layer["ln_bias"] = entries[i + 1][1]["bias"].copy()
            i += 1
        i += 1
        layers.append(layer)
    if has_output_layer:
        out = layers.pop()
    params = {"layers": layers}
    if out is not None:
        params["out"] = {"w": out["w"], "b": out["b"]}
    return params


def export_to_lt(checkpoint_dir: str, output_dir: str,
                 activation: str = "relu"):
    """Our orbax checkpoint -> GigaLearnCPP POLICY.lt/CRITIC.lt[/SHARED_HEAD
    .lt] torchscript archives the reference learner can load directly."""
    import torch

    import orbax.checkpoint as ocp
    with ocp.PyTreeCheckpointer() as ckptr:
        tree = ckptr.restore(os.path.join(os.path.abspath(checkpoint_dir),
                                          "state"))
    params = tree["ppo"]["params"]
    os.makedirs(output_dir, exist_ok=True)
    for name, fname in _LT_NAMES.items():
        p = params.get(name)
        if p is None:
            continue
        seq = _build_torch_sequential(p, activation)
        torch.jit.save(torch.jit.script(seq),
                       os.path.join(output_dir, fname))
    print(f"Exported .lt archives to {output_dir}")


def import_from_lt(lt_dir: str, output_path: str):
    """GigaLearnCPP .lt archives -> params .npz loadable by
    load_npz_params (mirrors the reference's to_python direction)."""
    import torch

    flat = {}
    for name, fname in _LT_NAMES.items():
        path = os.path.join(lt_dir, fname)
        if not os.path.exists(path):
            continue
        params = _sequential_to_params(torch.jit.load(path,
                                                      map_location="cpu"))
        for i, layer in enumerate(params["layers"]):
            for k, v in layer.items():
                flat[f"{name}/layers/{i}/{k}"] = v
        if "out" in params:
            for k, v in params["out"].items():
                flat[f"{name}/out/{k}"] = v
    np.savez(output_path, **flat)
    print(f"Imported params saved to {output_path}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("direction",
                    choices=["to_torch", "from_torch", "to_lt", "from_lt"])
    ap.add_argument("path")
    ap.add_argument("--out", default=None)
    ap.add_argument("--activation", default="relu")
    args = ap.parse_args()
    if args.direction == "to_torch":
        export_to_torch(args.path, args.out or "torch_checkpoint")
    elif args.direction == "from_torch":
        import_from_torch(args.path, args.out or "imported_params.npz")
    elif args.direction == "to_lt":
        export_to_lt(args.path, args.out or "cpp_checkpoint",
                     args.activation)
    else:
        import_from_lt(args.path, args.out or "imported_params.npz")


if __name__ == "__main__":
    main()
