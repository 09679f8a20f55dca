"""The physics megakernel: the entire multi-tick env step as ONE Pallas call.

Why: the XLA path compiles each 1/120 s tick into ~500 fused kernels; at
tick_skip 8 a single env step dispatches ~4000 kernels and the training
loop becomes pure kernel-launch overhead (the per-kernel work is a few
microseconds of VPU time).  Here the whole state (~2 MB for 1024 arenas)
lives in VMEM for all 8 ticks and the step is one kernel launch.

Mechanics: the component state dict (ops/ctick layout, env axis tiled to
``(E//128, 128)``) is flattened and stacked into a few dtype-grouped VMEM
refs; the kernel unstacks them, runs ``ctick.step`` (a ``fori_loop`` over
ticks), and writes the same groups back.  Bools travel as f32 0/1 (Mosaic
refs are happiest in f32/i32) and are re-booled at the kernel boundary.

Reference parity: ctick is tested trajectory-equal to physics/step
(the XLA oracle); this wrapper is tested equal to ctick in interpret mode
and on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from reinforcement_learning_tpu.ops import ctick, pack


def _env_shape(E: int):
    """Env tiling: full (8,128)-tile lanes when possible."""
    if E % 128 == 0:
        return (E // 128, 128)
    return (1, E)


class _GroupSpec:
    """Stable grouping of state-dict leaves into stacked dtype arrays."""

    def __init__(self, state_dict):
        leaves, self.treedef = jax.tree_util.tree_flatten(state_dict)
        self.shapes = [l.shape for l in leaves]
        self.dtypes = [l.dtype for l in leaves]
        # group key: (shape, packed dtype); bools pack as f32 0/1
        self.keys = []
        for l in leaves:
            dt = jnp.float32 if l.dtype == jnp.bool_ else l.dtype
            self.keys.append((l.shape, jnp.dtype(dt)))
        self.group_order = sorted(set(self.keys), key=str)
        self.group_members = {k: [i for i, kk in enumerate(self.keys)
                                  if kk == k] for k in self.group_order}

    def stack(self, state_dict):
        """dict -> list of stacked group arrays (ordered by group_order)."""
        leaves = jax.tree_util.tree_leaves(state_dict)
        out = []
        for k in self.group_order:
            shape, dt = k
            mem = self.group_members[k]
            out.append(jnp.stack(
                [leaves[i].astype(dt) for i in mem], axis=0))
        return out

    def unstack(self, group_arrays):
        """list of stacked group values -> dict."""
        leaves = [None] * len(self.shapes)
        for k, g in zip(self.group_order, group_arrays):
            for slot, i in enumerate(self.group_members[k]):
                v = g[slot]
                if self.dtypes[i] == jnp.bool_:
                    v = v != 0
                leaves[i] = v
        return jax.tree_util.tree_unflatten(self.treedef, leaves)

    def out_shapes(self):
        return [jax.ShapeDtypeStruct((len(self.group_members[k]),) + k[0],
                                     k[1]) for k in self.group_order]


@functools.partial(
    jax.jit, static_argnames=('params', 'teams', 'tick_skip', 'action_delay',
                              'interpret'))
def pallas_arena_step(phys, new_controls, respawn_idx, *, params, teams,
                      tick_skip: int = 8, action_delay: int = 7,
                      interpret: bool = False):
    """Step all arenas ``tick_skip`` ticks in one kernel launch.

    phys: batched PhysicsState (leading env axis E).
    new_controls: (E, C, 8) float32 — applied from tick ``action_delay``.
    respawn_idx: (E, C) int32 — demo respawn location draw for this step.
    params: physics.step.ArenaParams (hashable static).
    teams: tuple of per-slot team ids.
    """
    E, Cn = new_controls.shape[:2]
    S = _env_shape(E)
    k = ctick.make_consts(params, teams)

    state = pack.to_components(phys, S=S)
    spec = _GroupSpec(state)
    groups = spec.stack(state)
    nc = jnp.stack([jnp.swapaxes(new_controls[..., c], 0, 1).reshape(
        (Cn,) + S) for c in range(8)], axis=0)
    ridx = jnp.swapaxes(respawn_idx, 0, 1).reshape((Cn,) + S)

    n_groups = len(groups)

    def kernel(*refs):
        in_groups = [refs[i][:] for i in range(n_groups)]
        nc_v = refs[n_groups][:]
        ridx_v = refs[n_groups + 1][:]
        out_refs = refs[n_groups + 2:]

        st = spec.unstack(in_groups)
        new_ctrl = tuple(nc_v[c] for c in range(8))
        out = ctick.step(k, st, new_ctrl, ridx_v, tick_skip, action_delay)

        leaves = jax.tree_util.tree_leaves(out)
        for gi, gk in enumerate(spec.group_order):
            shape, dt = gk
            mem = spec.group_members[gk]
            out_refs[gi][:] = jnp.stack(
                [leaves[i].astype(dt) for i in mem], axis=0)

    out_groups = pl.pallas_call(
        kernel,
        out_shape=spec.out_shapes(),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (n_groups + 2),
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                        for _ in range(n_groups)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*groups, nc, ridx)

    out_state = spec.unstack(list(out_groups))
    return pack.from_components(out_state, E)
