"""Observation builders.

Vectorized pure-function re-designs of the reference obs builders
(reference: RLGymCPP/ObsBuilders/).  Each builder maps one arena's state to
a ``(P, obs_size)`` array; team-relative inversion for orange players is a
sign flip on x/y of every world-frame vector (reference AdvancedObs.cpp
InvertedPhys).

Boost pads are reported in the canonical rlgym order (reference:
GameState.cpp:11-51 index map, CommonValues.h:45-80), reversed for orange.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from reinforcement_learning_tpu import constants as C
from reinforcement_learning_tpu import maths as m

POS_COEF = 1.0 / 2300.0
VEL_COEF = 1.0 / 2300.0
ANG_VEL_COEF = 1.0 / 5.5
BOOST_COEF = 0.01

# Canonical rlgym boost pad order (CommonValues.h:45-80)
_CANONICAL_PAD_LOCS = np.array([
    [0, -4240, 70], [-1792, -4184, 70], [1792, -4184, 70],
    [-3072, -4096, 73], [3072, -4096, 73], [-940, -3308, 70],
    [940, -3308, 70], [0, -2816, 70], [-3584, -2484, 70],
    [3584, -2484, 70], [-1788, -2300, 70], [1788, -2300, 70],
    [-2048, -1036, 70], [0, -1024, 70], [2048, -1036, 70],
    [-3584, 0, 73], [-1024, 0, 70], [1024, 0, 70], [3584, 0, 73],
    [-2048, 1036, 70], [0, 1024, 70], [2048, 1036, 70],
    [-1788, 2300, 70], [1788, 2300, 70], [-3584, 2484, 70],
    [3584, 2484, 70], [0, 2816, 70], [-940, 3310, 70], [940, 3308, 70],
    [-3072, 4096, 73], [3072, 4096, 73], [-1792, 4184, 70],
    [1792, 4184, 70], [0, 4240, 70],
], np.float32)


def _build_pad_permutation() -> np.ndarray:
    """perm[i] = arena-order index of canonical pad i (GameState.cpp
    _BuildBoostPadIndexMap; 2D distance < sqrt(10) match)."""
    arena = C.BOOST_PAD_LOCS_SOCCAR[:, :2]
    perm = np.zeros(C.NUM_BOOST_PADS, np.int64)
    for i, loc in enumerate(_CANONICAL_PAD_LOCS[:, :2]):
        d2 = np.sum((arena - loc) ** 2, axis=1)
        j = int(np.argmin(d2))
        assert d2[j] < 10.0, (i, d2[j])
        perm[i] = j
    assert len(set(perm.tolist())) == C.NUM_BOOST_PADS
    return perm


PAD_PERMUTATION = _build_pad_permutation()


def canonical_pads(pads_active, pads_cooldown, invert):
    """Reorder arena pads into canonical order; reversed for orange
    (GameState.cpp:110-125).  invert: scalar bool or (P,) per-player."""
    perm = jnp.asarray(PAD_PERMUTATION)
    act = pads_active[..., perm]
    cool = pads_cooldown[..., perm]
    act_inv = act[..., ::-1]
    cool_inv = cool[..., ::-1]
    inv = invert[..., None]
    return (jnp.where(inv, act_inv, act), jnp.where(inv, cool_inv, cool))


def _invert_vec(v, inv):
    """Negate x/y where inv (inv broadcastable to v[..., 0])."""
    flip = jnp.where(inv[..., None], jnp.array([-1.0, -1.0, 1.0]),
                     jnp.ones(3))
    return v * flip


class AdvancedObs:
    """The reference's training obs (AdvancedObs.cpp:193-270):
    ball(9) + prevAction(8) + pads(34) + 29 floats per player, self first,
    then teammates, then opponents.  167 floats for 2v2."""

    def __init__(self, num_players: int, teams: np.ndarray):
        self.num_players = num_players
        self.teams = np.asarray(teams)
        self.obs_size = 9 + 8 + C.NUM_BOOST_PADS + 29 * num_players
        # Static per-player ordering: self, teammates (index order),
        # opponents (index order)  (AdvancedObs.cpp:247-259)
        order = np.zeros((num_players, num_players), np.int64)
        for i in range(num_players):
            mates = [j for j in range(num_players)
                     if j != i and self.teams[j] == self.teams[i]]
            opps = [j for j in range(num_players)
                    if self.teams[j] != self.teams[i]]
            order[i] = [i] + mates + opps
        self.order = order

    def _player_block(self, cars, ball_pos, ball_vel, inv):
        """29 floats per (viewed) player: cars fields have leading axis of
        players-being-viewed; inv is (V,) of the viewer's inversion."""
        pos = _invert_vec(cars.pos, inv)
        fwd = _invert_vec(cars.forward, inv)
        up = _invert_vec(cars.up, inv)
        vel = _invert_vec(cars.vel, inv)
        ang = _invert_vec(cars.ang_vel, inv)
        right = _invert_vec(cars.right, inv)
        bpos = _invert_vec(ball_pos, inv)
        bvel = _invert_vec(ball_vel, inv)

        local_ang = jnp.stack([m.dot(fwd, ang), m.dot(right, ang),
                               m.dot(up, ang)], axis=-1)
        rel_ball = bpos - pos
        rel_vel = bvel - vel
        local_ball = jnp.stack([m.dot(fwd, rel_ball), m.dot(right, rel_ball),
                                m.dot(up, rel_ball)], axis=-1)
        local_bvel = jnp.stack([m.dot(fwd, rel_vel), m.dot(right, rel_vel),
                                m.dot(up, rel_vel)], axis=-1)
        flags = jnp.stack([
            cars.boost * BOOST_COEF,
            cars.is_on_ground.astype(jnp.float32),
            cars.has_flip_or_jump().astype(jnp.float32),
            cars.is_demoed.astype(jnp.float32),
            cars.has_jumped.astype(jnp.float32),
        ], axis=-1)
        return jnp.concatenate([
            pos * POS_COEF, fwd, up, vel * VEL_COEF, ang * ANG_VEL_COEF,
            local_ang * ANG_VEL_COEF, local_ball * POS_COEF,
            local_bvel * VEL_COEF, flags], axis=-1)

    def build(self, cars, ball, pads, prev_actions, teams):
        """One arena -> (P, obs_size).

        cars: CarsState (P leading); ball: BallState; pads: PadsState;
        prev_actions: (P, 8); teams: (P,) int.
        """
        P = self.num_players
        inv = teams == 1  # orange inverts

        ball_pos = _invert_vec(jnp.broadcast_to(ball.pos, (P, 3)), inv)
        ball_vel = _invert_vec(jnp.broadcast_to(ball.vel, (P, 3)), inv)
        ball_ang = _invert_vec(jnp.broadcast_to(ball.ang_vel, (P, 3)), inv)
        ball_part = jnp.concatenate([ball_pos * POS_COEF,
                                     ball_vel * VEL_COEF,
                                     ball_ang * ANG_VEL_COEF], axis=-1)

        pad_act, pad_cool = canonical_pads(pads.is_active, pads.cooldown, inv)
        pad_vals = jnp.where(pad_act, 1.0, 1.0 / (1.0 + pad_cool))

        # Player blocks: for viewer i, viewed player j = order[i] —
        # (P, P) gather, each with viewer i's inversion
        order = jnp.asarray(self.order)  # (P, P)
        gathered = jax.tree.map(lambda x: x[order.reshape(-1)], cars)
        inv_rep = jnp.repeat(inv, P)
        bp = jnp.broadcast_to(ball.pos, (P * P, 3))
        bv = jnp.broadcast_to(ball.vel, (P * P, 3))
        blocks = self._player_block(gathered, bp, bv, inv_rep)
        blocks = blocks.reshape(P, P * 29)

        return jnp.concatenate([ball_part, prev_actions, pad_vals, blocks],
                               axis=-1)


class DefaultObs:
    """Reference DefaultObs (DefaultObs.cpp:4-54): ball(9) + prevAction(8)
    + pads(34, binary) + 19 floats per player (pos, forward, up, vel,
    angvel, boost, onGround, hasFlip, isDemoed), self then teammates then
    opponents."""

    PLAYER_SIZE = 19

    def __init__(self, num_players: int, teams: np.ndarray):
        self.num_players = num_players
        self.teams = np.asarray(teams)
        self.obs_size = 9 + 8 + C.NUM_BOOST_PADS \
            + self.PLAYER_SIZE * num_players
        order = np.zeros((num_players, num_players), np.int64)
        for i in range(num_players):
            mates = [j for j in range(num_players)
                     if j != i and self.teams[j] == self.teams[i]]
            opps = [j for j in range(num_players)
                    if self.teams[j] != self.teams[i]]
            order[i] = [i] + mates + opps
        self.order = order

    def _player_block(self, cars, inv):
        pos = _invert_vec(cars.pos, inv)
        fwd = _invert_vec(cars.forward, inv)
        up = _invert_vec(cars.up, inv)
        vel = _invert_vec(cars.vel, inv)
        ang = _invert_vec(cars.ang_vel, inv)
        flags = jnp.stack([
            cars.boost / 100.0,
            cars.is_on_ground.astype(jnp.float32),
            cars.has_flip_or_jump().astype(jnp.float32),
            cars.is_demoed.astype(jnp.float32),
        ], axis=-1)
        return jnp.concatenate([pos * POS_COEF, fwd, up, vel * VEL_COEF,
                                ang * ANG_VEL_COEF, flags], axis=-1)

    def build(self, cars, ball, pads, prev_actions, teams):
        P = self.num_players
        inv = teams == 1
        ball_pos = _invert_vec(jnp.broadcast_to(ball.pos, (P, 3)), inv)
        ball_vel = _invert_vec(jnp.broadcast_to(ball.vel, (P, 3)), inv)
        ball_ang = _invert_vec(jnp.broadcast_to(ball.ang_vel, (P, 3)), inv)
        ball_part = jnp.concatenate([ball_pos * POS_COEF,
                                     ball_vel * VEL_COEF,
                                     ball_ang * ANG_VEL_COEF], axis=-1)
        pad_act, _ = canonical_pads(pads.is_active, pads.cooldown, inv)
        pad_vals = pad_act.astype(jnp.float32)

        order = jnp.asarray(self.order)
        gathered = jax.tree.map(lambda x: x[order.reshape(-1)], cars)
        inv_rep = jnp.repeat(inv, P)
        blocks = self._player_block(gathered, inv_rep)
        blocks = blocks.reshape(P, P * self.PLAYER_SIZE)
        return jnp.concatenate([ball_part, prev_actions, pad_vals, blocks],
                               axis=-1)


class DefaultObsPadded(DefaultObs):
    """DefaultObsPadded (DefaultObsPadded.cpp:4-80): fixed-size obs padded
    to ``max_players`` per team with zero blocks; teammate/opponent order
    shuffled per build (needs a PRNG key via set_key / build(key=...))."""

    def __init__(self, num_players: int, teams: np.ndarray,
                 max_players: int):
        super().__init__(num_players, teams)
        self.max_players = max_players
        self.obs_size = 9 + 8 + C.NUM_BOOST_PADS \
            + self.PLAYER_SIZE * (2 * max_players)

    def build(self, cars, ball, pads, prev_actions, teams, key=None):
        P = self.num_players
        M = self.max_players
        inv = teams == 1
        ball_pos = _invert_vec(jnp.broadcast_to(ball.pos, (P, 3)), inv)
        ball_vel = _invert_vec(jnp.broadcast_to(ball.vel, (P, 3)), inv)
        ball_ang = _invert_vec(jnp.broadcast_to(ball.ang_vel, (P, 3)), inv)
        ball_part = jnp.concatenate([ball_pos * POS_COEF,
                                     ball_vel * VEL_COEF,
                                     ball_ang * ANG_VEL_COEF], axis=-1)
        pad_act, _ = canonical_pads(pads.is_active, pads.cooldown, inv)
        pad_vals = pad_act.astype(jnp.float32)

        order = jnp.asarray(self.order)
        gathered = jax.tree.map(lambda x: x[order.reshape(-1)], cars)
        inv_rep = jnp.repeat(inv, P)
        blocks = self._player_block(gathered, inv_rep).reshape(
            P, P, self.PLAYER_SIZE)

        self_block = blocks[:, 0]
        n_mates = P // 2 - 1 if P > 1 else 0
        mates = blocks[:, 1:1 + n_mates]
        opps = blocks[:, 1 + n_mates:]

        def pad_group(group, target):
            pad_n = target - group.shape[1]
            if pad_n > 0:
                group = jnp.concatenate(
                    [group, jnp.zeros((P, pad_n, self.PLAYER_SIZE))], axis=1)
            return group

        mates = pad_group(mates, M - 1)
        opps = pad_group(opps, M)
        if key is not None:
            k1, k2 = jax.random.split(key)
            mates = jax.random.permutation(k1, mates, axis=1,
                                           independent=False)
            opps = jax.random.permutation(k2, opps, axis=1,
                                          independent=False)
        out = jnp.concatenate([
            self_block,
            mates.reshape(P, -1),
            opps.reshape(P, -1)], axis=-1)
        return jnp.concatenate([ball_part, prev_actions, pad_vals, out],
                               axis=-1)
