"""2v2 kickoff shaping reward with goer/cheater role assignment.

Vectorized re-derivation of the reference's enhanced kickoff reward
(reference: Rewards/KickoffProximityReward2v2Enhanced.h:1-368): during an
active kickoff, each player is scored as GOER (races the ball) or CHEATER
(strategic second man), with dynamic positioning, boost management,
rotation-prep, opponent-awareness and anti-camping components.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from reinforcement_learning_tpu import constants as C
from reinforcement_learning_tpu import maths as m
from reinforcement_learning_tpu.envs.rewards import (BLUE_GOAL_BACK,
                                                     ORANGE_GOAL_BACK,
                                                     RewardCtx)

_BIG_PAD_LOCS = jnp.asarray(
    C.BOOST_PAD_LOCS_SOCCAR[C.BOOST_PAD_IS_BIG])  # (6, 3)


def kickoff_proximity_reward_2v2(goer_reward: float = 1.2,
                                 cheater_reward: float = 0.6,
                                 rotation_prep_weight: float = 0.2):
    """Factory matching the reference class's tunables (:9-12)."""

    def fn(ctx: RewardCtx) -> jnp.ndarray:
        cars, ball, teams = ctx.cars, ctx.ball, ctx.teams
        P = teams.shape[0]
        pos, vel = cars.pos, cars.vel

        # --- kickoff detection (:48-57)
        ball_speed = m.norm(ball.vel)
        active = ((ball_speed < 2.0) & (ball.pos[2] < 150.0)
                  & (m.norm(ball.pos[:2]) < 50.0))

        dist_ball = m.norm(pos - ball.pos)  # (P,)

        # --- team analysis (:59-94): teammate = other same-team player
        same = (teams[:, None] == teams[None, :]) & ~jnp.eye(P, dtype=bool)
        has_teammate = jnp.any(same, axis=1)
        mate_idx = jnp.argmax(same, axis=1)
        mate_pos = pos[mate_idx]
        mate_vel = vel[mate_idx]
        mate_boost = cars.boost[mate_idx]
        mate_dist_ball = dist_ball[mate_idx]

        opp = teams[:, None] != teams[None, :]
        opp_dists = jnp.where(opp, dist_ball[None, :], jnp.inf)
        closest_opp_dist = jnp.min(opp_dists, axis=1)
        n_opp = jnp.maximum(jnp.sum(opp, axis=1), 1)
        opp_com = jnp.einsum('pq,qi->pi', opp.astype(jnp.float32),
                             pos) / n_opp[:, None]

        # --- role assignment (:96-118)
        to_ball = m.normalize(ball.pos - pos)
        mate_to_ball = m.normalize(ball.pos - mate_pos)
        vel_to_ball = m.dot(vel, to_ball)
        mate_vel_to_ball = m.dot(mate_vel, mate_to_ball)
        dist_score = jnp.where(dist_ball < mate_dist_ball, 0.4, 0.0)
        speed_score = jnp.where(vel_to_ball > mate_vel_to_ball, 0.3, 0.0)
        boost_score = jnp.where(cars.boost > mate_boost + 10.0, 0.2, 0.0)
        ang_p = jnp.arctan2(pos[:, 1] - ball.pos[1], pos[:, 0] - ball.pos[0])
        ang_m = jnp.arctan2(mate_pos[:, 1] - ball.pos[1],
                            mate_pos[:, 0] - ball.pos[0])
        spawn_score = jnp.where(jnp.abs(ang_p - ang_m) > jnp.pi / 3,
                                1.0, 0.0) * 0.1
        is_goer = (dist_score + speed_score + boost_score
                   + spawn_score) >= 0.5

        # --- goer reward (:131-157)
        base = jnp.where(dist_ball < closest_opp_dist, goer_reward,
                         -goer_reward * 0.5)
        speed_bonus = jnp.clip(vel_to_ball / 2300.0, -0.3, 0.3)
        boost_eff = jnp.where(
            (cars.boost > 50.0) & (dist_ball > 1000.0), 0.1,
            jnp.where((cars.boost < 20.0) & (dist_ball > 800.0), -0.15,
                      0.0))
        approach = m.dot(to_ball, m.normalize(vel))
        angle_bonus = jnp.maximum(approach, 0.0) * 0.2
        goer_r = jnp.clip(base + speed_bonus + boost_eff + angle_bonus,
                          -1.5, 1.5)

        # --- cheater reward (:160-186)
        own_goal = jnp.where((teams == 0)[:, None], BLUE_GOAL_BACK,
                             ORANGE_GOAL_BACK)
        # dynamic ideal position (:188-224)
        field_center = jnp.array([0.0, 0.0, 100.0])
        base_ideal = (own_goal + field_center * 1.3) * 0.5
        threat_vec = m.normalize(opp_com - own_goal) * 200.0
        mate_far = m.norm(mate_pos - field_center) > 1500.0
        mate_off = jnp.where(
            mate_far[:, None],
            m.normalize(mate_pos - base_ideal) * 300.0, 0.0)
        ideal = base_ideal + threat_vec * 0.3 + mate_off * 0.2
        ideal = jnp.stack([
            jnp.clip(ideal[:, 0], -3000.0, 3000.0),
            jnp.clip(ideal[:, 1], -4000.0, 4000.0),
            jnp.maximum(ideal[:, 2], 17.0)], axis=-1)
        d_ideal = m.norm(pos - ideal)

        # positioning (:226-249)
        pos_r = jnp.where(
            d_ideal <= 600.0, 0.5 * (1.0 - d_ideal / 600.0),
            jnp.where(
                d_ideal <= 1200.0,
                0.5 * (1.0 - (d_ideal - 600.0) / 600.0) * 0.7,
                jnp.where(d_ideal <= 2000.0,
                          -0.1 * (d_ideal - 1200.0) / 800.0, -0.3)))

        # strategic boost (:251-301), big pads only
        d_pads = m.norm(pos[:, None, :] - _BIG_PAD_LOCS[None, :, :])
        accessibility = 1.0 - jnp.clip(d_pads / 1500.0, 0.0, 1.0)
        is_corner = ((jnp.abs(_BIG_PAD_LOCS[:, 0]) > 2500.0)
                     & (jnp.abs(_BIG_PAD_LOCS[:, 1]) > 3500.0))
        base_val = jnp.where(is_corner, 0.8, 0.6)[None, :]
        d_ball_pad = m.norm(_BIG_PAD_LOCS - ball.pos)[None, :]
        proximity = 1.0 - jnp.clip(d_ball_pad / 3000.0, 0.0, 1.0)
        strategic = base_val * (0.3 + proximity * 0.7)
        d_opp_pad = m.norm(opp_com[:, None, :] - _BIG_PAD_LOCS[None, :, :])
        deny = jnp.clip(1.0 - d_opp_pad / 2000.0, 0.0, 0.3)
        best_boost = jnp.max(accessibility * (strategic + deny), axis=1)
        boost_factor = jnp.where(cars.boost < 30.0, 1.5,
                                 jnp.where(cars.boost > 80.0, 0.5, 1.0))
        boost_r = best_boost * boost_factor * 0.25

        # rotation preparation (:304-335)
        mate_to_goal = m.normalize(own_goal - mate_pos)
        perp = m.normalize(jnp.stack(
            [-mate_to_goal[:, 1], mate_to_goal[:, 0],
             jnp.zeros(P)], axis=-1))
        support = mate_pos + mate_to_goal * 800.0 + perp * 600.0
        d_support = m.norm(pos - support)
        readiness = 1.0 - jnp.clip(d_support / 1000.0, 0.0, 1.0)
        v_align = jnp.maximum(
            m.dot(m.normalize(vel), m.normalize(support - pos)), 0.0)
        rot_r = (readiness * 0.7 + v_align * 0.3) * rotation_prep_weight

        # opponent awareness (:337-346)
        aware = m.dot(m.normalize(opp_com - pos), to_ball)
        aware_r = jnp.clip(aware * 0.5 + 0.5, 0.0, 1.0) * 0.1

        # anti-camping (:348-366)
        d_goal = m.norm(pos - own_goal)
        ball_d_goal = m.norm(ball.pos - own_goal)
        min_dist = jnp.where(ball_d_goal < 2000.0, 800.0 * 0.7, 800.0)
        camp_r = jnp.where(
            d_goal < min_dist, -0.4 * (1.0 - d_goal / min_dist), 0.0) * 0.05

        cheater_r = jnp.clip(pos_r + boost_r + rot_r + aware_r + camp_r,
                             -0.8, 0.8)

        out = jnp.where(is_goer, goer_r, cheater_r)
        return jnp.where(active & has_teammate, out, 0.0)

    fn.__name__ = "KickoffProximityReward2v2Enhanced"
    return fn
