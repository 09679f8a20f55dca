"""Physics state pytrees.

The reference keeps per-object C++ classes (``CarState`` Car.h:17-115,
``BallState`` Ball.h:17-46, ``BoostPadState`` BoostPad.h:36-58).  Here the
entire simulation state is a struct-of-arrays pytree shaped ``(..., C, ...)``
over cars so one jitted program steps every arena in lockstep; all booleans
become masks and every branch in the reference state machines becomes a
``jnp.where``.

Controls layout (reference: RocketSim/src/Sim/CarControls.h, and the Action
float order in RLGymCPP Action.h):
  [throttle, steer, pitch, yaw, roll, jump, boost, handbrake]
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np
from flax import struct

from reinforcement_learning_tpu import constants as C

# Indices into a controls vector
THROTTLE, STEER, PITCH, YAW, ROLL, JUMP, BOOST, HANDBRAKE = range(8)
NUM_CONTROLS = 8


@struct.dataclass
class CarsState:
    """State for all cars of one arena; every field has a leading car axis.

    Mirrors the reference ``CarState`` field-for-field
    (reference: Car.h:17-115)."""

    pos: jnp.ndarray            # (C, 3)
    rot: jnp.ndarray            # (C, 3, 3) columns forward/right/up
    vel: jnp.ndarray            # (C, 3)
    ang_vel: jnp.ndarray        # (C, 3)

    is_on_ground: jnp.ndarray          # (C,) bool
    wheels_with_contact: jnp.ndarray   # (C, 4) bool
    has_jumped: jnp.ndarray            # (C,) bool
    has_double_jumped: jnp.ndarray     # (C,) bool
    has_flipped: jnp.ndarray           # (C,) bool
    flip_rel_torque: jnp.ndarray       # (C, 3)
    jump_time: jnp.ndarray             # (C,)
    flip_time: jnp.ndarray             # (C,)
    is_flipping: jnp.ndarray           # (C,) bool
    is_jumping: jnp.ndarray            # (C,) bool
    air_time: jnp.ndarray              # (C,)
    air_time_since_jump: jnp.ndarray   # (C,)
    boost: jnp.ndarray                 # (C,)
    time_spent_boosting: jnp.ndarray   # (C,)
    is_supersonic: jnp.ndarray         # (C,) bool
    supersonic_time: jnp.ndarray       # (C,)
    handbrake_val: jnp.ndarray         # (C,)
    is_auto_flipping: jnp.ndarray      # (C,) bool
    auto_flip_timer: jnp.ndarray       # (C,)
    auto_flip_torque_scale: jnp.ndarray  # (C,)

    has_world_contact: jnp.ndarray     # (C,) bool
    world_contact_normal: jnp.ndarray  # (C, 3)

    car_contact_other_id: jnp.ndarray  # (C,) int32 (0 = none)
    car_contact_cooldown: jnp.ndarray  # (C,)

    is_demoed: jnp.ndarray             # (C,) bool
    demo_respawn_timer: jnp.ndarray    # (C,)

    # BallHitInfo (reference: BallHitInfo.h)
    ball_hit_valid: jnp.ndarray        # (C,) bool
    ball_hit_rel_pos: jnp.ndarray      # (C, 3)
    ball_hit_tick: jnp.ndarray         # (C,) int32
    ball_hit_extra_impulse_tick: jnp.ndarray  # (C,) int32
    ball_hit_ball_pos: jnp.ndarray     # (C, 3)
    ball_hit_extra_vel: jnp.ndarray    # (C, 3)

    last_controls: jnp.ndarray         # (C, 8)
    # Controls currently applied each tick (reference: Car::controls, set by
    # the env between the action-delay split; lives in state so the whole
    # multi-tick step stays one pure function).
    controls: jnp.ndarray              # (C, 8)

    @property
    def forward(self):
        return self.rot[..., :, 0]

    @property
    def right(self):
        return self.rot[..., :, 1]

    @property
    def up(self):
        return self.rot[..., :, 2]

    def has_flip_or_jump(self):
        """Reference: CarState::HasFlipOrJump (Car.cpp:285-289)."""
        return self.is_on_ground | (
            ~self.has_flipped & ~self.has_double_jumped
            & (self.air_time_since_jump < C.DOUBLEJUMP_MAX_DELAY))


@struct.dataclass
class BallState:
    pos: jnp.ndarray      # (3,)
    rot: jnp.ndarray      # (3, 3)
    vel: jnp.ndarray      # (3,)
    ang_vel: jnp.ndarray  # (3,)
    # Heatseeker mode state (reference: BallState::HeatseekerInfo,
    # Ball.h:26-36); zeros/initial in other modes.
    hs_y_target_dir: jnp.ndarray     # () f32: -1, 0 (no target) or +1
    hs_target_speed: jnp.ndarray     # () f32
    hs_time_since_hit: jnp.ndarray   # () f32


@struct.dataclass
class PadsState:
    """Boost pad state: (34,) arrays; reference BoostPad.h:36-58."""
    is_active: jnp.ndarray  # (34,) bool
    cooldown: jnp.ndarray   # (34,)
    # Pickup-lock hysteresis (BoostPad.cpp:62-105): id+1 of the car that
    # collided with this pad last tick (0 = none).  The locked car keeps
    # the pad via a wider AABB-vs-hitbox test; everyone else must pass
    # the cylinder-origin test.
    prev_locked: jnp.ndarray  # (34,) int32


@struct.dataclass
class ArenaState:
    """Complete physics state of one arena (vmap over a leading axis for
    many arenas)."""
    cars: CarsState
    ball: BallState
    pads: PadsState
    tick_count: jnp.ndarray  # () int32
    # Set on the tick a goal is scored; y-sign of ball decides scoring team.
    goal_scored: jnp.ndarray  # () bool
    # Per-step event latches (cleared at env-step start, reference:
    # GameState::ResetBeforeStep + arena callbacks EnvSet.cpp:31-42):
    # bump/demo only recorded against the opposing team.
    step_bump: jnp.ndarray    # (C,) bool — this car bumped an opponent
    step_bumped: jnp.ndarray  # (C,) bool — this car was bumped
    step_demo: jnp.ndarray    # (C,) bool — this car demoed an opponent
    step_demoed: jnp.ndarray  # (C,) bool — this car was demolished


@dataclasses.dataclass(frozen=True)
class MutatorConfig:
    """Per-arena tunables (reference: MutatorConfig.h:16-75).  Static under
    jit: folded into the compiled program as constants."""
    gravity_z: float = C.GRAVITY_Z
    car_mass: float = C.CAR_MASS_BT
    car_world_friction: float = C.CARWORLD_COLLISION_FRICTION
    car_world_restitution: float = C.CARWORLD_COLLISION_RESTITUTION
    ball_mass: float = C.BALL_MASS_BT
    ball_max_speed: float = C.BALL_MAX_SPEED
    ball_drag: float = C.BALL_DRAG
    ball_world_friction: float = C.BALL_FRICTION
    ball_world_restitution: float = C.BALL_RESTITUTION
    jump_accel: float = C.JUMP_ACCEL
    jump_immediate_force: float = C.JUMP_IMMEDIATE_FORCE
    boost_accel_ground: float = C.BOOST_ACCEL_GROUND
    boost_accel_air: float = C.BOOST_ACCEL_AIR
    boost_used_per_second: float = C.BOOST_USED_PER_SECOND
    respawn_delay: float = C.DEMO_RESPAWN_TIME
    bump_cooldown_time: float = C.BUMP_COOLDOWN_TIME
    boost_pad_cooldown_big: float = C.BoostPads.COOLDOWN_BIG
    boost_pad_cooldown_small: float = C.BoostPads.COOLDOWN_SMALL
    car_spawn_boost_amount: float = C.BOOST_SPAWN_AMOUNT
    ball_hit_extra_force_scale: float = 1.0
    bump_force_scale: float = 1.0
    ball_radius: float = C.BALL_COLLISION_RADIUS_SOCCAR
    unlimited_flips: bool = False
    unlimited_double_jumps: bool = False
    demo_mode: str = "NORMAL"  # NORMAL | ON_CONTACT | DISABLED
    enable_team_demos: bool = False
    goal_base_threshold_y: float = C.SOCCAR_GOAL_SCORE_BASE_THRESHOLD_Y

    @classmethod
    def for_mode(cls, game_mode: str) -> "MutatorConfig":
        """Game-mode defaults (reference: MutatorConfig::MutatorConfig,
        MutatorConfig.cpp:5-34)."""
        kw = {}
        if game_mode == "hoops":
            kw["ball_radius"] = C.BALL_COLLISION_RADIUS_HOOPS
        elif game_mode == "snowday":
            kw["ball_radius"] = C.Snowday.PUCK_RADIUS
            kw["ball_world_friction"] = C.Snowday.PUCK_FRICTION
            kw["ball_world_restitution"] = C.Snowday.PUCK_RESTITUTION
            kw["ball_mass"] = C.Snowday.PUCK_MASS_BT
        if game_mode == "heatseeker":
            kw["car_spawn_boost_amount"] = 100.0
            kw["boost_used_per_second"] = 0.0
        return cls(**kw)


@dataclasses.dataclass(frozen=True)
class CarConfig:
    """Car preset (reference: CarConfig.h/.cpp).  One preset shared by all
    cars in an arena set for now (matches the reference default usage)."""
    hitbox_size: tuple = tuple(C.HITBOX_SIZES[C.OCTANE])
    hitbox_offset: tuple = tuple(C.HITBOX_OFFSETS[C.OCTANE])
    front_wheel_radius: float = float(C.FRONT_WHEEL_RADS[C.OCTANE])
    back_wheel_radius: float = float(C.BACK_WHEEL_RADS[C.OCTANE])
    front_sus_rest: float = float(C.FRONT_WHEEL_SUS_REST[C.OCTANE])
    back_sus_rest: float = float(C.BACK_WHEEL_SUS_REST[C.OCTANE])
    front_wheel_offset: tuple = tuple(C.FRONT_WHEELS_OFFSET[C.OCTANE])
    back_wheel_offset: tuple = tuple(C.BACK_WHEELS_OFFSET[C.OCTANE])
    dodge_deadzone: float = C.DODGE_DEADZONE

    def wheel_offsets(self) -> np.ndarray:
        """(4, 3) suspension connection points in car local frame.
        Order: [front-right, front-left, back-right, back-left] — front
        wheels first, matching the reference wheel order (Car.cpp:243-264,
        ``left = i % 2`` negates local y)."""
        f = np.asarray(self.front_wheel_offset, np.float32)
        b = np.asarray(self.back_wheel_offset, np.float32)
        fl = f * np.array([1, -1, 1], np.float32)
        bl = b * np.array([1, -1, 1], np.float32)
        return np.stack([f, fl, b, bl])

    def wheel_radii(self) -> np.ndarray:
        return np.array([self.front_wheel_radius, self.front_wheel_radius,
                         self.back_wheel_radius, self.back_wheel_radius],
                        np.float32)

    def sus_rest_lengths(self) -> np.ndarray:
        """Suspension rest lengths after the reference's MAX_SUSPENSION_TRAVEL
        subtraction (Car.cpp:255-258)."""
        rest = np.array([self.front_sus_rest, self.front_sus_rest,
                         self.back_sus_rest, self.back_sus_rest], np.float32)
        return rest - C.BTVehicle.MAX_SUSPENSION_TRAVEL

    def sus_force_scales(self) -> np.ndarray:
        return np.array([C.BTVehicle.SUSPENSION_FORCE_SCALE_FRONT] * 2
                        + [C.BTVehicle.SUSPENSION_FORCE_SCALE_BACK] * 2,
                        np.float32)


def make_cars_state(num_cars: int, mutators: MutatorConfig | None = None
                    ) -> CarsState:
    """Default-constructed cars (reference CarState defaults, Car.h:17-115):
    at rest on the floor at the origin area; callers then set pos/rot."""
    n = num_cars
    boost0 = (mutators.car_spawn_boost_amount if mutators is not None
              else C.BOOST_SPAWN_AMOUNT)
    f3 = lambda *s: jnp.zeros((n, *s), jnp.float32)
    b = lambda *s: jnp.zeros((n, *s), bool)
    i = lambda *s: jnp.zeros((n, *s), jnp.int32)
    return CarsState(
        pos=jnp.tile(jnp.array([0.0, 0.0, C.CAR_SPAWN_REST_Z], jnp.float32),
                     (n, 1)),
        rot=jnp.tile(jnp.eye(3, dtype=jnp.float32), (n, 1, 1)),
        vel=f3(3), ang_vel=f3(3),
        is_on_ground=jnp.ones((n,), bool),
        wheels_with_contact=b(4),
        has_jumped=b(), has_double_jumped=b(), has_flipped=b(),
        flip_rel_torque=f3(3),
        jump_time=f3(), flip_time=f3(),
        is_flipping=b(), is_jumping=b(),
        air_time=f3(), air_time_since_jump=f3(),
        boost=jnp.full((n,), boost0, jnp.float32),
        time_spent_boosting=f3(),
        is_supersonic=b(), supersonic_time=f3(),
        handbrake_val=f3(),
        is_auto_flipping=b(), auto_flip_timer=f3(),
        auto_flip_torque_scale=f3(),
        has_world_contact=b(),
        world_contact_normal=f3(3),
        car_contact_other_id=i(), car_contact_cooldown=f3(),
        is_demoed=b(), demo_respawn_timer=f3(),
        ball_hit_valid=b(), ball_hit_rel_pos=f3(3),
        ball_hit_tick=i(), ball_hit_extra_impulse_tick=i(),
        ball_hit_ball_pos=f3(3), ball_hit_extra_vel=f3(3),
        last_controls=f3(NUM_CONTROLS), controls=f3(NUM_CONTROLS),
    )


def make_ball_state() -> BallState:
    return BallState(
        pos=jnp.array([0.0, 0.0, C.BALL_REST_Z], jnp.float32),
        rot=jnp.eye(3, dtype=jnp.float32),
        vel=jnp.zeros(3, jnp.float32),
        ang_vel=jnp.zeros(3, jnp.float32),
        hs_y_target_dir=jnp.zeros((), jnp.float32),
        hs_target_speed=jnp.full((), C.Heatseeker.INITIAL_TARGET_SPEED,
                                 jnp.float32),
        hs_time_since_hit=jnp.zeros((), jnp.float32),
    )


def make_pads_state(game_mode: str = "soccar") -> PadsState:
    n = (C.NUM_BOOST_PADS_HOOPS if game_mode == "hoops"
         else C.NUM_BOOST_PADS)
    return PadsState(
        is_active=jnp.ones((n,), bool),
        cooldown=jnp.zeros((n,), jnp.float32),
        prev_locked=jnp.zeros((n,), jnp.int32),
    )


def make_arena_state(num_cars: int,
                     mutators: MutatorConfig | None = None,
                     game_mode: str = "soccar") -> ArenaState:
    return ArenaState(
        cars=make_cars_state(num_cars, mutators),
        ball=make_ball_state(),
        pads=make_pads_state(game_mode),
        tick_count=jnp.zeros((), jnp.int32),
        goal_scored=jnp.zeros((), bool),
        step_bump=jnp.zeros((num_cars,), bool),
        step_bumped=jnp.zeros((num_cars,), bool),
        step_demo=jnp.zeros((num_cars,), bool),
        step_demoed=jnp.zeros((num_cars,), bool),
    )
