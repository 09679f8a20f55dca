"""Parity harness: reference RocketSim (the compiled oracle binary) vs the
JAX engine, tick for tick.

The oracle (tools/oracle/) compiles the reference engine in place from
/root/reference as a black-box golden-trace generator (BASELINE config #1:
seeded trajectory replay).  Scenarios are described as (initial state,
per-tick controls); both engines step them and the traces are compared
with BallState::Matches-style margins (reference: Ball.h:38 — pos 0.8uu,
vel 0.4, angvel 0.02).

Without meshes the reference soccar world is its 4 implicit planes
(floor z=0, ceiling, side walls; Arena.cpp:1060-1100), which the analytic
JAX arena reproduces exactly — so floor/wall/ceiling scenarios compare
engine dynamics, not arena-mesh modeling differences.
"""

from __future__ import annotations

import dataclasses
import os
import struct
import subprocess

import numpy as np

MAGIC = 0x4F52534A
ORACLE_BIN = os.path.join(os.path.dirname(__file__), "oracle", "build",
                          "rs_oracle")
# Chaos-control twin: same sources built with -march=native (FMA
# contraction) — a second valid f32 rounding of the reference itself.
# Built by `sh tools/oracle/build.sh fma`.
ORACLE_BIN_FMA = os.path.join(os.path.dirname(__file__), "oracle",
                              "build-fma", "rs_oracle")

CAR_OUT_FIELDS = [
    "pos", "fwd", "right", "up", "vel", "ang_vel",      # 6x3
    "boost", "is_on_ground", "has_jumped", "has_double_jumped",
    "has_flipped", "is_jumping", "is_flipping", "jump_time", "flip_time",
    "air_time_since_jump", "is_supersonic", "handbrake_val", "is_demoed",
]
CAR_OUT_FLOATS = 6 * 3 + 13


@dataclasses.dataclass
class CarInit:
    team: int = 0
    pos: tuple = (0.0, 0.0, 17.01)
    fwd: tuple = (1.0, 0.0, 0.0)
    right: tuple = (0.0, 1.0, 0.0)
    up: tuple = (0.0, 0.0, 1.0)
    vel: tuple = (0.0, 0.0, 0.0)
    ang_vel: tuple = (0.0, 0.0, 0.0)
    boost: float = 33.3
    is_on_ground: bool = True
    has_jumped: bool = False
    has_double_jumped: bool = False
    has_flipped: bool = False
    flip_rel_torque: tuple = (0.0, 0.0, 0.0)
    jump_time: float = 0.0
    flip_time: float = 0.0
    is_flipping: bool = False
    is_jumping: bool = False
    air_time_since_jump: float = 0.0
    time_spent_boosting: float = 0.0
    supersonic_time: float = 0.0
    handbrake_val: float = 0.0


@dataclasses.dataclass
class Scenario:
    """controls: (n_ticks, n_cars, 8) float array, columns
    throttle steer pitch yaw roll jump boost handbrake."""
    cars: list
    controls: np.ndarray
    ball_pos: tuple = (0.0, 0.0, 93.15)
    ball_vel: tuple = (0.0, 0.0, 0.0)
    ball_ang_vel: tuple = (0.0, 0.0, 0.0)
    game_mode: int = 0

    @property
    def n_cars(self):
        return len(self.cars)

    @property
    def n_ticks(self):
        return self.controls.shape[0]


def _pack_scenarios(scenarios) -> bytes:
    out = [struct.pack("<ii", MAGIC, len(scenarios))]
    for sc in scenarios:
        out.append(struct.pack("<iii", sc.n_cars, sc.n_ticks, sc.game_mode))
        out.append(np.asarray(
            [*sc.ball_pos, *sc.ball_vel, *sc.ball_ang_vel],
            "<f4").tobytes())
        for car in sc.cars:
            out.append(struct.pack("<i", car.team))
            vals = [*car.pos, *car.fwd, *car.right, *car.up, *car.vel,
                    *car.ang_vel, car.boost,
                    float(car.is_on_ground), float(car.has_jumped),
                    float(car.has_double_jumped), float(car.has_flipped),
                    *car.flip_rel_torque, car.jump_time, car.flip_time,
                    float(car.is_flipping), float(car.is_jumping),
                    car.air_time_since_jump, car.time_spent_boosting,
                    car.supersonic_time, car.handbrake_val]
            out.append(np.asarray(vals, "<f4").tobytes())
        ctrl = np.ascontiguousarray(sc.controls, "<f4")
        assert ctrl.shape == (sc.n_ticks, sc.n_cars, 8)
        out.append(ctrl.tobytes())
    return b"".join(out)


def default_cmf_dir() -> str:
    """Writes the procedural soccar mesh as a .cmf the oracle can load
    (the reference refuses to create a soccar arena with no meshes);
    cached under tools/oracle/build/."""
    from reinforcement_learning_tpu.physics import mesh as meshmod
    d = os.path.join(os.path.dirname(ORACLE_BIN), "cmf")
    path = os.path.join(d, "soccar.cmf")
    verts, tris = meshmod.build_soccar_mesh()
    # The reference feeds .cmf coordinates straight into the bullet world
    # with NO unit conversion (CollisionMeshFile::MakeBulletMesh,
    # Arena::_AddStaticCollisionShape) — real assets are stored in BT
    # units, so the oracle's copy must be too (1 bt = 50 uu).
    verts = verts / 50.0
    # regenerate when the procedural mesh changes (hash mismatch)
    if (not os.path.exists(path)
            or meshmod.cmf_hash(*meshmod.read_cmf(path))
            != meshmod.cmf_hash(verts, tris)):
        os.makedirs(d, exist_ok=True)
        meshmod.write_cmf(path, verts, tris)
    return d


def run_oracle(scenarios, workdir=None, cmf_dir=None, oracle_bin=None):
    """Returns a list of per-scenario dicts:
    {"ball": (T, 9), "cars": (T, C, CAR_OUT_FLOATS)}."""
    import tempfile
    oracle_bin = oracle_bin or ORACLE_BIN
    if not os.path.exists(oracle_bin):
        raise FileNotFoundError(
            f"{oracle_bin} not built; run tools/oracle/build.sh"
            + (" fma" if oracle_bin == ORACLE_BIN_FMA else ""))
    if cmf_dir is None:
        cmf_dir = default_cmf_dir()
    with tempfile.TemporaryDirectory(dir=workdir) as td:
        fin = os.path.join(td, "in.bin")
        fout = os.path.join(td, "out.bin")
        with open(fin, "wb") as f:
            f.write(_pack_scenarios(scenarios))
        cmd = [oracle_bin, fin, fout]
        if cmf_dir:
            cmd.append(cmf_dir)
        subprocess.run(cmd, check=True, timeout=600)
        raw = np.fromfile(fout, "<f4")
    results = []
    off = 0
    for sc in scenarios:
        per_tick = 9 + sc.n_cars * CAR_OUT_FLOATS
        block = raw[off:off + sc.n_ticks * per_tick]
        off += sc.n_ticks * per_tick
        block = block.reshape(sc.n_ticks, per_tick)
        results.append({
            "ball": block[:, :9],
            "cars": block[:, 9:].reshape(sc.n_ticks, sc.n_cars,
                                         CAR_OUT_FLOATS),
        })
    return results


def car_trace_field(cars: np.ndarray, name: str) -> np.ndarray:
    """Slice one named field out of a (T, C, CAR_OUT_FLOATS) car trace."""
    i = CAR_OUT_FIELDS.index(name)
    if i < 6:
        return cars[..., 3 * i:3 * i + 3]
    return cars[..., 18 + (i - 6)]


# ---------------------------------------------------------------------------
# JAX engine side


def _scenario_phys(sc: Scenario, params):
    """Initial PhysicsState for one scenario."""
    import jax.numpy as jnp

    from reinforcement_learning_tpu.physics import step as stepmod

    phys = stepmod.make_physics_state(params)
    arena = phys.arena
    f = lambda v: jnp.asarray(v, jnp.float32)
    rot = np.stack([np.stack([c.fwd, c.right, c.up], axis=-1)
                    for c in sc.cars])
    cars = arena.cars.replace(
        pos=f([c.pos for c in sc.cars]),
        rot=f(rot),
        vel=f([c.vel for c in sc.cars]),
        ang_vel=f([c.ang_vel for c in sc.cars]),
        boost=f([c.boost for c in sc.cars]),
        is_on_ground=jnp.asarray([c.is_on_ground for c in sc.cars], bool),
        has_jumped=jnp.asarray([c.has_jumped for c in sc.cars], bool),
        has_double_jumped=jnp.asarray(
            [c.has_double_jumped for c in sc.cars], bool),
        has_flipped=jnp.asarray([c.has_flipped for c in sc.cars], bool),
        flip_rel_torque=f([c.flip_rel_torque for c in sc.cars]),
        jump_time=f([c.jump_time for c in sc.cars]),
        flip_time=f([c.flip_time for c in sc.cars]),
        is_flipping=jnp.asarray([c.is_flipping for c in sc.cars], bool),
        is_jumping=jnp.asarray([c.is_jumping for c in sc.cars], bool),
        air_time_since_jump=f([c.air_time_since_jump for c in sc.cars]),
        time_spent_boosting=f([c.time_spent_boosting for c in sc.cars]),
        supersonic_time=f([c.supersonic_time for c in sc.cars]),
        handbrake_val=f([c.handbrake_val for c in sc.cars]),
    )
    ball = arena.ball.replace(pos=f(sc.ball_pos), vel=f(sc.ball_vel),
                              ang_vel=f(sc.ball_ang_vel))
    return phys.replace(arena=arena.replace(cars=cars, ball=ball))


def _trace_rows(arena):
    """(ball_row (9,), car_rows (C, CAR_OUT_FLOATS)) from a host arena."""
    ball_row = np.concatenate([arena.ball.pos, arena.ball.vel,
                               arena.ball.ang_vel])
    c = arena.cars
    flat = np.concatenate([
        c.pos, c.rot[..., 0], c.rot[..., 1], c.rot[..., 2],
        c.vel, c.ang_vel,
        c.boost[:, None], c.is_on_ground[:, None],
        c.has_jumped[:, None], c.has_double_jumped[:, None],
        c.has_flipped[:, None], c.is_jumping[:, None],
        c.is_flipping[:, None], c.jump_time[:, None],
        c.flip_time[:, None], c.air_time_since_jump[:, None],
        c.is_supersonic[:, None], c.handbrake_val[:, None],
        c.is_demoed[:, None]], axis=-1, dtype=np.float32)
    return ball_row, flat


def run_jax_pallas(scenarios):
    """Steps the PALLAS megakernel engine (ops/ctick via pallas_step, the
    default TPU training path: facet arena + dynamic wheel rays) over the
    scenarios, returning traces in run_oracle layout.  Scenarios are
    batched into one kernel env-axis per (n_cars, teams) signature;
    interpret mode is used off-TPU."""
    import jax
    import jax.numpy as jnp

    from reinforcement_learning_tpu.ops import pallas_step
    from reinforcement_learning_tpu.physics import step as stepmod

    results = [None] * len(scenarios)
    groups = {}
    for idx, sc in enumerate(scenarios):
        sig = (sc.n_cars, tuple(c.team for c in sc.cars), sc.n_ticks)
        groups.setdefault(sig, []).append(idx)

    interpret = jax.devices()[0].platform == "cpu"
    for (n_cars, teams, n_ticks), idxs in groups.items():
        params = stepmod.ArenaParams(num_cars=n_cars, use_mesh=True,
                                     dynamic_wheel_rays=True)
        phys_list = [_scenario_phys(scenarios[i], params) for i in idxs]
        phys = jax.tree.map(lambda *xs: jnp.stack(xs), *phys_list)
        E = len(idxs)
        respawn = jnp.zeros((E, n_cars), jnp.int32)

        def tick(phys, controls):
            return pallas_step.pallas_arena_step(
                phys, controls, respawn, params=params, teams=teams,
                tick_skip=1, action_delay=0, interpret=interpret)

        traces = [{"ball": [], "cars": []} for _ in idxs]
        for t in range(n_ticks):
            u = jnp.stack([jnp.asarray(scenarios[i].controls[t],
                                       jnp.float32) for i in idxs])
            phys = tick(phys, u)
            host = jax.device_get(phys.arena)
            for e in range(E):
                one = jax.tree.map(lambda a: a[e], host)
                b, cr = _trace_rows(one)
                traces[e]["ball"].append(b)
                traces[e]["cars"].append(cr)
        for e, i in enumerate(idxs):
            results[i] = {"ball": np.stack(traces[e]["ball"]),
                          "cars": np.stack(traces[e]["cars"])}
    return results


def run_jax(scenario: Scenario):
    """Steps the JAX engine over the scenario, returning traces in the
    same layout as run_oracle."""
    import jax
    import jax.numpy as jnp

    from reinforcement_learning_tpu.physics import step as stepmod

    sc = scenario
    # RLT_NO_MESH=1: collide against the analytic planes instead of the
    # mesh (isolates mesh-induced divergence in debugging)
    params = stepmod.ArenaParams(
        num_cars=sc.n_cars, use_mesh=not os.environ.get("RLT_NO_MESH"))
    phys = stepmod.make_physics_state(params)
    arena = phys.arena

    f = lambda v: jnp.asarray(v, jnp.float32)
    rot = np.stack([np.stack([c.fwd, c.right, c.up], axis=-1)
                    for c in sc.cars])  # columns fwd/right/up
    cars = arena.cars.replace(
        pos=f([c.pos for c in sc.cars]),
        rot=f(rot),
        vel=f([c.vel for c in sc.cars]),
        ang_vel=f([c.ang_vel for c in sc.cars]),
        boost=f([c.boost for c in sc.cars]),
        is_on_ground=jnp.asarray([c.is_on_ground for c in sc.cars], bool),
        has_jumped=jnp.asarray([c.has_jumped for c in sc.cars], bool),
        has_double_jumped=jnp.asarray(
            [c.has_double_jumped for c in sc.cars], bool),
        has_flipped=jnp.asarray([c.has_flipped for c in sc.cars], bool),
        flip_rel_torque=f([c.flip_rel_torque for c in sc.cars]),
        jump_time=f([c.jump_time for c in sc.cars]),
        flip_time=f([c.flip_time for c in sc.cars]),
        is_flipping=jnp.asarray([c.is_flipping for c in sc.cars], bool),
        is_jumping=jnp.asarray([c.is_jumping for c in sc.cars], bool),
        air_time_since_jump=f([c.air_time_since_jump for c in sc.cars]),
        time_spent_boosting=f([c.time_spent_boosting for c in sc.cars]),
        supersonic_time=f([c.supersonic_time for c in sc.cars]),
        handbrake_val=f([c.handbrake_val for c in sc.cars]),
    )
    ball = arena.ball.replace(pos=f(sc.ball_pos), vel=f(sc.ball_vel),
                              ang_vel=f(sc.ball_ang_vel))
    phys = phys.replace(arena=arena.replace(cars=cars, ball=ball))
    teams = jnp.asarray([c.team for c in sc.cars], jnp.int32)

    @jax.jit
    def tick(phys, controls):
        cars = phys.arena.cars.replace(controls=controls)
        phys = phys.replace(arena=phys.arena.replace(cars=cars))
        return stepmod.arena_tick(phys, teams, jax.random.PRNGKey(0), params)

    ball_rows, car_rows = [], []
    # oracle control order: thr steer pitch yaw roll jump boost handbrake;
    # engine control vector order (envs/actions.py): thr steer pitch yaw
    # roll jump boost handbrake — identical.
    for t in range(sc.n_ticks):
        phys = tick(phys, jnp.asarray(sc.controls[t], jnp.float32))
        a = jax.device_get(phys.arena)
        ball_rows.append(np.concatenate(
            [a.ball.pos, a.ball.vel, a.ball.ang_vel]))
        c = a.cars
        flat = np.concatenate([
            c.pos, c.rot[..., 0], c.rot[..., 1], c.rot[..., 2],
            c.vel, c.ang_vel,
            c.boost[:, None], c.is_on_ground[:, None],
            c.has_jumped[:, None], c.has_double_jumped[:, None],
            c.has_flipped[:, None], c.is_jumping[:, None],
            c.is_flipping[:, None], c.jump_time[:, None],
            c.flip_time[:, None], c.air_time_since_jump[:, None],
            c.is_supersonic[:, None], c.handbrake_val[:, None],
            c.is_demoed[:, None]], axis=-1, dtype=np.float32)
        car_rows.append(flat)
    return {"ball": np.stack(ball_rows), "cars": np.stack(car_rows)}
