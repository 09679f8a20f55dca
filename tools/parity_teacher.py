"""Teacher-forced single-tick parity: at every tick t the JAX engine is
reset to the ORACLE's state at t-1, steps once, and is compared with the
oracle at t.  This separates per-tick mechanism error from chaotic
amplification of earlier micro-differences — a scenario whose freerun
diverges but whose teacher-forced ticks all match has correct physics and
merely amplifies float noise (reference: two builds of the reference
itself diverge the same way).

Usage: python -m tools.parity_teacher <scenario> [T] [--from=t0] [--to=t1]
"""
import sys

import numpy as np

from tools import parity, parity_battery


def run(name: str, T: int = 240, t0: int = 1, t1: int = None,
        quiet: bool = False, backend: str = "xla"):
    import jax
    import jax.numpy as jnp

    from reinforcement_learning_tpu.physics import step as stepmod

    sc = parity_battery.scenarios(T)[name]
    ref = parity.run_oracle([sc])[0]
    gcf = parity.car_trace_field

    params = stepmod.ArenaParams(num_cars=sc.n_cars, use_mesh=True,
                                 dynamic_wheel_rays=(backend == "ctick"))
    phys0 = stepmod.make_physics_state(params)
    teams = jnp.asarray([c.team for c in sc.cars], jnp.int32)

    if backend == "ctick":
        # the megakernel tick body, jitted directly (same math as the
        # pallas kernel, CPU-friendly) — isolates the KERNEL's per-tick
        # mechanism error from chaotic amplification
        from reinforcement_learning_tpu.ops import ctick as ctickmod
        from reinforcement_learning_tpu.ops import pack
        k = ctickmod.make_consts(params,
                                 tuple(int(c.team) for c in sc.cars))
        ridx = jnp.zeros((sc.n_cars, 1, 1), jnp.int32)

        @jax.jit
        def tick(phys, controls):
            batched = jax.tree.map(lambda a: a[None], phys)
            d = pack.to_components(batched, S=(1, 1))
            nc = tuple(controls[:, c].reshape(sc.n_cars, 1, 1)
                       for c in range(8))
            d = ctickmod.step(k, d, nc, ridx, 1, 0)
            out = pack.from_components(d, 1)
            return jax.tree.map(lambda a: a[0], out)
    else:
        @jax.jit
        def tick(phys, controls):
            cars = phys.arena.cars.replace(controls=controls)
            phys = phys.replace(arena=phys.arena.replace(cars=cars))
            return stepmod.arena_tick(phys, teams, jax.random.PRNGKey(0),
                                      params)

    def load_state(t, carry=None):
        """PhysicsState from the oracle trace at tick t (post-tick t).

        ``carry``: previous teacher-tick output PhysicsState — its
        NON-observable internal state (wheel drive values, boost timers,
        flip torque, auto-flip state, world-contact latch) is kept, so
        only the oracle-observable fields are forced.  Without it those
        fields reset cold every tick.
        """
        f = lambda v: jnp.asarray(v, jnp.float32)
        rot = np.stack([np.stack([gcf(ref["cars"], "fwd")[t, c],
                                  gcf(ref["cars"], "right")[t, c],
                                  gcf(ref["cars"], "up")[t, c]], axis=-1)
                        for c in range(sc.n_cars)])
        base = carry if carry is not None else phys0
        cars = base.arena.cars.replace(
            pos=f(gcf(ref["cars"], "pos")[t]),
            rot=f(rot),
            vel=f(gcf(ref["cars"], "vel")[t]),
            ang_vel=f(gcf(ref["cars"], "ang_vel")[t]),
            boost=f(gcf(ref["cars"], "boost")[t]),
            is_on_ground=jnp.asarray(
                gcf(ref["cars"], "is_on_ground")[t] > 0.5),
            has_jumped=jnp.asarray(gcf(ref["cars"], "has_jumped")[t] > 0.5),
            has_double_jumped=jnp.asarray(
                gcf(ref["cars"], "has_double_jumped")[t] > 0.5),
            has_flipped=jnp.asarray(
                gcf(ref["cars"], "has_flipped")[t] > 0.5),
            jump_time=f(gcf(ref["cars"], "jump_time")[t]),
            flip_time=f(gcf(ref["cars"], "flip_time")[t]),
            is_jumping=jnp.asarray(gcf(ref["cars"], "is_jumping")[t] > 0.5),
            is_flipping=jnp.asarray(
                gcf(ref["cars"], "is_flipping")[t] > 0.5),
            air_time_since_jump=f(
                gcf(ref["cars"], "air_time_since_jump")[t]),
            handbrake_val=f(gcf(ref["cars"], "handbrake_val")[t]),
            last_controls=jnp.asarray(sc.controls[t], jnp.float32),
        )
        ball = base.arena.ball.replace(pos=f(ref["ball"][t, :3]),
                                       vel=f(ref["ball"][t, 3:6]),
                                       ang_vel=f(ref["ball"][t, 6:9]))
        return base.replace(arena=base.arena.replace(cars=cars, ball=ball))

    t1 = t1 if t1 is not None else T
    worst = {"ball_pos": 0.0, "ball_vel": 0.0, "car_pos": 0.0,
             "car_vel": 0.0, "car_ang": 0.0}
    worst_t = dict.fromkeys(worst, -1)
    carry = None
    for t in range(max(t0, 1), min(t1, T)):
        phys = load_state(t - 1, carry)
        out = tick(phys, jnp.asarray(sc.controls[t], jnp.float32))
        carry = out
        a = jax.device_get(out.arena)
        errs = {
            "ball_pos": np.abs(a.ball.pos - ref["ball"][t, :3]).max(),
            "ball_vel": np.abs(a.ball.vel - ref["ball"][t, 3:6]).max(),
            "car_pos": np.abs(a.cars.pos
                              - gcf(ref["cars"], "pos")[t]).max(),
            "car_vel": np.abs(a.cars.vel
                              - gcf(ref["cars"], "vel")[t]).max(),
            "car_ang": np.abs(a.cars.ang_vel
                              - gcf(ref["cars"], "ang_vel")[t]).max(),
        }
        for k, v in errs.items():
            if v > worst[k]:
                worst[k], worst_t[k] = float(v), t
        if not quiet and (errs["ball_vel"] > 0.4 or errs["car_vel"] > 0.4):
            print(f"t={t:4d} " + " ".join(f"{k}={v:8.3f}"
                                          for k, v in errs.items()))
    print(f"TEACHER {name}: worst single-tick errors over "
          f"[{max(t0,1)},{min(t1,T)}):")
    for k in worst:
        print(f"  {k:9s} {worst[k]:9.4f}  (t={worst_t[k]})")
    return worst


if __name__ == "__main__":
    import jax
    jax.config.update("jax_platforms", "cpu")
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    kw = {}
    for a in sys.argv[1:]:
        if a.startswith("--from="):
            kw["t0"] = int(a.split("=")[1])
        if a.startswith("--to="):
            kw["t1"] = int(a.split("=")[1])
        if a == "--ctick":
            kw["backend"] = "ctick"
    run(args[0], int(args[1]) if len(args) > 1 else 240, **kw)
