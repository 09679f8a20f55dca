"""Megakernel (pallas/ctick) parity debugging instrument.

Three modes, all against the compiled reference oracle:

  python -m tools.parity_kdebug <scenario> [T] [--tpu]
      per-tick field dump of the MEGAKERNEL freerun vs the oracle
      (parity_debug's kernel twin) — finds the divergence tick.

  python -m tools.parity_kdebug <scenario> T --oracle-mf --from=A --to=B
      run the oracle with RS_ORACLE_DUMP=1 and print every persistent-
      manifold contact point in ticks [A, B] — the ground-truth contact
      set at the divergence tick.

  python -m tools.parity_kdebug <scenario> T --rows=t [--car=N]
      teacher-force BOTH engines' car-world narrowphase to the oracle's
      state after tick t-1 and print their contact row sets side by side:
      the kernel's facet+corner candidates/retained slots
      (ctick._facet_box_manifold) vs the XLA engine's mesh-manifold+plane
      rows (contacts.resolve_car_world_mesh internals).  --ball prints
      the ball manifolds instead.
"""
import os
import subprocess
import sys
import tempfile

import numpy as np

from tools import parity, parity_battery


def run_ctick(sc):
    """Freerun the ctick component engine (the megakernel body) directly
    under jit — same math as the pallas kernel, CPU-friendly."""
    import jax
    import jax.numpy as jnp

    from reinforcement_learning_tpu.ops import ctick, pack
    from reinforcement_learning_tpu.physics import step as stepmod

    params = stepmod.ArenaParams(num_cars=sc.n_cars, use_mesh=True,
                                 dynamic_wheel_rays=True)
    teams = tuple(c.team for c in sc.cars)
    phys = parity._scenario_phys(sc, params)
    batched = jax.tree.map(lambda a: jnp.asarray(a)[None], phys)
    k = ctick.make_consts(params, teams)
    ridx = jnp.zeros((sc.n_cars, 1, 1), jnp.int32)

    @jax.jit
    def one(d, nc):
        return ctick.step(k, d, nc, ridx, 1, 0)

    d = pack.to_components(batched, S=(1, 1))
    trace = {"ball": [], "cars": []}
    for t in range(sc.n_ticks):
        u = np.asarray(sc.controls[t], np.float32)  # (C, 8)
        nc = tuple(jnp.asarray(u[:, c]).reshape(sc.n_cars, 1, 1)
                   for c in range(8))
        d = one(d, nc)
        host = jax.device_get(pack.from_components(d, 1))
        one_arena = jax.tree.map(lambda a: a[0], host.arena)
        b, cr = parity._trace_rows(one_arena)
        trace["ball"].append(b)
        trace["cars"].append(cr)
    return {"ball": np.stack(trace["ball"]),
            "cars": np.stack(trace["cars"])}


def freerun(name, T, fields, backend="pallas"):
    ref = parity.run_oracle([parity_battery.scenarios(T)[name]])[0]
    if backend == "ctick":
        ours = run_ctick(parity_battery.scenarios(T)[name])
    else:
        ours = parity.run_jax_pallas([parity_battery.scenarios(T)[name]])[0]
    gcf = parity.car_trace_field
    car = 0
    for t in range(T):
        parts = [f"t={t:4d}"]
        for f in fields:
            if f.startswith("ball_"):
                sl = {"ball_pos": slice(0, 3), "ball_vel": slice(3, 6),
                      "ball_ang": slice(6, 9)}[f]
                rv, ov = ref["ball"][t, sl], ours["ball"][t, sl]
            else:
                rv = np.atleast_1d(gcf(ref["cars"], f)[t, car])
                ov = np.atleast_1d(gcf(ours["cars"], f)[t, car])
            err = np.abs(rv - ov).max()
            parts.append(f"{f}: ref={np.round(rv, 3)} jax={np.round(ov, 3)} "
                         f"err={err:.3f}")
        print("  ".join(parts))


def oracle_mf(name, T, t0, t1):
    sc = parity_battery.scenarios(T)[name]
    cmf = parity.default_cmf_dir()
    with tempfile.TemporaryDirectory() as td:
        fin = os.path.join(td, "in.bin")
        fout = os.path.join(td, "out.bin")
        with open(fin, "wb") as f:
            f.write(parity._pack_scenarios([sc]))
        env = dict(os.environ, RS_ORACLE_DUMP="1")
        r = subprocess.run([parity.ORACLE_BIN, fin, fout, cmf],
                           capture_output=True, text=True, env=env,
                           timeout=600)
        for line in r.stderr.splitlines():
            if not line.startswith("MF t="):
                continue
            t = int(line.split()[1].split("=")[1])
            if t0 <= t <= t1:
                print(line)


def _phys_from_oracle(ref, sc, t, params):
    """PhysicsState loaded from the oracle trace after tick t (cold
    internals — good enough for narrowphase row dumps, which depend only
    on pose)."""
    import jax.numpy as jnp

    from reinforcement_learning_tpu.physics import step as stepmod
    gcf = parity.car_trace_field
    phys = stepmod.make_physics_state(params)
    arena = phys.arena
    f = lambda v: jnp.asarray(v, jnp.float32)
    rot = np.stack([np.stack([gcf(ref["cars"], "fwd")[t, c],
                              gcf(ref["cars"], "right")[t, c],
                              gcf(ref["cars"], "up")[t, c]], axis=-1)
                    for c in range(sc.n_cars)])
    cars = arena.cars.replace(
        pos=f(gcf(ref["cars"], "pos")[t]), rot=f(rot),
        vel=f(gcf(ref["cars"], "vel")[t]),
        ang_vel=f(gcf(ref["cars"], "ang_vel")[t]))
    ball = arena.ball.replace(pos=f(ref["ball"][t, :3]),
                              vel=f(ref["ball"][t, 3:6]),
                              ang_vel=f(ref["ball"][t, 6:9]))
    return phys.replace(arena=arena.replace(cars=cars, ball=ball))


def rows(name, T, t, car=0, ball=False):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from reinforcement_learning_tpu import constants as C
    from reinforcement_learning_tpu.ops import ctick, pack
    from reinforcement_learning_tpu.physics import step as stepmod
    from reinforcement_learning_tpu.physics import world as worldmod

    sc = parity_battery.scenarios(T)[name]
    ref = parity.run_oracle([sc])[0]
    params = stepmod.ArenaParams(num_cars=sc.n_cars, use_mesh=True,
                                 dynamic_wheel_rays=True)
    teams = tuple(c.team for c in sc.cars)
    phys = _phys_from_oracle(ref, sc, t, params)
    k = ctick.make_consts(params, teams)

    batched = jax.tree.map(lambda a: jnp.asarray(a)[None], phys)
    st = pack.to_components(batched, S=(1, 1))

    np.set_printoptions(precision=4, suppress=True)
    if ball:
        _ball_rows(k, st, phys, params)
        return

    he = k.half_extents
    off = k.hitbox_offset
    brk = C.CONTACT_BREAK_FRAC * (
        float(np.linalg.norm(np.asarray(he)))
        + float(np.linalg.norm(np.asarray(off))))
    print(f"== kernel facet/corner manifold (brk={brk:.3f}) after "
          f"oracle tick {t} ==")
    slots = ctick._facet_box_manifold(k, _car_slice(st, car), brk)
    for i, (n, sup, dist, occ) in enumerate(slots):
        if bool(np.asarray(occ).ravel()[0]):
            print(f"  slot{i}: n={_v(n)} sup={_v(sup)} "
                  f"dist={float(np.asarray(dist).ravel()[0]):.4f}")

    print("== XLA mesh manifold + plane rows ==")
    _xla_car_rows(phys, params, car)


def _car_slice(st, car):
    """Slice car ``car`` out of a (C,)+S component state dict (keeps the
    (1,)+S leading shape the ctick helpers expect)."""
    import jax
    import jax.numpy as jnp
    return jax.tree.map(
        lambda a: a[car:car + 1] if a.ndim >= 1 and a.shape[0] > 1 else a,
        st)


def _v(vec):
    return np.round(np.array([float(np.asarray(c).ravel()[0])
                              for c in vec]), 4)


def _xla_car_rows(phys, params, car):
    import jax.numpy as jnp

    from reinforcement_learning_tpu import constants as C
    from reinforcement_learning_tpu import maths as m
    from reinforcement_learning_tpu.physics import arena_geom as geom
    from reinforcement_learning_tpu.physics import box_tri, contacts
    from reinforcement_learning_tpu.physics import world as worldmod
    from reinforcement_learning_tpu.physics.mesh import (
        _closest_point_triangle, compact_sel)

    grid = worldmod.get_grid(params.game_mode)
    cars = phys.arena.cars
    half_extents = jnp.asarray(params.car_config.hitbox_size,
                               jnp.float32) / 2
    hitbox_offset = jnp.asarray(params.car_config.hitbox_offset, jnp.float32)
    he = half_extents
    box_center = cars.pos + m.rotate(cars.rot, hitbox_offset)
    safe_margin = min(C.MESH_COLLISION_MARGIN,
                      0.1 * float(np.min(np.asarray(half_extents))))
    brk = C.CONTACT_BREAK_FRAC * (
        float(np.linalg.norm(np.asarray(half_extents)))
        + float(np.linalg.norm(np.asarray(hitbox_offset, np.float32))))
    idx = grid.candidates(box_center)
    a, ab, ac, tri_n = grid._gather(idx)
    cut = brk + safe_margin + 0.5
    cp0 = _closest_point_triangle(box_center[:, None, :], a, ab, ac)
    d0 = m.norm(box_center[:, None, :] - cp0)
    sphere_ok = d0 - float(np.linalg.norm(np.asarray(half_extents))) <= cut
    plane_dist = jnp.abs(jnp.sum((box_center[:, None, :] - a) * tri_n, -1))
    proj = jnp.einsum('cki,cij->ckj', tri_n, cars.rot)
    r_eff = jnp.sum(jnp.abs(proj) * he, axis=-1)
    plane_ok = plane_dist - r_eff <= cut
    near = (idx >= 0) & sphere_ok & plane_ok
    selk, ok = compact_sel(near, contacts.MESH_COMPACT_K_CAR)
    idx = jnp.where(ok, jnp.take_along_axis(idx, selk, -1), -1)
    a, ab, ac, _ = grid._gather(idx)
    n_k, pt_k, dist_k = box_tri.box_triangle_contact(
        box_center[:, None, :], cars.rot[:, None], he,
        C.MESH_COLLISION_MARGIN, safe_margin, a, a + ab, a + ac)
    act_k = (idx >= 0) & (dist_k < brk)
    pos_a_k = pt_k + n_k * dist_k[..., None]
    local_a = pos_a_k - cars.pos[:, None, :]
    slot = contacts.manifold_insert(local_a, dist_k, act_k)
    mesh_act = np.asarray(slot >= 0)
    sel = jnp.maximum(slot, 0)
    idx4 = jnp.where(slot >= 0, jnp.take_along_axis(idx, sel, axis=1), 0)
    n4 = jnp.take_along_axis(n_k, sel[..., None], axis=1)
    pt4 = jnp.take_along_axis(pt_k, sel[..., None], axis=1)
    mesh_dist = jnp.take_along_axis(dist_k, sel, axis=1)
    mesh_n, _ = grid.adjust_internal_edges(idx4, n4, pt4, mesh_dist)
    mesh_pt = jnp.take_along_axis(pos_a_k, sel[..., None], axis=1)

    cc = car
    # full candidate list first
    print(" candidates (pre-retention):")
    for kk in range(np.asarray(idx).shape[1]):
        if bool(np.asarray(act_k)[cc, kk]):
            print(f"  tri{int(np.asarray(idx)[cc, kk]):5d}: "
                  f"n={np.round(np.asarray(n_k)[cc, kk], 4)} "
                  f"pt={np.round(np.asarray(pt_k)[cc, kk], 2)} "
                  f"dist={float(np.asarray(dist_k)[cc, kk]):.4f}")
    print(" retained slots (post internal-edge adjust):")
    for s in range(4):
        if mesh_act[cc, s]:
            print(f"  slot{s}: n={np.round(np.asarray(mesh_n)[cc, s], 4)} "
                  f"ptA={np.round(np.asarray(mesh_pt)[cc, s], 2)} "
                  f"dist={float(np.asarray(mesh_dist)[cc, s]):.4f}")
    pn, pd = geom.get_planes(params.game_mode)
    true_plane = geom.get_true_plane_mask(params.game_mode)
    keep = np.flatnonzero(np.asarray(true_plane))
    pn = pn[keep]
    pd = pd[keep]
    ldir = -jnp.einsum('cji,pj->cpi', cars.rot, pn)
    sup_local = jnp.where(ldir >= 0.0, he, -he)
    sup = box_center[:, None, :] + jnp.einsum('cij,cpj->cpi', cars.rot,
                                              sup_local)
    sup_d = m.dot(sup, jnp.broadcast_to(pn, sup.shape)) + pd
    print(" plane rows:")
    for p in range(pn.shape[0]):
        d = float(np.asarray(sup_d)[cc, p])
        if d < brk:
            print(f"  plane n={np.round(np.asarray(pn)[p], 4)} "
                  f"sup={np.round(np.asarray(sup)[cc, p], 2)} dist={d:.4f}")


def _ball_rows(k, st, phys, params):
    import jax.numpy as jnp

    from reinforcement_learning_tpu import constants as C
    from reinforcement_learning_tpu import maths as m
    from reinforcement_learning_tpu.ops import ctick
    from reinforcement_learning_tpu.physics import contacts
    from reinforcement_learning_tpu.physics import world as worldmod
    from reinforcement_learning_tpu.physics.mesh import (
        _closest_point_triangle, compact_sel)

    mut = params.mutators
    radius = mut.ball_radius
    break_gap = C.CONTACT_BREAK_FRAC * (radius + C.SPHERE_BOUND_EXTRA)
    print(f"== kernel facet sphere manifold (break_gap={break_gap:.3f}) ==")
    bp = st['ball_pos'] if 'ball_pos' in st else None
    if bp is None:
        # component state names the ball fields 'bpos' etc; find them
        cand = [kk for kk in st if 'ball' in kk and 'pos' in kk]
        bp = st[cand[0]]
    slots = ctick._facet_sphere_manifold(k, bp, radius, break_gap)
    for i, (n, gap, occ) in enumerate(slots):
        if bool(np.asarray(occ).ravel()[0]):
            print(f"  slot{i}: n={_v(n)} "
                  f"gap={float(np.asarray(gap).ravel()[0]):.4f}")

    print("== XLA mesh sphere manifold ==")
    grid = worldmod.get_grid(params.game_mode)
    ball = phys.arena.ball
    idx = grid.candidates(ball.pos)
    a, ab, ac, tri_n = grid._gather(idx)
    cp = _closest_point_triangle(ball.pos[None, :], a, ab, ac)
    delta = ball.pos[None, :] - cp
    dist_c = m.norm(delta)
    near = (idx >= 0) & (dist_c < radius + break_gap + 0.25)
    selk, ok = compact_sel(near, contacts.MESH_COMPACT_K_BALL)
    idx = jnp.where(ok, jnp.take_along_axis(idx, selk, -1), -1)
    cp = jnp.take_along_axis(cp, selk[..., None], -2)
    delta = jnp.take_along_axis(delta, selk[..., None], -2)
    dist_c = jnp.take_along_axis(dist_c, selk, -1)
    tri_n = jnp.take_along_axis(tri_n, selk[..., None], -2)
    side = jnp.sign(jnp.sum(delta * tri_n, axis=-1, keepdims=True))
    side = jnp.where(side == 0, 1.0, side)
    n_mesh = jnp.where(dist_c[:, None] > 1e-6,
                       delta / jnp.maximum(dist_c[:, None], 1e-6),
                       tri_n * side)
    gap_mesh = dist_c - radius
    act_mesh = (idx >= 0) & (gap_mesh < break_gap)
    print(" candidates (pre-retention):")
    for kk in range(np.asarray(idx).shape[0]):
        if bool(np.asarray(act_mesh)[kk]):
            print(f"  tri{int(np.asarray(idx)[kk]):5d}: "
                  f"n_raw={np.round(np.asarray(n_mesh)[kk], 4)} "
                  f"cp={np.round(np.asarray(cp)[kk], 2)} "
                  f"gap={float(np.asarray(gap_mesh)[kk]):.4f}")
    slot = contacts.manifold_insert(-n_mesh * radius, gap_mesh, act_mesh)
    sel = jnp.maximum(slot, 0)
    act4 = np.asarray(slot >= 0)
    idx4 = jnp.where(slot >= 0, idx[sel], 0)
    n4, _ = grid.adjust_internal_edges(idx4, n_mesh[sel], cp[sel],
                                       gap_mesh[sel])
    print(" retained slots (post internal-edge adjust):")
    for s in range(4):
        if act4[s]:
            print(f"  slot{s}: n={np.round(np.asarray(n4)[s], 4)} "
                  f"gap={float(np.asarray(gap_mesh[sel])[s]):.4f}")


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    name = args[0]
    T = int(args[1]) if len(args) > 1 else 240
    t0, t1, row_t, car = 0, T, None, 0
    fields = ["pos", "vel", "ang_vel"]
    for a in sys.argv[1:]:
        if a.startswith("--from="):
            t0 = int(a.split("=")[1])
        if a.startswith("--to="):
            t1 = int(a.split("=")[1])
        if a.startswith("--rows="):
            row_t = int(a.split("=")[1])
        if a.startswith("--car="):
            car = int(a.split("=")[1])
        if a.startswith("--fields="):
            fields = a.split("=")[1].split(",")
    if "--oracle-mf" in sys.argv:
        oracle_mf(name, T, t0, t1)
    elif row_t is not None:
        rows(name, T, row_t, car=car, ball="--ball" in sys.argv)
    else:
        import jax
        if "--tpu" not in sys.argv:
            jax.config.update("jax_platforms", "cpu")
        freerun(name, T, fields,
                backend="ctick" if "--ctick" in sys.argv else "pallas")


if __name__ == "__main__":
    main()
