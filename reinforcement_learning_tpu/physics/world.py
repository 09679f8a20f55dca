"""Arena world-geometry registry — the ``RocketSim::Init`` equivalent.

The reference initializes global collision assets once per process
(``RocketSim::Init(meshDir)``, RocketSim.cpp:70-212: load + hash-verify the
``.cmf`` meshes, build one ``btBvhTriangleMeshShape`` per mesh and the
suspension grids).  Here the equivalent is a per-game-mode baked
:class:`~reinforcement_learning_tpu.physics.mesh.MeshGrid` cached at module
level; the device arrays are closed over by traced physics functions as
constants, so every jitted program shares one copy.

Mode mapping mirrors the reference's mesh selection: soccar, heatseeker and
snowday all collide against the soccar arena; hoops uses its own meshes
(RocketSim.cpp GetArenaCollisionShapes).  No procedural hoops mesh exists
yet, so hoops falls back to the analytic-plane arena (arena_geom).
"""

from __future__ import annotations

_GRIDS: dict = {}
_MESH_DIR: str | None = None


def init(mesh_dir: str | None = None, verify_hashes: bool = False) -> None:
    """Point the registry at a directory of real ``.cmf`` assets (reference:
    RocketSim::Init).  Without it the procedural soccar mesh is used."""
    global _MESH_DIR
    _MESH_DIR = mesh_dir
    _GRIDS.clear()
    if verify_hashes and mesh_dir is not None:
        from reinforcement_learning_tpu.physics import mesh as meshmod
        meshmod.load_arena_mesh(mesh_dir, verify_hashes=True)


def get_grid(game_mode: str = "soccar"):
    """The baked MeshGrid for a game mode (soccar and hoops both have
    procedural arenas; heatseeker/snowday share the soccar mesh, mirroring
    RocketSim.cpp GetArenaCollisionShapes)."""
    key = "hoops" if game_mode == "hoops" else "soccar"
    if key not in _GRIDS:
        import jax

        from reinforcement_learning_tpu.physics import mesh as meshmod
        # get_grid is usually first hit inside a jit trace; the bake must
        # produce concrete (non-tracer) arrays for the cache
        with jax.ensure_compile_time_eval():
            _GRIDS[key] = meshmod.load_arena_mesh(_MESH_DIR, game_mode=key)
    return _GRIDS[key]


def is_procedural() -> bool:
    """True when the registry serves the procedural arena (no real .cmf
    assets configured) — the configuration the megakernel's closed-form
    facet arena models."""
    return _MESH_DIR is None
