"""Byte-faithful re-declaration of the official RLBot v1 ctypes packet
structures (``rlbot.utils.structures.game_data_struct`` /
``field_info_struct`` of the public ``rlbot`` package — the structures
the real framework hands every python agent's ``get_output``).

The ``rlbot`` package cannot be installed in this environment (no
network), so deployment tests build REAL ctypes instances from these
declarations, round-trip them through raw bytes
(``GameTickPacket.from_buffer_copy``), and drive
``deploy/rlbot_packet_agent`` with them — exercising the exact memory
layout the live framework uses instead of duck-typed stand-ins.
Field names, types, and order mirror the rlbot source (GameTickPacket's
ctypes mirror of the flatbuffers packet; reference consumer:
src/RLBotClient.cpp:62-139, rlbot/CppPythonAgent.py:25-38).
"""

import ctypes
from ctypes import (POINTER, Structure, c_bool, c_float, c_int, c_ubyte,
                    c_wchar)

MAX_PLAYERS = 64
MAX_BOOSTS = 50
MAX_TILES = 200
MAX_TEAMS = 2
MAX_NAME_LENGTH = 32
MAX_GOALS = 200


class Vector3(Structure):
    _fields_ = [("x", c_float), ("y", c_float), ("z", c_float)]


class Rotator(Structure):
    _fields_ = [("pitch", c_float), ("yaw", c_float), ("roll", c_float)]


class Physics(Structure):
    _fields_ = [("location", Vector3), ("rotation", Rotator),
                ("velocity", Vector3), ("angular_velocity", Vector3)]


class ScoreInfo(Structure):
    _fields_ = [("score", c_int), ("goals", c_int), ("own_goals", c_int),
                ("assists", c_int), ("saves", c_int), ("shots", c_int),
                ("demolitions", c_int)]


class BoxShape(Structure):
    _fields_ = [("length", c_float), ("width", c_float),
                ("height", c_float)]


class SphereShape(Structure):
    _fields_ = [("diameter", c_float)]


class CylinderShape(Structure):
    _fields_ = [("diameter", c_float), ("height", c_float)]


class CollisionShape(Structure):
    _fields_ = [("type", c_int), ("box", BoxShape),
                ("sphere", SphereShape), ("cylinder", CylinderShape)]


class Touch(Structure):
    _fields_ = [("player_name", c_wchar * MAX_NAME_LENGTH),
                ("time_seconds", c_float), ("hit_location", Vector3),
                ("hit_normal", Vector3), ("team", c_int),
                ("player_index", c_int)]


class DropShotInfo(Structure):
    _fields_ = [("absorbed_force", c_float), ("damage_index", c_int),
                ("force_accum_recent", c_float)]


class BallInfo(Structure):
    _fields_ = [("physics", Physics), ("latest_touch", Touch),
                ("drop_shot_info", DropShotInfo),
                ("collision_shape", CollisionShape)]


class PlayerInfo(Structure):
    _fields_ = [("physics", Physics), ("score_info", ScoreInfo),
                ("is_demolished", c_bool), ("has_wheel_contact", c_bool),
                ("is_super_sonic", c_bool), ("is_bot", c_bool),
                ("jumped", c_bool), ("double_jumped", c_bool),
                ("name", c_wchar * MAX_NAME_LENGTH), ("team", c_ubyte),
                ("boost", c_int), ("hitbox", BoxShape),
                ("hitbox_offset", Vector3), ("spawn_id", c_int)]


class BoostPadState(Structure):
    _fields_ = [("is_active", c_bool), ("timer", c_float)]


class TileInfo(Structure):
    _fields_ = [("tile_state", c_int)]


class TeamInfo(Structure):
    _fields_ = [("team_index", c_int), ("score", c_int)]


class GameInfo(Structure):
    _fields_ = [("seconds_elapsed", c_float),
                ("game_time_remaining", c_float),
                ("is_overtime", c_bool), ("is_unlimited_time", c_bool),
                ("is_round_active", c_bool), ("is_kickoff_pause", c_bool),
                ("is_match_ended", c_bool), ("world_gravity_z", c_float),
                ("game_speed", c_float), ("frame_num", c_int)]


class GameTickPacket(Structure):
    _fields_ = [("game_cars", PlayerInfo * MAX_PLAYERS),
                ("num_cars", c_int),
                ("game_boosts", BoostPadState * MAX_BOOSTS),
                ("num_boost", c_int),
                ("game_ball", BallInfo),
                ("game_info", GameInfo),
                ("dropshot_tiles", TileInfo * MAX_TILES),
                ("num_tiles", c_int),
                ("teams", TeamInfo * MAX_TEAMS),
                ("num_teams", c_int)]


class BoostPad(Structure):
    _fields_ = [("location", Vector3), ("is_full_boost", c_bool)]


class GoalInfo(Structure):
    _fields_ = [("team_num", c_ubyte), ("location", Vector3),
                ("direction", Vector3), ("width", c_float),
                ("height", c_float)]


class FieldInfoPacket(Structure):
    _fields_ = [("boost_pads", BoostPad * MAX_BOOSTS),
                ("num_boosts", c_int),
                ("goals", GoalInfo * MAX_GOALS),
                ("num_goals", c_int)]


def build_game_tick_packet(p) -> GameTickPacket:
    """Fill a real GameTickPacket from a scripted packet dict
    (tests.test_bot_server._scripted_packets layout)."""
    pkt = GameTickPacket()
    pkt.num_cars = len(p["players"])
    for i, pl in enumerate(p["players"]):
        car = pkt.game_cars[i]
        car.physics.location = Vector3(*pl["pos"])
        car.physics.rotation = Rotator(pl["pitch"], pl["yaw"], pl["roll"])
        car.physics.velocity = Vector3(*pl["vel"])
        car.physics.angular_velocity = Vector3(*pl["ang_vel"])
        car.boost = int(pl["boost"])
        car.team = int(pl["team"])
        car.has_wheel_contact = bool(pl.get("is_on_ground", True))
        car.jumped = bool(pl.get("has_jumped", False))
        car.double_jumped = bool(pl.get("has_double_jumped", False))
        car.is_demolished = bool(pl.get("is_demoed", False))
        car.is_bot = True
        car.name = f"bot{i}"
    ball = pkt.game_ball
    ball.physics.location = Vector3(*p["ball_pos"])
    ball.physics.velocity = Vector3(*p["ball_vel"])
    ball.physics.angular_velocity = Vector3(*p["ball_ang_vel"])
    pads_active = p.get("pads_active")
    pads_timer = p.get("pads_timer")
    n = MAX_BOOSTS if pads_active is None else min(len(pads_active),
                                                  MAX_BOOSTS)
    pkt.num_boost = n
    for i in range(n):
        pkt.game_boosts[i].is_active = (True if pads_active is None
                                        else bool(pads_active[i]))
        pkt.game_boosts[i].timer = (0.0 if pads_timer is None
                                    else float(pads_timer[i]))
    pkt.game_info.seconds_elapsed = float(p["seconds_elapsed"])
    pkt.game_info.is_round_active = True
    pkt.game_info.world_gravity_z = -650.0
    pkt.num_teams = 2
    return pkt


def build_field_info(pad_locations) -> FieldInfoPacket:
    fi = FieldInfoPacket()
    fi.num_boosts = min(len(pad_locations), MAX_BOOSTS)
    for i in range(fi.num_boosts):
        fi.boost_pads[i].location = Vector3(*pad_locations[i])
        fi.boost_pads[i].is_full_boost = abs(pad_locations[i][2]) > 70.0
    return fi
