"""GameTickPacket translation (the real-RLBot last mile): a scripted
match of rlbot-structured packets drives the native bot server through
the translator and must produce the same controls as the direct binary
protocol (reference: src/RLBotClient.cpp:62-92 packet decode)."""

import types

import numpy as np
import pytest

from reinforcement_learning_tpu import constants as C
from reinforcement_learning_tpu.deploy import bot_bridge
from reinforcement_learning_tpu.deploy import rlbot_packet_agent as rpa

from tests.test_bot_server import _scripted_packets, policy_blob  # noqa


def _vec(x, y, z):
    return types.SimpleNamespace(x=float(x), y=float(y), z=float(z))


def _fake_game_tick_packet(p):
    """Build an object with the official rlbot GameTickPacket attribute
    structure (rlbot.utils.structures.game_data_struct) from a scripted
    packet dict."""
    cars = []
    for pl in p["players"]:
        cars.append(types.SimpleNamespace(
            physics=types.SimpleNamespace(
                location=_vec(*pl["pos"]),
                rotation=types.SimpleNamespace(
                    pitch=pl["pitch"], yaw=pl["yaw"], roll=pl["roll"]),
                velocity=_vec(*pl["vel"]),
                angular_velocity=_vec(*pl["ang_vel"])),
            boost=pl["boost"], team=pl["team"],
            jumped=False, double_jumped=False, is_demolished=False,
            has_wheel_contact=True))
    ball = types.SimpleNamespace(physics=types.SimpleNamespace(
        location=_vec(*p["ball_pos"]), velocity=_vec(*p["ball_vel"]),
        angular_velocity=_vec(*p["ball_ang_vel"])))
    # rlbot-ordered boost pads: shuffled reference locations
    ref = np.asarray(C.BOOST_PAD_LOCS_SOCCAR)
    order = np.random.RandomState(3).permutation(len(ref))
    boosts = [types.SimpleNamespace(is_active=True, timer=0.0)
              for _ in order]
    pkt = types.SimpleNamespace(
        game_cars=cars, num_cars=len(cars), game_ball=ball,
        game_boosts=boosts, num_boost=len(boosts),
        game_info=types.SimpleNamespace(
            seconds_elapsed=p["seconds_elapsed"]))
    return pkt, [tuple(ref[i]) for i in order]


def test_translate_field_coverage():
    """Every translated field is asserted at least once, including the
    car-state flags the scripted match never varies: an airborne car that
    NEVER jumped (drove off a wall) must be is_on_ground=False —
    isOnGround = hasWheelContact() alone (RLBotClient.cpp:54)."""
    def car(wheel, jumped, dj, demo):
        return types.SimpleNamespace(
            physics=types.SimpleNamespace(
                location=_vec(100, 200, 300),
                rotation=types.SimpleNamespace(pitch=0.1, yaw=0.2,
                                               roll=0.3),
                velocity=_vec(10, 20, 30),
                angular_velocity=_vec(1, 2, 3)),
            boost=77.0, team=1, jumped=jumped, double_jumped=dj,
            is_demolished=demo, has_wheel_contact=wheel)

    cars = [
        car(wheel=True, jumped=False, dj=False, demo=False),   # grounded
        car(wheel=False, jumped=False, dj=False, demo=False),  # fell off
        car(wheel=False, jumped=True, dj=False, demo=False),   # jumped
        car(wheel=False, jumped=True, dj=True, demo=False),    # dbl jump
        car(wheel=True, jumped=False, dj=False, demo=True),    # demoed
    ]
    ball = types.SimpleNamespace(physics=types.SimpleNamespace(
        location=_vec(5, 6, 93), velocity=_vec(-1, -2, -3),
        angular_velocity=_vec(0.5, 0.25, -0.5)))
    ref = np.asarray(C.BOOST_PAD_LOCS_SOCCAR)
    boosts = [types.SimpleNamespace(is_active=(i % 2 == 0),
                                    timer=float(i))
              for i in range(len(ref))]
    pkt = types.SimpleNamespace(
        game_cars=cars, num_cars=len(cars), game_ball=ball,
        game_boosts=boosts, num_boost=len(boosts),
        game_info=types.SimpleNamespace(seconds_elapsed=12.5))
    pad_map = rpa.build_pad_map([tuple(r) for r in ref])

    out = rpa.translate_game_tick_packet(pkt, pad_map)
    assert out["seconds_elapsed"] == 12.5
    assert out["ball_pos"] == (5.0, 6.0, 93.0)
    assert out["ball_vel"] == (-1.0, -2.0, -3.0)
    assert out["ball_ang_vel"] == (0.5, 0.25, -0.5)
    assert [p["is_on_ground"] for p in out["players"]] == [
        True, False, False, False, True]
    assert [p["has_jumped"] for p in out["players"]] == [
        False, False, True, True, False]
    assert [p["has_double_jumped"] for p in out["players"]] == [
        False, False, False, True, False]
    assert [p["is_demoed"] for p in out["players"]] == [
        False, False, False, False, True]
    p0 = out["players"][0]
    assert p0["pos"] == (100.0, 200.0, 300.0)
    assert (p0["pitch"], p0["yaw"], p0["roll"]) == (0.1, 0.2, 0.3)
    assert p0["vel"] == (10.0, 20.0, 30.0)
    assert p0["ang_vel"] == (1.0, 2.0, 3.0)
    assert p0["boost"] == 77.0 and p0["team"] == 1
    np.testing.assert_array_equal(
        out["pads_active"], [i % 2 == 0 for i in range(len(ref))])
    np.testing.assert_allclose(out["pads_timer"],
                               np.arange(len(ref), dtype=np.float32))


def test_pad_map_roundtrip():
    ref = np.asarray(C.BOOST_PAD_LOCS_SOCCAR)
    order = np.random.RandomState(0).permutation(len(ref))
    m = rpa.build_pad_map([tuple(ref[i]) for i in order])
    assert (m == order).all()


def test_translate_matches_direct_protocol(policy_blob, tmp_path):
    """A fake-GameTickPacket session through the translator produces the
    SAME control stream as the direct pack_packet session."""
    blob_path, *_ = policy_blob
    packets = _scripted_packets(60, np.random.default_rng(1))

    with bot_bridge.BotServer(blob_path, tick_skip=8, action_delay=7,
                              workdir=str(tmp_path)) as server:
        bot_bridge.add_bot(server.port, "gtp-bot", 0, 0)
        client = bot_bridge.PacketClient(server.port)
        direct = [client.send_packet(**p) for p in packets]
        client.close()

    with bot_bridge.BotServer(blob_path, tick_skip=8, action_delay=7,
                              workdir=str(tmp_path)) as server:
        bot_bridge.add_bot(server.port, "gtp-bot", 0, 0)
        bridge = None
        via_gtp = []
        for p in packets:
            pkt, pad_locs = _fake_game_tick_packet(p)
            if bridge is None:
                bridge = rpa.NativeBridge(server.port, pad_locs)
            via_gtp.append(dict(bridge.step(pkt)))
        bridge.client.close()

    assert len(direct) == len(via_gtp)
    for a, b in zip(direct, via_gtp):
        assert a.keys() == b.keys()
        for idx in a:
            np.testing.assert_allclose(a[idx], b[idx], atol=1e-6)

    # controls convert into the rlbot controller-state shape
    s = rpa.controls_to_simple_state(list(direct[-1].values())[0])
    assert hasattr(s, "throttle") and isinstance(s.jump, bool)


def test_real_ctypes_packet_bytes_end_to_end(policy_blob, tmp_path):
    """REAL-layout evidence for the last mile: GameTickPacket /
    FieldInfoPacket built as actual ctypes structures (the exact memory
    layout the live rlbot framework hands agents,
    tests/rlbot_structs.py), serialized to raw bytes, re-parsed with
    ``from_buffer_copy``, and driven through the translator + native bot
    server — the control stream must match the direct binary protocol."""
    from tests import rlbot_structs as rs

    blob_path, *_ = policy_blob
    packets = _scripted_packets(40, np.random.default_rng(7))
    for p in packets:  # rlbot carries boost as c_int
        for pl in p["players"]:
            pl["boost"] = float(int(pl["boost"]))

    with bot_bridge.BotServer(blob_path, tick_skip=8, action_delay=7,
                              workdir=str(tmp_path)) as server:
        bot_bridge.add_bot(server.port, "ct-bot", 0, 0)
        client = bot_bridge.PacketClient(server.port)
        direct = [client.send_packet(**p) for p in packets]
        client.close()

    ref = np.asarray(C.BOOST_PAD_LOCS_SOCCAR)
    order = np.random.RandomState(11).permutation(len(ref))
    fi = rs.build_field_info([tuple(ref[i]) for i in order])
    fi_bytes = bytes(fi)
    fi2 = rs.FieldInfoPacket.from_buffer_copy(fi_bytes)
    pad_locs = [(fi2.boost_pads[i].location.x, fi2.boost_pads[i].location.y,
                 fi2.boost_pads[i].location.z)
                for i in range(fi2.num_boosts)]

    with bot_bridge.BotServer(blob_path, tick_skip=8, action_delay=7,
                              workdir=str(tmp_path)) as server:
        bot_bridge.add_bot(server.port, "ct-bot", 0, 0)
        bridge = rpa.NativeBridge(server.port, pad_locs)
        via_ctypes = []
        for p in packets:
            raw = bytes(rs.build_game_tick_packet(p))   # the wire bytes
            pkt = rs.GameTickPacket.from_buffer_copy(raw)
            via_ctypes.append(dict(bridge.step(pkt)))
        bridge.client.close()

    assert len(direct) == len(via_ctypes)
    for a, b in zip(direct, via_ctypes):
        assert a.keys() == b.keys()
        for idx in a:
            np.testing.assert_allclose(a[idx], b[idx], atol=1e-6)
