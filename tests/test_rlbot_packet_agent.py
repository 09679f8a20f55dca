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
