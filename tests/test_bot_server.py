"""Deployment-path test (BASELINE #5): a scripted fake-packet session
drives the native bot server end-to-end — shim "add" command, binary
game-packet stream, tick-skip/action-delay cadence — and the resulting
controls must match the Python RLBotAdapter running the same policy on
the same packets (reference chain: rlbot/CppPythonAgent.py ->
RLBotCPP BotManager -> RLBotClient::GetOutput, RLBotClient.cpp:94-139).
"""

import os

import numpy as np
import pytest

from reinforcement_learning_tpu.deploy import bot_bridge, native
from reinforcement_learning_tpu.deploy.rlbot_agent import (PacketPlayer,
                                                           RLBotAdapter)
from reinforcement_learning_tpu.envs.actions import DefaultAction
from reinforcement_learning_tpu.envs.obs import AdvancedObs


class _Params:
    """Minimal PPOParams-alike for export_policy_blob."""

    def __init__(self, shared_head, policy):
        self.shared_head = shared_head
        self.policy = policy


def _random_policy(rng, obs_size, num_actions):
    def layer(fan_in, fan_out, ln=True):
        out = {"w": rng.normal(size=(fan_in, fan_out)).astype(np.float32)
               * (1.0 / np.sqrt(fan_in)),
               "b": rng.normal(size=fan_out).astype(np.float32) * 0.1}
        if ln:
            out["ln_scale"] = np.ones(fan_out, np.float32)
            out["ln_bias"] = np.zeros(fan_out, np.float32)
        return out

    policy = {"layers": [layer(obs_size, 32), layer(32, 32)],
              "out": {"w": rng.normal(size=(32, num_actions))
                      .astype(np.float32) * 0.2,
                      "b": np.zeros(num_actions, np.float32)}}
    return _Params(None, policy)


def _scripted_packets(T, rng):
    """T game ticks of a 1v1 with slowly moving state."""
    packets = []
    for t in range(T):
        ang = 0.01 * t
        players = [
            dict(pos=(100.0 + 5 * t, -200.0, 17.01), yaw=ang, pitch=0.0,
                 roll=0.0, vel=(600.0, 0.0, 0.0),
                 ang_vel=(0.0, 0.0, 0.5), boost=50.0, team=0),
            dict(pos=(-300.0, 400.0 - 2 * t, 17.01), yaw=-ang, pitch=0.0,
                 roll=0.0, vel=(0.0, -240.0, 0.0),
                 ang_vel=(0.0, 0.0, 0.0), boost=12.0, team=1),
        ]
        packets.append(dict(
            seconds_elapsed=t / 120.0,
            ball_pos=(40.0 * np.sin(0.05 * t), 30.0 * t % 1000, 93.15),
            ball_vel=(100.0, 50.0, 0.0),
            ball_ang_vel=(0.0, 1.0, 0.0),
            players=players))
    return packets


@pytest.fixture(scope="module")
def policy_blob(tmp_path_factory):
    rng = np.random.default_rng(7)
    obs = AdvancedObs(2, np.array([0, 1]))
    parser = DefaultAction()
    params = _random_policy(rng, obs.obs_size, parser.num_actions)
    blob = native.export_policy_blob(params, obs.obs_size,
                                     parser.num_actions)
    path = tmp_path_factory.mktemp("deploy") / "policy.blob"
    path.write_bytes(blob)
    return str(path), params, obs, parser


def test_scripted_session_matches_python_adapter(policy_blob, tmp_path):
    blob_path, params, obs_builder, parser = policy_blob
    T = 64
    rng = np.random.default_rng(3)
    packets = _scripted_packets(T, rng)

    # --- native server session
    with bot_bridge.BotServer(blob_path, tick_skip=8, action_delay=7,
                              workdir=str(tmp_path)) as server:
        bot_bridge.add_bot(server.port, "testbot", 0, 0)
        client = bot_bridge.PacketClient(server.port)
        native_controls = []
        for pkt in packets:
            out = client.send_packet(**pkt)
            assert 0 in out
            native_controls.append(out[0])
        client.close()
    native_controls = np.stack(native_controls)

    # --- python adapter on the same packets + same native policy
    policy = native.NativePolicy.from_params(params, obs_builder.obs_size,
                                             parser.num_actions)

    def infer(obs_row, mask_row):
        return int(policy.infer(obs_row[None], mask_row[None],
                                deterministic=True)[0])

    adapter = RLBotAdapter(infer, obs_builder, parser, tick_skip=8,
                           action_delay=7)
    py_controls = []
    for pkt in packets:
        players = [PacketPlayer(
            pos=np.asarray(p["pos"], np.float32), yaw=p["yaw"],
            pitch=p["pitch"], roll=p["roll"],
            vel=np.asarray(p["vel"], np.float32),
            ang_vel=np.asarray(p["ang_vel"], np.float32),
            boost=p["boost"], team=p["team"]) for p in pkt["players"]]
        ctrl = adapter.get_output(
            pkt["seconds_elapsed"], pkt["ball_pos"], pkt["ball_vel"],
            pkt["ball_ang_vel"], players, np.ones(34, bool), 0)
        py_controls.append(np.asarray(ctrl, np.float32))
    py_controls = np.stack(py_controls)

    assert np.array_equal(native_controls, py_controls), (
        np.nonzero(np.any(native_controls != py_controls, axis=1)))

    # cadence: controls may only change on action-application ticks
    change_ticks = np.nonzero(np.any(np.diff(native_controls, axis=0)
                                     != 0, axis=1))[0] + 1
    # with tick_skip 8 / delay 7, changes land on ticks = 8k+6 after the
    # initial application at tick 0 (ticks counter starts at -1)
    assert all((t - 6) % 8 == 0 for t in change_ticks), change_ticks


def test_add_remove_commands(policy_blob, tmp_path):
    blob_path, *_ = policy_blob
    packets = _scripted_packets(4, np.random.default_rng(0))
    with bot_bridge.BotServer(blob_path, workdir=str(tmp_path)) as server:
        bot_bridge.add_bot(server.port, "a", 0, 0)
        bot_bridge.add_bot(server.port, "b", 1, 1)
        client = bot_bridge.PacketClient(server.port)
        out = client.send_packet(**packets[0])
        assert set(out) == {0, 1}
        client.close()
        bot_bridge.remove_bot(server.port, 1)
        client = bot_bridge.PacketClient(server.port)
        out = client.send_packet(**packets[1])
        assert set(out) == {0}
        client.close()
