"""Render sender: stream game states to RocketSimVis over UDP.

Same JSON schema and UDP endpoint as the reference render path
(reference: Util/RenderSender.cpp:21-122 + python_scripts/
render_receiver.py: UDP 127.0.0.1:9273), with the reference's adaptive
real-time pacing.
"""

from __future__ import annotations

import json
import socket
import time

import numpy as np

from reinforcement_learning_tpu.envs.obs import PAD_PERMUTATION


def _vec(v) -> list:
    a = np.asarray(v, np.float64)
    return [float(a[0]), float(a[1]), float(a[2])]


def _phys(pos, rot, vel, ang_vel) -> dict:
    rot = np.asarray(rot)
    return {
        "pos": _vec(pos),
        "forward": _vec(rot[:, 0]),
        "right": _vec(rot[:, 1]),
        "up": _vec(rot[:, 2]),
        "vel": _vec(vel),
        "ang_vel": _vec(ang_vel),
    }


class RenderSender:
    def __init__(self, ip: str = "127.0.0.1", port: int = 9273,
                 time_scale: float = 1.0, step_seconds: float = 8 / 120.0):
        self.addr = (ip, port)
        self.sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self.time_scale = time_scale
        self.step_seconds = step_seconds
        self._last_send = 0.0

    def send(self, arena_state, teams, prev_actions=None,
             ball_touched=None, gamemode: str = "soccar"):
        """Send one arena's state (host-side numpy of an ArenaState)."""
        cars = arena_state.cars
        num_cars = np.asarray(cars.pos).shape[0]
        players = []
        for i in range(num_cars):
            players.append({
                "car_id": i + 1,
                "team_num": int(np.asarray(teams)[i]),
                "phys": _phys(cars.pos[i], cars.rot[i], cars.vel[i],
                              cars.ang_vel[i]),
                "is_demoed": bool(np.asarray(cars.is_demoed)[i]),
                "on_ground": bool(np.asarray(cars.is_on_ground)[i]),
                "ball_touched": bool(np.asarray(ball_touched)[i])
                if ball_touched is not None else False,
                "has_flip": True,
                "boost_amount": float(np.asarray(cars.boost)[i]) / 100.0,
            })

        ball = arena_state.ball
        ball_phys = _phys(ball.pos, ball.rot, ball.vel, ball.ang_vel)
        ball_phys.pop("forward")
        ball_phys.pop("right")
        ball_phys.pop("up")

        pads_arena = np.asarray(arena_state.pads.is_active)
        pads_canonical = pads_arena[PAD_PERMUTATION].tolist()

        out = {
            "gamemode": gamemode,
            "ball_phys": ball_phys,
            "cars": players,
            "boost_pad_states": [bool(p) for p in pads_canonical],
        }
        self.sock.sendto(json.dumps(out).encode(), self.addr)
        self._pace()

    def _pace(self):
        """Adaptive real-time pacing (RenderSender.cpp:99-122)."""
        target = self.step_seconds / max(self.time_scale, 1e-6)
        now = time.monotonic()
        if self._last_send > 0:
            remaining = target - (now - self._last_send)
            if remaining > 0:
                time.sleep(remaining)
        self._last_send = time.monotonic()
