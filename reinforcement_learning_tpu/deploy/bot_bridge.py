"""Python driver for the native RLBot bot server.

The reference's deployment chain is: RLBot GUI -> python shim
(rlbot/CppPythonAgent.py, "add"/"remove" over TCP) -> C++ bot process
(RLBotCPP BotManager) -> per-tick GetOutput (src/RLBotClient.cpp:94-139).

Our native server (deploy/native/bot_server.cpp) mirrors that chain; this
module is the Python side:

  * :func:`build_server` / :class:`BotServer` — compile + launch the
    server with an exported policy blob (see native.export_policy_blob).
  * :class:`PacketClient` — streams binary game packets (the 'RLTP'
    frames) and reads back per-bot controls; used by the RLBot shim and
    by the scripted fake-packet deployment test.
  * :func:`add_bot` / :func:`remove_bot` — the shim command protocol,
    byte-compatible with the reference's CppPythonAgent messages.

A real RLBot python agent then only needs to translate its
GameTickPacket into :meth:`PacketClient.send_packet` arguments.
"""

from __future__ import annotations

import os
import socket
import struct
import subprocess
import time

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "native")
_SERVER_BIN = os.path.join(_NATIVE_DIR, "rlt_bot_server")

PACKET_MAGIC = 0x524C5450
CONTROLS_MAGIC = 0x524C5443
NUM_PADS = 34


def build_server(force: bool = False) -> str:
    srcs = [os.path.join(_NATIVE_DIR, "bot_server.cpp"),
            os.path.join(_NATIVE_DIR, "mlp_infer.cpp")]
    if force or not os.path.exists(_SERVER_BIN) or any(
            os.path.getmtime(s) > os.path.getmtime(_SERVER_BIN)
            for s in srcs):
        subprocess.run(["g++", "-O3", "-std=c++17", *srcs,
                        "-o", _SERVER_BIN], check=True)
    return _SERVER_BIN


class BotServer:
    """Launches the native bot server on an ephemeral port."""

    def __init__(self, blob_path: str, tick_skip: int = 8,
                 action_delay: int = 7, workdir: str | None = None,
                 stochastic: bool = False):
        build_server()
        self.workdir = workdir or os.getcwd()
        self.port_file = os.path.join(self.workdir, "port.cfg")
        if os.path.exists(self.port_file):
            os.remove(self.port_file)
        args = [_SERVER_BIN, blob_path, "--port", "0",
                "--tick-skip", str(tick_skip),
                "--action-delay", str(action_delay),
                "--port-file", self.port_file]
        if stochastic:
            args.append("--stochastic")
        self.proc = subprocess.Popen(args, cwd=self.workdir,
                                     stderr=subprocess.DEVNULL)
        self.port = self._wait_port()

    def _wait_port(self, timeout: float = 10.0) -> int:
        deadline = time.monotonic() + timeout
        while time.monotonic() < deadline:
            if os.path.exists(self.port_file):
                with open(self.port_file) as f:
                    text = f.read().strip()
                if text:
                    return int(text)
            if self.proc.poll() is not None:
                raise RuntimeError(
                    f"bot server exited with {self.proc.returncode}")
            time.sleep(0.01)
        raise TimeoutError("bot server did not write port.cfg")

    def close(self):
        try:
            s = socket.create_connection(("127.0.0.1", self.port),
                                         timeout=1.0)
            s.send(b"quit")
            s.close()
            self.proc.wait(timeout=2.0)
        except Exception:
            self.proc.kill()
        self.proc.wait()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def _command(port: int, message: str):
    s = socket.create_connection(("127.0.0.1", port), timeout=2.0)
    s.send(message.encode("ascii"))
    s.close()
    time.sleep(0.05)  # command connections are fire-and-forget


def add_bot(port: int, name: str, team: int, index: int,
            dll_dir: str = "."):
    """Byte-identical to CppPythonAgent.run_independently's message."""
    _command(port, f"add\n{name}\n{team}\n{index}\n{dll_dir}")


def remove_bot(port: int, index: int):
    _command(port, f"remove\n{index}")


def pack_packet(seconds_elapsed: float, ball_pos, ball_vel, ball_ang_vel,
                players, pads_active=None, pads_timer=None) -> bytes:
    """players: iterable of dicts with pos, yaw, pitch, roll, vel,
    ang_vel, boost, team, and optional is_on_ground/has_jumped/
    has_double_jumped/is_demoed flags."""
    out = bytearray()
    out += struct.pack("<If", PACKET_MAGIC, seconds_elapsed)
    out += np.asarray([*ball_pos, *ball_vel, *ball_ang_vel],
                      "<f4").tobytes()
    out += struct.pack("<i", len(players))
    for p in players:
        vals = [*p["pos"], p["yaw"], p["pitch"], p["roll"], *p["vel"],
                *p["ang_vel"], p["boost"], 0.0]
        out += np.asarray(vals, "<f4").tobytes()
        out += struct.pack("<i", int(p["team"]))
        out += struct.pack("<4B",
                           1 if p.get("is_on_ground", True) else 0,
                           1 if p.get("has_jumped", False) else 0,
                           1 if p.get("has_double_jumped", False) else 0,
                           1 if p.get("is_demoed", False) else 0)
    if pads_active is None:
        pads_active = np.ones(NUM_PADS, bool)
    if pads_timer is None:
        pads_timer = np.zeros(NUM_PADS, np.float32)
    out += struct.pack("<i", NUM_PADS)
    for a, t in zip(pads_active, pads_timer):
        out += struct.pack("<Bf", 1 if a else 0, float(t))
    return bytes(out)


class PacketClient:
    """Persistent game-packet connection to a running bot server."""

    def __init__(self, port: int):
        self.sock = socket.create_connection(("127.0.0.1", port),
                                             timeout=10.0)
        self.sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)

    def _read_exact(self, n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            chunk = self.sock.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("bot server closed connection")
            buf += chunk
        return buf

    def send_packet(self, *args, **kwargs) -> dict:
        """Send one game packet; returns {bot_index: controls (8,)}."""
        self.sock.sendall(pack_packet(*args, **kwargs))
        magic, n = struct.unpack("<Ii", self._read_exact(8))
        assert magic == CONTROLS_MAGIC, hex(magic)
        out = {}
        for _ in range(n):
            idx, = struct.unpack("<i", self._read_exact(4))
            out[idx] = np.frombuffer(self._read_exact(32), "<f4").copy()
        return out

    def close(self):
        try:
            self.sock.close()
        except OSError:
            pass
