"""Python binding for the native C++ inference runtime.

Exports trained policy params to a compact binary blob and drives
``deploy/native/mlp_infer.cpp`` via ctypes (the Python<->C++ bridge; the
reference uses pybind11 for its embedded-Python direction, here the
direction is reversed so ctypes on a C ABI is the clean seam).

The shared library is compiled on demand with g++ -O3 and cached next to
the source.
"""

from __future__ import annotations

import ctypes
import os
import struct
import subprocess

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "native", "mlp_infer.cpp")
_LIB = os.path.join(os.path.dirname(__file__), "native", "libmlp_infer.so")

_MAGIC = 0x524C5431


def build_library(force: bool = False) -> str:
    if force or not os.path.exists(_LIB) or (
            os.path.getmtime(_SRC) > os.path.getmtime(_LIB)):
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             _SRC, "-o", _LIB],
            check=True)
    return _LIB


def export_policy_blob(params, num_inputs: int, num_actions: int) -> bytes:
    """Serialize shared-head (optional) + policy params into the native
    runtime's weight format."""
    layers = []
    if params.shared_head is not None:
        for l in params.shared_head["layers"]:
            layers.append((l, True))
    for l in params.policy["layers"]:
        layers.append((l, True))
    layers.append((params.policy["out"], False))

    out = bytearray()
    out += struct.pack("<I", _MAGIC)
    out += struct.pack("<i", num_inputs)
    out += struct.pack("<i", num_actions)
    out += struct.pack("<i", len(layers))
    for layer, is_hidden in layers:
        w = np.asarray(layer["w"], np.float32)
        b = np.asarray(layer["b"], np.float32)
        has_ln = "ln_scale" in layer
        out += struct.pack("<i", w.shape[0])
        out += struct.pack("<i", w.shape[1])
        out += struct.pack("<i", 1 if has_ln else 0)
        out += struct.pack("<i", 1 if is_hidden else 0)
        out += w.tobytes()
        out += b.tobytes()
        if has_ln:
            out += np.asarray(layer["ln_scale"], np.float32).tobytes()
            out += np.asarray(layer["ln_bias"], np.float32).tobytes()
    return bytes(out)


class NativePolicy:
    """CPU policy inference backed by the C++ runtime."""

    def __init__(self, blob: bytes):
        lib = ctypes.CDLL(build_library())
        lib.rlt_load_model.restype = ctypes.c_void_p
        lib.rlt_load_model.argtypes = [ctypes.c_char_p, ctypes.c_uint64]
        lib.rlt_infer.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32),
            ctypes.c_float, ctypes.c_int, ctypes.c_uint64]
        lib.rlt_forward_logits.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float)]
        lib.rlt_num_actions.argtypes = [ctypes.c_void_p]
        lib.rlt_num_inputs.argtypes = [ctypes.c_void_p]
        lib.rlt_free_model.argtypes = [ctypes.c_void_p]
        self._lib = lib
        self._blob = blob  # keep alive
        self._handle = lib.rlt_load_model(blob, len(blob))
        if not self._handle:
            raise ValueError("invalid policy blob")
        self.num_actions = lib.rlt_num_actions(self._handle)
        self.num_inputs = lib.rlt_num_inputs(self._handle)

    @classmethod
    def from_params(cls, params, num_inputs: int,
                    num_actions: int) -> "NativePolicy":
        return cls(export_policy_blob(params, num_inputs, num_actions))

    def logits(self, obs: np.ndarray) -> np.ndarray:
        obs = np.ascontiguousarray(obs, np.float32)
        batch = obs.shape[0]
        out = np.empty((batch, self.num_actions), np.float32)
        self._lib.rlt_forward_logits(
            self._handle,
            obs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), batch,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return out

    def infer(self, obs: np.ndarray, masks: np.ndarray | None = None,
              temperature: float = 1.0, deterministic: bool = True,
              seed: int = 0) -> np.ndarray:
        obs = np.ascontiguousarray(obs, np.float32)
        batch = obs.shape[0]
        out = np.empty((batch,), np.int32)
        mask_arg = None
        if masks is not None:
            masks = np.ascontiguousarray(masks, np.uint8)
            mask_arg = masks.tobytes()
        self._lib.rlt_infer(
            self._handle,
            obs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), batch,
            mask_arg, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            temperature, 1 if deterministic else 0, seed)
        return out

    def __del__(self):
        try:
            self._lib.rlt_free_model(self._handle)
        except Exception:
            pass
