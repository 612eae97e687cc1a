"""Quantize the actor to the native .tvcq format + ctypes runtime binding.

The companion of ``native/tvc_micro.cpp``: per-tensor symmetric int8 weight
quantization with activation ranges calibrated from representative
observations (the same calibration data the TFLite path uses), serialized to
the compact ``.tvcq`` container that the C++ runtime (and MCU firmware)
consumes. ``MicroActor`` builds the shared library with g++ on first use and
drives it through ctypes — the validation harness proving the native runtime
matches the float policy within the 0.1 export-parity budget.
"""

from __future__ import annotations

import ctypes
import struct
import subprocess
from pathlib import Path
from typing import Any

import numpy as np

from tvc_ai_tpu.export.tflite import actor_dense_stack

MAGIC = 0x54564351
_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"


def _activation_ranges(
    stack: list[tuple[np.ndarray, np.ndarray]], calib_obs: np.ndarray
) -> list[tuple[float, float]]:
    """(min, max) of each layer's float activations over the calibration set."""
    ranges = [(float(calib_obs.min()), float(calib_obs.max()))]
    x = calib_obs
    for kernel, bias in stack[:-1]:
        x = np.maximum(x @ kernel + bias, 0.0)
        ranges.append((float(x.min()), float(x.max())))
    return ranges


def _affine_params(lo: float, hi: float) -> tuple[float, int]:
    """int8 affine quantization covering [lo, hi]."""
    lo, hi = min(lo, 0.0), max(hi, 1e-6)
    scale = (hi - lo) / 255.0
    zero = int(round(-128 - lo / scale))
    zero = max(-128, min(127, zero))
    return scale, zero


def quantize_actor(
    actor_params: Any, calib_obs: np.ndarray
) -> bytes:
    """flax GaussianActor params → .tvcq bytes."""
    stack = actor_dense_stack(actor_params)
    ranges = _activation_ranges(stack, calib_obs.astype(np.float32))

    out = bytearray()
    out += struct.pack("<III", MAGIC, 1, len(stack))
    in_scale, in_zero = _affine_params(*ranges[0])
    out += struct.pack("<fi", in_scale, in_zero)

    cur_scale, cur_zero = in_scale, in_zero
    for li, (kernel, bias) in enumerate(stack):
        rows, cols = kernel.shape
        w_scale = float(np.abs(kernel).max()) / 127.0 or 1e-8
        w_q = np.clip(np.round(kernel / w_scale), -127, 127).astype(np.int8)
        # bias folded into the int32 accumulator grid: real = acc·w_s·in_s
        bias_q = np.round(bias / (w_scale * cur_scale)).astype(np.int64)
        bias_q = np.clip(bias_q, -(2**31) + 1, 2**31 - 1).astype(np.int32)
        last = li == len(stack) - 1
        if last:
            o_scale, o_zero = 1.0, 0  # final layer dequantizes to float
        else:
            o_scale, o_zero = _affine_params(*ranges[li + 1])
        out += struct.pack("<IIf", rows, cols, w_scale)
        out += bias_q.tobytes()
        out += w_q.tobytes()
        out += struct.pack("<fi", o_scale, o_zero)
        cur_scale, cur_zero = o_scale, o_zero
    return bytes(out)


def build_runtime(force: bool = False) -> Path:
    """Compile native/tvc_micro.cpp to a shared library (g++, no deps)."""
    src = _NATIVE_DIR / "tvc_micro.cpp"
    lib = _NATIVE_DIR / "libtvc_micro.so"
    if lib.exists() and not force and lib.stat().st_mtime >= src.stat().st_mtime:
        return lib
    subprocess.run(
        [
            "g++", "-O2", "-std=c++17", "-shared", "-fPIC",
            str(src), "-o", str(lib),
        ],
        check=True,
        capture_output=True,
    )
    return lib


class MicroActor:
    """ctypes driver for the native int8 runtime."""

    def __init__(self, model_bytes: bytes, lib_path: Path | None = None):
        self._lib = ctypes.CDLL(str(lib_path or build_runtime()))
        self._lib.tvc_micro_load.restype = ctypes.c_void_p
        self._lib.tvc_micro_load.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_uint64,
        ]
        self._lib.tvc_micro_infer.restype = ctypes.c_int
        self._lib.tvc_micro_infer.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
        ]
        self._lib.tvc_micro_input_dim.restype = ctypes.c_uint32
        self._lib.tvc_micro_input_dim.argtypes = [ctypes.c_void_p]
        self._lib.tvc_micro_output_dim.restype = ctypes.c_uint32
        self._lib.tvc_micro_output_dim.argtypes = [ctypes.c_void_p]
        self._lib.tvc_micro_free.argtypes = [ctypes.c_void_p]

        buf = (ctypes.c_uint8 * len(model_bytes)).from_buffer_copy(model_bytes)
        self._handle = self._lib.tvc_micro_load(buf, len(model_bytes))
        if not self._handle:
            raise ValueError("tvc_micro_load rejected the model bytes")
        self.input_dim = int(self._lib.tvc_micro_input_dim(self._handle))
        self.output_dim = int(self._lib.tvc_micro_output_dim(self._handle))

    def __call__(self, obs: np.ndarray) -> np.ndarray:
        obs = np.asarray(obs, np.float32)
        single = obs.ndim == 1
        if single:
            obs = obs[None]
        out = np.empty((obs.shape[0], self.output_dim), np.float32)
        for i, row in enumerate(obs):
            row = np.ascontiguousarray(row, np.float32)
            res = np.empty(self.output_dim, np.float32)
            rc = self._lib.tvc_micro_infer(
                self._handle,
                row.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                res.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            )
            if rc != 0:
                raise RuntimeError(f"tvc_micro_infer failed: {rc}")
            out[i] = res
        return out[0] if single else out

    def __del__(self):  # pragma: no cover - best effort
        try:
            if getattr(self, "_handle", None):
                self._lib.tvc_micro_free(self._handle)
        except Exception:
            pass


def export_micro(
    actor_params: Any,
    calib_obs: np.ndarray,
    output_dir: str | Path,
    name: str = "tvc_actor",
) -> Path:
    """Write the .tvcq artifact (plus the compiled host runtime nearby)."""
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    payload = quantize_actor(actor_params, calib_obs)
    path = output_dir / f"{name}.tvcq"
    path.write_bytes(payload)
    return path
