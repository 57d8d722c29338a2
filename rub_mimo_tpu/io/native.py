"""ctypes bindings for the native IQ ingest runtime (native/ingest.cpp).

The native library supplies the host-side runtime pieces the reference got
from UHD + pthreads (wire-format conversion sc16<->fc32 per
mimo/config.h:51-52, the capture read loop of mimo/main.cc:872-898, thread
pipelining main.cc:1373-1386): fast format conversion, deinterleaving,
validation scans, and a background-prefetch block reader.

The library auto-builds with `make -C native` on first use when a
toolchain is present; every entry point has a numpy fallback so the pure
Python path keeps working without it.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_SO_PATH = _NATIVE_DIR / "libingest.so"
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _SO_PATH.exists():
        try:
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(_SO_PATH))
    except OSError:
        return None
    lib.rmt_sc16_to_fc32.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_float]
    lib.rmt_fc32_to_sc16.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_float]
    lib.rmt_validate_fc32.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.POINTER(ctypes.c_float)]
    lib.rmt_validate_fc32.restype = ctypes.c_int32
    lib.rmt_reader_open.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int32]
    lib.rmt_reader_open.restype = ctypes.c_void_p
    lib.rmt_reader_next.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.rmt_reader_next.restype = ctypes.c_int64
    lib.rmt_reader_close.argtypes = [ctypes.c_void_p]
    lib.rmt_socket_open.argtypes = [
        ctypes.c_int32, ctypes.c_int64, ctypes.c_int32]
    lib.rmt_socket_open.restype = ctypes.c_void_p
    lib.rmt_socket_port.argtypes = [ctypes.c_void_p]
    lib.rmt_socket_port.restype = ctypes.c_int32
    lib.rmt_socket_next.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.rmt_socket_next.restype = ctypes.c_int64
    lib.rmt_socket_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


# ---------------------------------------------------------------------
# format conversion
# ---------------------------------------------------------------------
SC16_SCALE = 1.0 / 32767.0  # UHD's default sc16 full-scale mapping


def sc16_to_fc32(raw: np.ndarray, scale: float = SC16_SCALE) -> np.ndarray:
    """Interleaved int16 IQ -> complex64.  raw: int16 array, even length."""
    raw = np.ascontiguousarray(raw, dtype=np.int16)
    n_iq = raw.size // 2
    raw = raw[: n_iq * 2]  # drop a trailing half-sample (truncated capture)
    lib = _load()
    if lib is None:
        return (raw.astype(np.float32) * scale).view(np.complex64)
    out = np.empty(n_iq * 2, dtype=np.float32)
    lib.rmt_sc16_to_fc32(
        raw.ctypes.data_as(ctypes.c_void_p),
        out.ctypes.data_as(ctypes.c_void_p),
        n_iq,
        ctypes.c_float(scale),
    )
    return out.view(np.complex64)


def fc32_to_sc16(iq: np.ndarray, scale: float = 32767.0) -> np.ndarray:
    """complex64 -> interleaved int16 IQ with clamping."""
    iq = np.ascontiguousarray(iq, dtype=np.complex64)
    flat = iq.view(np.float32)
    lib = _load()
    if lib is None:
        return np.clip(np.rint(flat * scale), -32768, 32767).astype(np.int16)
    out = np.empty(flat.size, dtype=np.int16)
    lib.rmt_fc32_to_sc16(
        flat.ctypes.data_as(ctypes.c_void_p),
        out.ctypes.data_as(ctypes.c_void_p),
        iq.size,
        ctypes.c_float(scale),
    )
    return out


def validate_fc32(iq: np.ndarray) -> tuple[bool, float]:
    """(finite, peak_magnitude) scan for ingest failure detection."""
    iq = np.ascontiguousarray(iq, dtype=np.complex64)
    flat = iq.view(np.float32)
    lib = _load()
    if lib is None:
        return bool(np.isfinite(flat).all()), float(np.abs(flat).max(initial=0.0))
    peak = ctypes.c_float(0.0)
    bad = lib.rmt_validate_fc32(
        flat.ctypes.data_as(ctypes.c_void_p), flat.size, ctypes.byref(peak)
    )
    return bad == 0, float(peak.value)


# ---------------------------------------------------------------------
# background-prefetch block reader
# ---------------------------------------------------------------------
class StreamReader:
    """Iterate complex64 blocks of a capture file with background prefetch.

    The native reader double-buffers ahead of the consumer (like the
    reference's rx thread filling buffers while the main thread drains,
    but single-writer and race-free); pure-Python fallback reads
    synchronously.
    """

    def __init__(self, path: str | os.PathLike, block_samples: int = 1 << 20,
                 n_buffers: int = 4):
        self.path = str(path)
        self.block_samples = block_samples
        self.block_bytes = block_samples * 8  # complex64
        self._lib = _load()
        self._handle = None
        self._fh = None
        if self._lib is not None:
            self._handle = self._lib.rmt_reader_open(
                self.path.encode(), self.block_bytes, n_buffers
            )
            if not self._handle:
                raise FileNotFoundError(self.path)
        else:
            self._fh = open(self.path, "rb")

    def __iter__(self):
        return self

    def __next__(self) -> np.ndarray:
        if self._handle is not None:
            buf = np.empty(self.block_bytes, dtype=np.uint8)
            got = self._lib.rmt_reader_next(
                self._handle, buf.ctypes.data_as(ctypes.c_void_p)
            )
            if got == 0:
                raise StopIteration
            return buf[:got].view(np.complex64)
        data = self._fh.read(self.block_bytes)
        if not data:
            raise StopIteration
        return np.frombuffer(data, dtype=np.complex64).copy()

    def close(self) -> None:
        if self._handle is not None:
            self._lib.rmt_reader_close(self._handle)
            self._handle = None
        if self._fh is not None:
            self._fh.close()
            self._fh = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass


# ---------------------------------------------------------------------
# live TCP IQ source
# ---------------------------------------------------------------------
class SocketReader:
    """Receive complex64 IQ blocks from a TCP sender (the live-radio
    analog of StreamReader: the reference's rx_worker recv loop,
    mimo/main.cc:872-877, with the prefetch ring in native C++).

    Binds 127.0.0.1 (port=0 auto-assigns; read .port), accepts ONE
    sender; iteration yields blocks until the sender closes.  Requires
    the native library (no Python fallback — this is a runtime feature,
    not a numerics one; a pure-Python equivalent would just be the
    socket stdlib).
    """

    def __init__(self, port: int = 0, block_samples: int = 1 << 16,
                 n_buffers: int = 8):
        self._lib = _load()
        if self._lib is None:
            raise RuntimeError("native ingest library unavailable")
        self.block_samples = block_samples
        self.block_bytes = block_samples * 8
        self._handle = self._lib.rmt_socket_open(
            port, self.block_bytes, n_buffers
        )
        if not self._handle:
            raise OSError(f"could not bind 127.0.0.1:{port}")
        self.port = int(self._lib.rmt_socket_port(self._handle))

    def __iter__(self):
        return self

    def __next__(self) -> np.ndarray:
        buf = np.empty(self.block_bytes, dtype=np.uint8)
        got = self._lib.rmt_socket_next(
            self._handle, buf.ctypes.data_as(ctypes.c_void_p)
        )
        if got == 0:
            raise StopIteration
        n = (int(got) // 8) * 8  # whole complex64 samples only
        return buf[:n].view(np.complex64)

    def close(self) -> None:
        if self._handle is not None:
            self._lib.rmt_socket_close(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
