"""Native host runtime: ctypes bindings over runtime.cpp (built on demand).

See runtime.cpp for the component mapping to the reference's threading and
hardware I/O.  The shared library is compiled once per machine into the
package directory; rebuilds happen automatically when the source is newer.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "runtime.cpp")
_SO = os.path.join(_DIR, "libbggrt.so")
_lock = threading.Lock()
_lib = None


def _build():
    subprocess.run(
        ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO],
        check=True)


def lib() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is None:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                _build()
            L = ctypes.CDLL(_SO)
            L.bgg_tb_create.restype = ctypes.c_void_p
            L.bgg_tb_create.argtypes = [ctypes.c_size_t]
            L.bgg_tb_destroy.argtypes = [ctypes.c_void_p]
            L.bgg_tb_write.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
            L.bgg_tb_read.restype = ctypes.c_int
            L.bgg_tb_read.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
            L.bgg_rate_create.restype = ctypes.c_void_p
            L.bgg_rate_create.argtypes = [ctypes.c_double]
            L.bgg_rate_destroy.argtypes = [ctypes.c_void_p]
            L.bgg_rate_wait.restype = ctypes.c_int64
            L.bgg_rate_wait.argtypes = [ctypes.c_void_p]
            L.bgg_rate_overruns.restype = ctypes.c_int64
            L.bgg_rate_overruns.argtypes = [ctypes.c_void_p]
            L.bgg_rate_ticks.restype = ctypes.c_int64
            L.bgg_rate_ticks.argtypes = [ctypes.c_void_p]
            L.bgg_lpf_create.restype = ctypes.c_void_p
            L.bgg_lpf_create.argtypes = [ctypes.c_size_t, ctypes.c_double,
                                         ctypes.c_double]
            L.bgg_lpf_destroy.argtypes = [ctypes.c_void_p]
            L.bgg_lpf_step.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                       ctypes.c_void_p]
            L.bgg_udp_create.restype = ctypes.c_void_p
            L.bgg_udp_create.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                         ctypes.c_char_p, ctypes.c_int]
            L.bgg_udp_destroy.argtypes = [ctypes.c_void_p]
            L.bgg_udp_send.restype = ctypes.c_long
            L.bgg_udp_send.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                       ctypes.c_size_t]
            L.bgg_udp_recv.restype = ctypes.c_long
            L.bgg_udp_recv.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                       ctypes.c_size_t]
            _lib = L
    return _lib


class TripleBuffer:
    """Wait-free latest-value channel (MPC thread -> control thread)."""

    def __init__(self, n_doubles: int):
        self._n = n_doubles
        self._h = lib().bgg_tb_create(n_doubles)

    def write(self, arr: np.ndarray):
        a = np.ascontiguousarray(arr, dtype=np.float64).reshape(-1)
        assert a.size == self._n
        lib().bgg_tb_write(self._h, a.ctypes.data_as(ctypes.c_void_p))

    def read(self) -> tuple[np.ndarray, bool]:
        out = np.empty(self._n, np.float64)
        fresh = lib().bgg_tb_read(self._h,
                                  out.ctypes.data_as(ctypes.c_void_p))
        return out, bool(fresh)

    def __del__(self):
        try:
            lib().bgg_tb_destroy(self._h)
        except Exception:
            pass


class RateLoop:
    """Absolute-deadline periodic loop (LoopFunc equivalent)."""

    def __init__(self, period_s: float):
        self._h = lib().bgg_rate_create(period_s)

    def wait(self) -> int:
        """Sleep to the next deadline; returns lateness (ns, >0 = overrun)."""
        return int(lib().bgg_rate_wait(self._h))

    @property
    def overruns(self) -> int:
        return int(lib().bgg_rate_overruns(self._h))

    @property
    def ticks(self) -> int:
        return int(lib().bgg_rate_ticks(self._h))

    def __del__(self):
        try:
            lib().bgg_rate_destroy(self._h)
        except Exception:
            pass


class LowPassBank:
    """Single-pole low-pass filter bank (HardwareRobot::LPF)."""

    def __init__(self, n: int, cutoff_hz: float, sample_hz: float):
        self._n = n
        self._h = lib().bgg_lpf_create(n, cutoff_hz, sample_hz)

    def step(self, x: np.ndarray) -> np.ndarray:
        a = np.ascontiguousarray(x, dtype=np.float64).reshape(-1)
        out = np.empty(self._n, np.float64)
        lib().bgg_lpf_step(self._h, a.ctypes.data_as(ctypes.c_void_p),
                           out.ctypes.data_as(ctypes.c_void_p))
        return out

    def __del__(self):
        try:
            lib().bgg_lpf_destroy(self._h)
        except Exception:
            pass


class UdpEndpoint:
    """Nonblocking UDP socket (robot I/O)."""

    def __init__(self, bind_ip: str, bind_port: int, peer_ip: str,
                 peer_port: int):
        self._h = lib().bgg_udp_create(bind_ip.encode(), bind_port,
                                       peer_ip.encode(), peer_port)
        if not self._h:
            raise OSError("failed to create UDP endpoint")

    def send(self, data: bytes) -> int:
        buf = (ctypes.c_char * len(data)).from_buffer_copy(data)
        return int(lib().bgg_udp_send(self._h, buf, len(data)))

    def recv(self, maxlen: int = 2048) -> bytes | None:
        buf = (ctypes.c_char * maxlen)()
        n = int(lib().bgg_udp_recv(self._h, buf, maxlen))
        if n < 0:
            return None
        return bytes(buf[:n])

    def __del__(self):
        try:
            lib().bgg_udp_destroy(self._h)
        except Exception:
            pass
