"""Native (C++) runtime components, bound via ctypes.

The compute path is JAX/XLA/Pallas; host-side runtime pieces that the
reference delegates to native third-party code or hot Python loops live here
(SURVEY.md §2.3). Currently: the scenario generator / dataset sampler
(scripts/data_generation.py's role). Libraries build on first use with g++
and are cached next to the sources; all callers fall back to the pure-Python
implementation if no toolchain is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(__file__)
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_BUILD_FAILED = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    global _LIB, _BUILD_FAILED
    with _LOCK:
        if _LIB is not None:
            return _LIB
        if _BUILD_FAILED:
            return None
        src = os.path.join(_HERE, "scenario_gen.cpp")
        lib_path = os.path.join(_HERE, "libmcp_native.so")
        try:
            if not os.path.exists(lib_path) or os.path.getmtime(
                lib_path
            ) < os.path.getmtime(src):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", lib_path, src],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(lib_path)
            lib.mcp_generate_scenarios.restype = ctypes.c_int
            lib.mcp_generate_scenarios.argtypes = [
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_double,
                ctypes.c_double,
                ctypes.c_double,
                ctypes.c_uint64,
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double),
            ]
            _LIB = lib
            return lib
        except Exception:
            _BUILD_FAILED = True
            return None


def native_available() -> bool:
    return _build_and_load() is not None


def generate_scenarios_native(
    *,
    num_scenarios: int,
    num_players: int,
    arena_half_width: float,
    min_separation: float,
    max_speed: float,
    seed: int,
):
    """Native scenario sampling; returns (states (S,N,4), goals (S,N,2)) or
    None if the native library is unavailable."""
    lib = _build_and_load()
    if lib is None or num_players > 64:
        return None
    states = np.empty((num_scenarios, num_players, 4), dtype=np.float64)
    goals = np.empty((num_scenarios, num_players, 2), dtype=np.float64)
    n = lib.mcp_generate_scenarios(
        num_scenarios,
        num_players,
        arena_half_width,
        min_separation,
        max_speed,
        np.uint64(seed or 1),
        states.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        goals.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return states[:n], goals[:n]
