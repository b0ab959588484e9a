"""ctypes binding for the C++ reference oracle.

Builds ``liboracle.so`` from ``cpp/reference_oracle.cpp`` with g++ on first
use (cached beside the source; no pip/pybind dependency) and exposes
``cpp_oracle_render`` with the same signature shape as ``oracle_render``.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

from ..config import CameraConfig, RenderConfig
from ..scene.flat import FlatScene

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "cpp", "reference_oracle.cpp")
_LIB = os.path.join(_HERE, "cpp", "liboracle.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None

SPH_W, TRI_W, MAT_W, LIGHT_W, GRP_W = 8, 16, 16, 8, 4


def build_library(force: bool = False) -> str:
    with _lock:
        if force or not os.path.exists(_LIB) or (
                os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-o", _LIB, _SRC],
                check=True, capture_output=True, text=True)
    return _LIB


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        path = build_library()
        lib = ctypes.CDLL(path)
        d = ctypes.POINTER(ctypes.c_double)
        lib.oracle_render.restype = None
        lib.oracle_render.argtypes = [
            d, ctypes.c_int, d, ctypes.c_int, d, ctypes.c_int, d,
            ctypes.c_int, d, ctypes.c_int, d, d,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_double, ctypes.c_double, ctypes.c_int, ctypes.c_int, d]
        _lib = lib
    return _lib


def _pack(scene: FlatScene):
    f = lambda x: np.asarray(x, np.float64)
    tv = np.asarray(scene.tri_valid)
    sv = np.asarray(scene.sph_valid)

    ns = int(sv.sum())
    sph = np.zeros((max(ns, 1), SPH_W))
    sph[:ns, 0:3] = f(scene.sph_center)[sv]
    sph[:ns, 3] = f(scene.sph_radius)[sv]
    sph[:ns, 4] = np.asarray(scene.sph_mat)[sv]
    sph[:ns, 5] = np.asarray(scene.sph_group)[sv]

    nt = int(tv.sum())
    tri = np.zeros((max(nt, 1), TRI_W))
    tri[:nt, 0:3] = f(scene.tri_v0)[tv]
    tri[:nt, 3:6] = f(scene.tri_v1)[tv]
    tri[:nt, 6:9] = f(scene.tri_v2)[tv]
    tri[:nt, 9] = np.asarray(scene.tri_mat)[tv]
    tri[:nt, 10] = np.asarray(scene.tri_checker)[tv]
    tri[:nt, 11] = np.asarray(scene.tri_group)[tv]

    m = scene.num_materials
    mat = np.zeros((m, MAT_W))
    mat[:, 0:3] = f(scene.mat_ambient)
    mat[:, 3:6] = f(scene.mat_diffuse)
    mat[:, 6:9] = f(scene.mat_specular)
    mat[:, 9:12] = f(scene.mat_transparency)
    mat[:, 12] = f(scene.mat_refraction)

    nl = scene.num_lights
    light = np.zeros((max(nl, 1), LIGHT_W))
    light[:nl, 0:3] = f(scene.light_pos)
    light[:nl, 3:6] = f(scene.light_color)

    ng = scene.num_groups
    grp = np.zeros((max(ng, 1), GRP_W))
    grp[:ng, 0:3] = f(scene.grp_center)
    grp[:ng, 3] = f(scene.grp_radius)

    board = np.zeros(8)
    board[0:3] = f(scene.board_pos)
    board[3] = float(scene.board_half)
    board[4] = float(scene.board_square)
    board[5], board[6] = scene.checker_mats
    return sph, ns, tri, nt, mat, m, light, nl, grp, ng, board


def cpp_oracle_render(scene: FlatScene, camera: CameraConfig,
                      config: RenderConfig) -> np.ndarray:
    """[H,W,3] float64 render via the C++ oracle (j=0 bottom scanline)."""
    lib = _load()
    sph, ns, tri, nt, mat, m, light, nl, grp, ng, board = _pack(scene)

    bx, by = camera.bottom(config.width, config.height)
    cam = np.array(list(camera.eye) + list(camera.look_at) + list(camera.up)
                   + [bx, by, camera.pixel_scale], np.float64)

    out = np.zeros((config.height, config.width, 3), np.float64)
    d = ctypes.POINTER(ctypes.c_double)
    as_p = lambda a: a.ctypes.data_as(d)
    lib.oracle_render(
        as_p(sph), ns, as_p(tri), nt, as_p(mat), m, as_p(light), nl,
        as_p(grp), ng, as_p(board), as_p(cam),
        config.width, config.height, config.max_depth,
        config.small_number, config.attenuation_factor,
        1 if config.prune else 0, 1, as_p(out))
    return out
