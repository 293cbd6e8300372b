"""Isosurface extraction by marching tetrahedra (NumPy, host-side).

Replaces the reference's skimage ``marching_cubes`` dependency (reference:
slam/common/mesher.py:203-230, slam/algorithms/voxfusion.py:173-278). We use
marching *tetrahedra* instead of cubes: each cell splits into 6 tets whose
4-bit case table is derived programmatically below — no copied lookup
tables, identical surface accuracy (vertices are still linear zero-crossing
interpolations along cell edges), slightly more triangles.

Only cells whose corner signs are mixed are processed (surface cells are a
few % of the volume), so a 256^3 grid extracts in seconds.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_NATIVE_SO = os.path.join(_NATIVE_DIR, "build", "libxrdslam_native.so")
_native_lib = None


def _load_native():
    """Build (once) and load the C++ marching-tets library; None on failure."""
    global _native_lib
    if _native_lib is not None:
        return _native_lib if _native_lib is not False else None
    try:
        if not os.path.exists(_NATIVE_SO):
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True, capture_output=True)
        lib = ctypes.CDLL(_NATIVE_SO)
        lib.marching_tets.restype = ctypes.c_int64
        lib.marching_tets.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_float, ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ]
        _native_lib = lib
        return lib
    except Exception:
        _native_lib = False
        return None

# Cube corners in (x, y, z) bit order.
_CUBE_CORNERS = np.array(
    [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0], [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]], np.int64
)

# Split of the unit cube into 6 tetrahedra sharing the main diagonal 0-6.
_TETS = np.array(
    [[0, 5, 1, 6], [0, 1, 2, 6], [0, 2, 3, 6], [0, 3, 7, 6], [0, 7, 4, 6], [0, 4, 5, 6]], np.int64
)


def _build_tet_cases():
    """For each 4-bit inside-mask: list of triangles as 3 edges (ci, cj)."""
    cases = []
    for case in range(16):
        inside = [i for i in range(4) if case & (1 << i)]
        outside = [i for i in range(4) if not case & (1 << i)]
        tris = []
        if len(inside) == 1:
            a, o = inside[0], outside
            tris = [[(a, o[0]), (a, o[1]), (a, o[2])]]
        elif len(inside) == 3:
            a, i = outside[0], inside
            tris = [[(i[0], a), (i[2], a), (i[1], a)]]
        elif len(inside) == 2:
            (a, b), (c, d) = inside, outside
            tris = [[(a, c), (a, d), (b, d)], [(a, c), (b, d), (b, c)]]
        cases.append(tris)
    return cases


_TET_CASES = _build_tet_cases()


def marching_tetrahedra(
    volume: np.ndarray,
    level: float = 0.0,
    origin: Tuple[float, float, float] = (0.0, 0.0, 0.0),
    spacing: Tuple[float, float, float] = (1.0, 1.0, 1.0),
    mask: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Extract the ``level`` isosurface of ``volume`` [nx, ny, nz].

    Args:
        mask: optional [nx, ny, nz] bool — cells with any unmasked corner are
              skipped (used for keyframe-frustum mesh masking).
    Returns:
        (vertices [V, 3] float32 world coords, faces [F, 3] int64).
    """
    lib = _load_native()
    if lib is not None:
        return _marching_tets_native(lib, volume, level, origin, spacing, mask)
    return _marching_tets_numpy(volume, level, origin, spacing, mask)


def _marching_tets_native(lib, volume, level, origin, spacing, mask):
    vol = np.ascontiguousarray(volume, np.float32)
    nx, ny, nz = vol.shape
    org = np.asarray(origin, np.float64)
    spc = np.asarray(spacing, np.float64)
    m = None
    if mask is not None:
        m = np.ascontiguousarray(mask.astype(np.uint8))
    # surface cells are a few % of the volume in typical scenes; the C++
    # side STOPS at max_tris (truncating the sweep mid-volume), so retry
    # with a larger budget whenever the buffer saturates
    max_tris = max(int(nx * ny * nz * 0.25), 1 << 16)
    while True:
        out = np.empty((max_tris, 9), np.float32)
        n = lib.marching_tets(
            vol.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), nx, ny, nz,
            ctypes.c_float(level),
            org.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            spc.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            m.ctypes.data if m is not None else None,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), max_tris,
        )
        if n < max_tris:
            break
        max_tris *= 4
    if n == 0:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64)
    tris = out[:n].reshape(-1, 3, 3)
    return _dedup_triangles(tris)


def _dedup_triangles(tris: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    verts_flat = tris.reshape(-1, 3).astype(np.float64)
    keys = np.round(verts_flat * 1e5).astype(np.int64)
    uniq, inv = np.unique(keys, axis=0, return_inverse=True)
    first_idx = np.full(uniq.shape[0], np.iinfo(np.int64).max, np.int64)
    np.minimum.at(first_idx, inv, np.arange(inv.shape[0]))
    verts = verts_flat[first_idx]
    faces = inv.reshape(-1, 3)
    good = (faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2]) & (faces[:, 0] != faces[:, 2])
    return verts.astype(np.float32), faces[good].astype(np.int64)


def _marching_tets_numpy(volume, level, origin, spacing, mask):
    nx, ny, nz = volume.shape
    v = volume - level

    # corner values per cell, [8, cx, cy, cz]
    cell = np.stack(
        [v[cx : cx + nx - 1, cy : cy + ny - 1, cz : cz + nz - 1] for cx, cy, cz in _CUBE_CORNERS]
    )
    neg = cell < 0
    active = neg.any(0) & (~neg).any(0)
    if mask is not None:
        mcorner = np.stack(
            [mask[cx : cx + nx - 1, cy : cy + ny - 1, cz : cz + nz - 1] for cx, cy, cz in _CUBE_CORNERS]
        )
        active &= mcorner.all(0)
    idx = np.argwhere(active)  # [A, 3] cell coords
    if idx.shape[0] == 0:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64)

    corner_vals = cell[:, active].T  # [A, 8]
    corner_pos = idx[:, None, :] + _CUBE_CORNERS[None, :, :]  # [A, 8, 3] grid coords

    all_tris = []
    for tet in _TETS:
        tv = corner_vals[:, tet]  # [A, 4]
        tp = corner_pos[:, tet, :]  # [A, 4, 3]
        case = ((tv < 0) << np.arange(4)).sum(-1)  # [A]
        for c in range(1, 15):
            tris = _TET_CASES[c]
            if not tris:
                continue
            sel = case == c
            if not sel.any():
                continue
            sv = tv[sel]
            sp = tp[sel].astype(np.float64)
            for tri in tris:
                pts = []
                for (i, j) in tri:
                    vi, vj = sv[:, i], sv[:, j]
                    t = vi / np.where(np.abs(vi - vj) < 1e-12, 1e-12, vi - vj)
                    t = np.clip(t, 0.0, 1.0)
                    pts.append(sp[:, i, :] + t[:, None] * (sp[:, j, :] - sp[:, i, :]))
                all_tris.append(np.stack(pts, 1))  # [n, 3, 3]

    tris = np.concatenate(all_tris, 0)  # [T, 3, 3] grid coords
    verts_flat = tris.reshape(-1, 3)
    # dedup vertices (quantize to ~1e-5 cells for exact sharing of edge points)
    keys = np.round(verts_flat * 1e5).astype(np.int64)
    uniq, inv = np.unique(keys, axis=0, return_inverse=True)
    first_idx = np.full(uniq.shape[0], np.iinfo(np.int64).max, np.int64)
    np.minimum.at(first_idx, inv, np.arange(inv.shape[0]))
    verts = verts_flat[first_idx]
    faces = inv.reshape(-1, 3)
    # drop degenerate faces
    good = (faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2]) & (faces[:, 0] != faces[:, 2])
    faces = faces[good]

    verts = verts * np.asarray(spacing)[None, :] + np.asarray(origin)[None, :]
    return verts.astype(np.float32), faces.astype(np.int64)
