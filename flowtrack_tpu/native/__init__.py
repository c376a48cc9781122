"""Native (C++) host ops: cpu_nms / cpu_oks_nms.

TPU-native equivalent of the reference's lib/nms Cython+CUDA package
(SURVEY.md section 3 native census item 4). Compiled lazily with g++ at
first use (plain C ABI, ctypes binding — no Python.h); the numpy
implementations in ops/nms.py are the fallback and the test oracle.
"""

from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess
from typing import Optional

import numpy as np

log = logging.getLogger("flowtrack.native")

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "nms.cc")
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _lib_path() -> str:
    """Cache path keyed by the source hash: a cached .so is only reused if
    it was built from the CURRENT nms.cc (no binaries are checked into git;
    a stale or foreign blob can never be silently dlopen'd)."""
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:12]
    return os.path.join(_HERE, f"_libnms_{digest}.so")


def _build(path: str) -> Optional[str]:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
           "-o", path]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return path
    except Exception as e:  # pragma: no cover - depends on toolchain
        log.warning("native nms build failed (%s); using numpy fallback", e)
        return None


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    want = _lib_path()
    path = want if os.path.exists(want) else _build(want)
    if path is None:
        _build_failed = True
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:  # stale binary for another arch: rebuild once
        os.unlink(path)
        path = _build(want)
        if path is None:
            _build_failed = True
            return None
        lib = ctypes.CDLL(path)
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.cpu_nms.restype = ctypes.c_int
    lib.cpu_nms.argtypes = [f32p, f32p, ctypes.c_int, ctypes.c_float, i32p]
    lib.cpu_oks_nms.restype = ctypes.c_int
    lib.cpu_oks_nms.argtypes = [f32p, f32p, f32p, ctypes.c_int,
                                ctypes.c_int, f32p, ctypes.c_float,
                                ctypes.c_float, ctypes.c_int, i32p]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def cpu_nms(dets: np.ndarray, thresh: float):
    """dets: (N, 5) [x1, y1, x2, y2, score] -> kept indices (desc score).

    C++ path when the toolchain is available, numpy fallback otherwise
    (identical results, tested)."""
    dets = np.ascontiguousarray(dets, np.float32)
    n = len(dets)
    if n == 0:
        return []
    lib = _load()
    if lib is None:
        from flowtrack_tpu.ops.nms import nms_boxes_np

        return nms_boxes_np(dets.astype(np.float64), thresh)
    keep = np.zeros(n, np.int32)
    boxes = np.ascontiguousarray(dets[:, :4])
    scores = np.ascontiguousarray(dets[:, 4])
    m = lib.cpu_nms(boxes, scores, n, float(thresh), keep)
    return keep[:m].tolist()


def cpu_oks_nms(kpts_list, thresh: float, sigmas=None, in_vis_thre=None):
    """Reference-layout oks_nms (see ops/nms.oks_nms_np) in C++."""
    from flowtrack_tpu.config import COCO_SIGMAS

    n = len(kpts_list)
    if n == 0:
        return []
    lib = _load()
    if lib is None:
        from flowtrack_tpu.ops.nms import oks_nms_np

        return oks_nms_np(kpts_list, thresh, sigmas, in_vis_thre)
    kpts = np.ascontiguousarray(
        [np.asarray(d["keypoints"], np.float32).reshape(-1)
         for d in kpts_list], np.float32)
    scores = np.ascontiguousarray([d["score"] for d in kpts_list],
                                  np.float32)
    areas = np.ascontiguousarray([d["area"] for d in kpts_list], np.float32)
    k = kpts.shape[1] // 3
    sig = np.ascontiguousarray(sigmas if sigmas is not None else COCO_SIGMAS,
                               np.float32)
    keep = np.zeros(n, np.int32)
    m = lib.cpu_oks_nms(kpts, scores, areas, n, k, sig, float(thresh),
                        float(in_vis_thre or 0.0),
                        1 if in_vis_thre is not None else 0, keep)
    return keep[:m].tolist()
