"""ctypes binding for the native C++ NPZ reader (native/npz_reader.cpp) and a
threaded prefetcher built on it.

ctypes calls release the GIL, so the C++ decode runs truly in parallel from a
plain Python ThreadPool — the data pipeline overlaps host decode with TPU steps
(the reference's AsyncVideoFrameLoader idea, misc.py:104-170, but GIL-free).

Default OFF (`UVMS2_NATIVE_NPZ=1` enables): on the single-vCPU dev box this
repo was built on, thread parallelism cannot win and numpy's reader (whose
zlib.decompress also drops the GIL) is marginally faster single-threaded; on
real multi-core TPU hosts the native pool is the intended data plane. The
PrefetchingNPZLoader works with either backend.
"""

from __future__ import annotations

import ctypes
import json
import logging
import os
import subprocess
import threading
from concurrent.futures import Future, ThreadPoolExecutor
from typing import Dict, Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libnpz_reader.so"))
_lock = threading.Lock()
_lib = None
_tried = False

_DTYPES = {
    ("f", 4): np.float32,
    ("f", 8): np.float64,
    ("f", 2): np.float16,
    ("i", 1): np.int8,
    ("i", 2): np.int16,
    ("i", 4): np.int32,
    ("i", 8): np.int64,
    ("u", 1): np.uint8,
    ("u", 2): np.uint16,
    ("u", 4): np.uint32,
    ("u", 8): np.uint64,
    ("b", 1): np.bool_,
}


def _build_lib() -> bool:
    try:
        subprocess.run(
            ["make", "-C", os.path.abspath(_NATIVE_DIR)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except Exception as e:  # noqa: BLE001
        logging.info("native npz reader unavailable (%s); using numpy fallback", e)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("UVMS2_NATIVE_NPZ", "0") != "1":
            return None
        if not os.path.exists(_LIB_PATH) and not _build_lib():
            return None
        lib = ctypes.CDLL(_LIB_PATH)
        lib.npz_list.restype = ctypes.c_int
        lib.npz_array_info.restype = ctypes.c_int
        lib.npz_read_array.restype = ctypes.c_int64
        _lib = lib
        return _lib


def native_available() -> bool:
    return get_lib() is not None


def load_npz(path: str, names=None) -> Dict[str, np.ndarray]:
    """Load arrays from an .npz via the C++ reader (numpy fallback)."""
    lib = get_lib()
    if lib is None:
        data = np.load(path)
        return {k: data[k] for k in (names or data.files)}
    bpath = path.encode()
    if names is None:
        buf = ctypes.create_string_buffer(1 << 16)
        rc = lib.npz_list(bpath, buf, ctypes.c_int64(len(buf)))
        if rc != 0:
            raise IOError(f"npz_list({path}) failed: {rc}")
        names = json.loads(buf.value.decode())
    out = {}
    for name in names:
        dt = ctypes.c_char()
        isz = ctypes.c_int()
        nd = ctypes.c_int()
        shape = (ctypes.c_int64 * 8)()
        rc = lib.npz_array_info(
            bpath, name.encode(), ctypes.byref(dt), ctypes.byref(isz),
            ctypes.byref(nd), shape,
        )
        if rc != 0:
            raise IOError(f"npz_array_info({path}, {name}) failed: {rc}")
        shp = tuple(shape[i] for i in range(nd.value))
        dtype = _DTYPES.get((dt.value.decode(), isz.value))
        if dtype is None:
            # unusual dtype — numpy fallback for this entry
            out[name] = np.load(path)[name]
            continue
        arr = np.empty(shp, dtype)
        n = lib.npz_read_array(
            bpath, name.encode(),
            arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.c_int64(arr.nbytes),
        )
        if n != arr.nbytes:
            raise IOError(f"npz_read_array({path}, {name}) returned {n}")
        out[name] = arr
    return out


class PrefetchingNPZLoader:
    """Read-ahead NPZ loading: schedule the next K videos on a thread pool while
    the current batch trains (GIL-free decode via the C++ reader)."""

    def __init__(self, num_workers: int = 4, ahead: int = 8):
        self.pool = ThreadPoolExecutor(max_workers=num_workers)
        self.ahead = ahead
        self._pending: Dict[str, Future] = {}

    def schedule(self, path: str, names=None):
        if path not in self._pending and len(self._pending) < self.ahead:
            self._pending[path] = self.pool.submit(load_npz, path, names)

    def get(self, path: str, names=None) -> Dict[str, np.ndarray]:
        fut = self._pending.pop(path, None)
        if fut is not None:
            return fut.result()
        return load_npz(path, names)
