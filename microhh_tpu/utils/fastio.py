"""ctypes binding for the native async field writer (native/fastio.cpp).

Falls back to synchronous numpy ``tofile`` when the shared library is not
built.  Build once with::

    make -C native        # or: g++ -O3 -shared -fPIC -o native/libfastio.so \
                          #         native/fastio.cpp -lpthread
"""

import atexit
import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False


def _lib_path():
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.path.join(root, "native", "libfastio.so")


def _build():
    root = os.path.dirname(_lib_path())
    src = os.path.join(root, "fastio.cpp")
    try:
        subprocess.check_call(
            ["g++", "-O3", "-shared", "-fPIC", "-o", _lib_path(), src, "-lpthread"],
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        return True
    except Exception:
        return False


def get_lib():
    """Load (building on first use) the native library, or None."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    path = _lib_path()
    if not os.path.exists(path) and not _build():
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    lib.fastio_init.argtypes = [ctypes.c_int]
    lib.fastio_write.argtypes = [ctypes.c_char_p, ctypes.c_void_p, ctypes.c_long]
    lib.fastio_flush.argtypes = []
    lib.fastio_shutdown.argtypes = []
    lib.fastio_errors.restype = ctypes.c_long
    lib.fastio_init(2)
    atexit.register(lib.fastio_shutdown)
    _LIB = lib
    return _LIB


def write_array(path, arr):
    """Write a numpy array asynchronously (sync fallback without the lib)."""
    lib = get_lib()
    arr = np.ascontiguousarray(arr)
    if lib is None:
        arr.tofile(path)
        return
    rc = lib.fastio_write(path.encode(), arr.ctypes.data_as(ctypes.c_void_p),
                          arr.nbytes)
    if rc != 0:
        arr.tofile(path)


def flush():
    lib = get_lib()
    if lib is not None:
        lib.fastio_flush()


def errors():
    lib = get_lib()
    return 0 if lib is None else int(lib.fastio_errors())
