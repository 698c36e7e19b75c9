"""ctypes surface of the hctpu native runtime."""

from __future__ import annotations

import ctypes
import pathlib
import subprocess
import threading

_HERE = pathlib.Path(__file__).resolve().parent
_SRC = _HERE.parent.parent / "native"
_LIB_PATH = _HERE / "libhctpu.so"

# reference exit-code table (SURVEY.md §2.7) for error messages
_ERRORS = {
    6: "invalid size of input 2D data detected",
    8: "invalid or missing Huffman coding header",
    9: "invalid Huffman coding file contents",
    10: "invalid or missing adaptive block RLE header",
    11: "invalid adaptive block RLE header",
    12: "too small 2D data dimensions",
    13: "invalid adaptive block RLE file contents",
    14: "unexpected end of adaptive block RLE data",
    15: "leftover data of adaptive block RLE detected",
    40: "invalid v2 container",
    99: "internal error in native runtime",
}


class NativeError(RuntimeError):
    """Raised when the native runtime reports a reference error code."""

    def __init__(self, code: int):
        super().__init__(_ERRORS.get(code, f"native error {code}"))
        self.code = code


_lock = threading.Lock()
_lib = None


def _build() -> None:
    subprocess.run(
        ["make", "-C", str(_SRC)], check=True, capture_output=True
    )


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not _LIB_PATH.exists():
            _build()
        lib = ctypes.CDLL(str(_LIB_PATH))
        u8p = ctypes.POINTER(ctypes.c_uint8)
        out_t = ctypes.POINTER(u8p)
        n_t = ctypes.POINTER(ctypes.c_uint64)
        lib.hctpu_v1_compress.argtypes = [
            u8p, ctypes.c_uint64, ctypes.c_int, ctypes.c_int,
            ctypes.c_uint64, ctypes.c_int, ctypes.c_int, out_t, n_t,
        ]
        lib.hctpu_v1_decompress.argtypes = [
            u8p, ctypes.c_uint64, ctypes.c_int, out_t, n_t,
        ]
        lib.hctpu_v2_compress.argtypes = [
            u8p, ctypes.c_uint64, ctypes.c_int, ctypes.c_int,
            ctypes.c_uint64, ctypes.c_uint32, ctypes.c_int, out_t, n_t,
        ]
        lib.hctpu_v2_decompress.argtypes = [
            u8p, ctypes.c_uint64, ctypes.c_int, out_t, n_t,
        ]
        lib.hctpu_rle_encode.argtypes = [u8p, ctypes.c_uint64, out_t, n_t]
        lib.hctpu_rle_decode.argtypes = [u8p, ctypes.c_uint64, out_t, n_t]
        lib.hctpu_free.argtypes = [u8p]
        for fn in (
            lib.hctpu_v1_compress, lib.hctpu_v1_decompress,
            lib.hctpu_v2_compress, lib.hctpu_v2_decompress,
            lib.hctpu_rle_encode, lib.hctpu_rle_decode,
        ):
            fn.restype = ctypes.c_int
        _lib = lib
        return lib


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def _buf(data: bytes):
    return (ctypes.c_uint8 * max(1, len(data))).from_buffer_copy(
        data if data else b"\x00"
    )


def _call(fn, data: bytes, *args) -> bytes:
    lib = _load()
    out = ctypes.POINTER(ctypes.c_uint8)()
    out_n = ctypes.c_uint64()
    rc = fn(_buf(data), len(data), *args, ctypes.byref(out), ctypes.byref(out_n))
    if rc != 0:
        raise NativeError(rc)
    try:
        return ctypes.string_at(out, out_n.value)
    finally:
        lib.hctpu_free(out)


def v1_compress(data: bytes, use_diff: bool = False, use_adapt: bool = False,
                width: int = 512, exact: bool = False,
                n_threads: int = 0) -> bytes:
    """Reference-compatible v1 compression (bit-exact with the C++ binary)."""
    lib = _load()
    import os

    threads = n_threads or (os.cpu_count() or 1)
    return _call(lib.hctpu_v1_compress, data, int(use_diff), int(use_adapt),
                 width, int(exact), threads)


def v1_decompress(blob: bytes, exact: bool = False) -> bytes:
    lib = _load()
    return _call(lib.hctpu_v1_decompress, blob, int(exact))


def v2_compress(data: bytes, use_diff: bool = False, use_adapt: bool = False,
                width: int = 512, chunk_size: int = 1 << 16,
                n_threads: int = 0) -> bytes:
    """Framework-native chunked container (host thread-parallel encode)."""
    lib = _load()
    import os

    threads = n_threads or (os.cpu_count() or 1)
    return _call(lib.hctpu_v2_compress, data, int(use_diff), int(use_adapt),
                 width, chunk_size, threads)


def v2_decompress(blob: bytes, n_threads: int = 0) -> bytes:
    lib = _load()
    import os

    threads = n_threads or (os.cpu_count() or 1)
    return _call(lib.hctpu_v2_decompress, blob, threads)


def rle_encode(data: bytes) -> bytes:
    return _call(_load().hctpu_rle_encode, data)


def rle_decode(data: bytes) -> bytes:
    return _call(_load().hctpu_rle_decode, data)
