"""ctypes bindings for the native event decoder (``native/libevio.so``).

Loaded lazily; every entry point degrades to the numpy codecs in
``file_reader.py`` when the library isn't built.  Build with
``make -C native``.  Disable explicitly with ``ASYNC_EV_NATIVE=0``.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _lib_path() -> str:
    return os.path.join(os.path.dirname(__file__), "..", "..", "native", "libevio.so")


def get_lib():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("ASYNC_EV_NATIVE", "1") == "0":
        return None
    try:
        lib = ctypes.CDLL(os.path.abspath(_lib_path()))
    except OSError:
        return None
    i32p = ctypes.POINTER(ctypes.c_int32)
    u8p = ctypes.POINTER(ctypes.c_uint8)

    def cfg(name, restype, argtypes):
        # per-symbol: one missing OPTIONAL symbol in a stale library must
        # not leave the PRESENT ones unconfigured (an unconfigured int64
        # arg/return marshals as 32-bit — silent garbage decodes)
        try:
            fn = getattr(lib, name)
        except AttributeError:  # older library build
            return
        fn.restype = restype
        fn.argtypes = argtypes

    cfg("evio_decode_ndata", ctypes.c_int64, [u8p, ctypes.c_int64] + [i32p] * 4)
    cfg("evio_decode_ndata_batch_cap", None,
        [ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64,
         ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64)]
        + [i32p] * 4 + [ctypes.POINTER(ctypes.c_int64)])
    cfg("evio_decode_aedat31", ctypes.c_int64,
        [u8p, ctypes.c_int64, i32p, i32p,
         ctypes.POINTER(ctypes.c_int64), i32p])
    cfg("evio_decode_aedat20", ctypes.c_int64,
        [u8p, ctypes.c_int64] + [i32p] * 4)
    cfg("evio_decode_evt3", ctypes.c_int64,
        [u8p, ctypes.c_int64, ctypes.c_int64] + [i32p] * 4)
    _LIB = lib
    return _LIB


def available() -> bool:
    return get_lib() is not None


def _i32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def decode_ndata_file(path: str):
    """Native n-data decode; returns ``(length, x, y, ts, p)`` or None if the
    library is unavailable.

    Reads the bytes in Python and decodes the BUFFER: sizing the output
    arrays from os.path.getsize while the C side re-read the (possibly
    grown) file was a TOCTOU buffer overrun."""
    lib = get_lib()
    if lib is None:
        return None
    buf = np.fromfile(path, np.uint8)
    cap = buf.size // 5
    x = np.empty(cap, np.int32)
    y = np.empty(cap, np.int32)
    ts = np.empty(cap, np.int32)
    p = np.empty(cap, np.int32)
    n = lib.evio_decode_ndata(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), buf.size,
        _i32p(x), _i32p(y), _i32p(ts), _i32p(p))
    if n < 0:
        raise IOError(f"native decode failed for {path}")
    return int(n), x[:n], y[:n], ts[:n], p[:n]


def decode_aedat20(payload: np.ndarray):
    """Native AEDAT 2.0 payload decode (DVS128 masks); None if unavailable."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "evio_decode_aedat20"):
        return None
    payload = np.ascontiguousarray(payload, np.uint8)
    cap = payload.size // 8
    x = np.empty(cap, np.int32)
    y = np.empty(cap, np.int32)
    ts = np.empty(cap, np.int32)
    p = np.empty(cap, np.int32)
    n = int(lib.evio_decode_aedat20(
        payload.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), payload.size,
        _i32p(x), _i32p(y), _i32p(ts), _i32p(p),
    ))
    return n, x[:n], y[:n], ts[:n], p[:n]


def decode_aedat31(payload: np.ndarray):
    """Native AEDAT 3.1 packet-walk decode of a header-stripped payload.

    Returns ``(length, x, y, ts[int64], p)`` or None if unavailable.
    """
    lib = get_lib()
    if lib is None or not hasattr(lib, "evio_decode_aedat31"):
        return None
    payload = np.ascontiguousarray(payload, np.uint8)
    cap = payload.size // 8
    x = np.empty(cap, np.int32)
    y = np.empty(cap, np.int32)
    ts = np.empty(cap, np.int64)
    p = np.empty(cap, np.int32)
    n = lib.evio_decode_aedat31(
        payload.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), payload.size,
        _i32p(x), _i32p(y), ts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        _i32p(p),
    )
    n = int(n)
    return n, x[:n], y[:n], ts[:n], p[:n]


def decode_ndata_batch(paths: list[str]):
    """OpenMP-parallel batched decode of many n-data files.

    Returns a list of ``(length, x, y, ts, p)`` tuples.
    """
    lib = get_lib()
    if lib is None:
        return None
    if not hasattr(lib, "evio_decode_ndata_batch_cap"):
        return None  # stale library without the capacity-clamped entry
    caps = np.array([os.path.getsize(p) // 5 for p in paths], np.int64)
    offsets = np.zeros(len(paths), np.int64)
    np.cumsum(caps[:-1], out=offsets[1:])
    total = int(caps.sum())
    x = np.empty(total, np.int32)
    y = np.empty(total, np.int32)
    ts = np.empty(total, np.int32)
    p = np.empty(total, np.int32)
    lengths = np.empty(len(paths), np.int64)
    c_paths = (ctypes.c_char_p * len(paths))(*[s.encode() for s in paths])
    # the C side clamps each file to caps[i] records: without the clamp a
    # file that GREW between getsize and the decoder's own read overran
    # the output buffers (heap corruption)
    lib.evio_decode_ndata_batch_cap(
        c_paths, len(paths), offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        caps.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        _i32p(x), _i32p(y), _i32p(ts), _i32p(p),
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    out = []
    for i, path in enumerate(paths):
        n = int(lengths[i])
        if n < 0:
            raise IOError(f"native decode failed for {path}")
        o = int(offsets[i])
        out.append((n, x[o : o + n].copy(), y[o : o + n].copy(),
                    ts[o : o + n].copy(), p[o : o + n].copy()))
    return out


def decode_evt3(payload: bytes):
    """Native EVT3 payload decode (header-stripped); None if unavailable.

    The exact output capacity is counted with one cheap vectorized pass
    (ADDR_X words + set validity bits of VECT_12/VECT_8 words) so the
    C++ loop writes into exactly-sized arrays.
    """
    lib = get_lib()
    if lib is None or not hasattr(lib, "evio_decode_evt3"):
        return None
    buf = np.frombuffer(payload[: len(payload) & ~1], dtype="<u2")
    typ = buf >> 12
    val = (buf & 0xFFF).astype(np.uint32)
    # same int32-µs bound the numpy fallback enforces (evt.py): the
    # C++ loop's int32 ts can wrap all the way past negative for very
    # long recordings, so a min()<0 post-check alone is not equivalent
    th_seq = val[typ == 0x8].astype(np.int64)
    if th_seq.size:
        wraps = np.zeros(th_seq.size, np.int64)
        wraps[1:] = th_seq[1:] < th_seq[:-1]
        th_max = int((th_seq + (np.cumsum(wraps) << 12)).max())
        if th_max > (2**31 - 1) >> 12:
            raise ValueError(
                "EVT3 unwrapped timestamps exceed the int32 µs range "
                f"(TIME_HIGH reaches {th_max} > {(2**31 - 1) >> 12}); "
                "rebase or split the recording before decoding"
            )
    bits12 = val[typ == 0x4]
    bits8 = val[typ == 0x5] & 0xFF
    popcount = np.unpackbits(
        np.concatenate([bits12, bits8]).astype(">u2").view(np.uint8)
    ).sum() if (bits12.size or bits8.size) else 0
    cap = int((typ == 0x2).sum()) + int(popcount)
    x = np.empty(cap, np.int32)
    y = np.empty(cap, np.int32)
    ts = np.empty(cap, np.int32)
    p = np.empty(cap, np.int32)
    arr = np.ascontiguousarray(buf).view(np.uint8)
    n = int(lib.evio_decode_evt3(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), arr.size,
        cap, _i32p(x), _i32p(y), _i32p(ts), _i32p(p),
    ))
    if n < 0 or n != cap:
        # the prepass count and the C++ loop must agree exactly; any
        # mismatch means the two counting implementations diverged
        raise IOError(
            f"native EVT3 decode count mismatch: prepass {cap}, loop {n}"
        )
    if n and int(ts.min()) < 0:
        # wire times are non-negative, so a negative decoded µs value can
        # only be int32 wrap of a >2^31 µs (~35.8 min) recording — the
        # same condition the numpy fallback raises on explicitly
        raise ValueError(
            "EVT3 timestamps exceed the int32 µs range (decoded values "
            "wrapped negative); rebase or split the recording"
        )
    return n, x, y, ts, p


def crc32c(data: bytes):
    """CRC-32C via the native library (SSE4.2 crc32 instruction), or
    ``None`` when the library isn't built or predates the symbol —
    callers fall back to the Python table loop (utils/tf_bundle.py)."""
    lib = get_lib()
    if lib is None:
        return None
    try:
        fn = lib.evio_crc32c
    except AttributeError:  # stale libevio.so from before the symbol
        return None
    if fn.restype != ctypes.c_uint32:
        fn.restype = ctypes.c_uint32
        fn.argtypes = [ctypes.c_char_p, ctypes.c_int64]
    return int(fn(data, len(data)))
