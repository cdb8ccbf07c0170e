"""Native C++ decoder vs numpy codec: identical outputs, incl. overflow
markers.  Skipped when native/libevio.so hasn't been built."""

import numpy as np
import pytest

from async_ev_cnn_tpu.data import native
from async_ev_cnn_tpu.data.file_reader import NReader

pytestmark = pytest.mark.skipif(not native.available(), reason="libevio.so not built")


def write_file(tmp_path, rng, n=1000, with_overflow=True):
    x = rng.randint(0, 256, n).astype(np.int32)
    y = rng.randint(0, 239, n).astype(np.int32)
    ts = np.sort(rng.randint(0, 2**22, n)).astype(np.int32)
    p = rng.randint(0, 2, n).astype(np.int32)
    if with_overflow:
        # splice overflow marker rows (y == 240) into the raw byte stream
        y_marked = y.copy()
        for i in (n // 8, n // 2):
            y_marked[i] = 240
        raw = NReader.encode(x, y_marked, ts, p)
    else:
        raw = NReader.encode(x, y, ts, p)
    path = str(tmp_path / "ex.bin")
    np.frombuffer(raw, np.uint8).tofile(path)
    return path


def test_native_matches_numpy(tmp_path, rng):
    path = write_file(tmp_path, rng)
    raw = np.fromfile(path, np.uint8)
    l_np, *np_out = NReader.decode(raw)
    l_nat, *nat_out = native.decode_ndata_file(path)
    assert l_nat == l_np
    for a, b in zip(nat_out, np_out):
        np.testing.assert_array_equal(a, b)


def test_native_batch(tmp_path, rng):
    paths = [write_file(tmp_path / f"{i}" if False else tmp_path, rng)
             for i in range(1)]
    paths = []
    for i in range(5):
        d = tmp_path / f"f{i}"
        d.mkdir()
        paths.append(write_file(d, rng, n=200 + i * 37))
    outs = native.decode_ndata_batch(paths)
    assert len(outs) == 5
    for path, (l, x, y, ts, p) in zip(paths, outs):
        raw = np.fromfile(path, np.uint8)
        l2, x2, y2, ts2, p2 = NReader.decode(raw)
        assert l == l2
        np.testing.assert_array_equal(x, x2)
        np.testing.assert_array_equal(ts, ts2)


def test_native_aedat20_matches_numpy(tmp_path, rng, monkeypatch):
    from async_ev_cnn_tpu.data.file_reader import AerReader

    n = 500
    x = rng.randint(0, 128, n).astype(np.int32)
    y = rng.randint(0, 128, n).astype(np.int32)
    ts = np.sort(rng.randint(0, 2**28, n)).astype(np.int32)
    p = rng.randint(0, 2, n).astype(np.int32)
    path = str(tmp_path / "a20.aedat")
    r = AerReader("DVS128")
    r.save_example(path, x, y, ts, p, version="2.0")
    out_nat = r.read_example(path)
    monkeypatch.setattr(native, "available", lambda: False)
    out_np = r.read_example(path)
    assert out_nat[0] == out_np[0] == n
    for a, b in zip(out_nat[1:], out_np[1:]):
        np.testing.assert_array_equal(a, b)


def test_nreader_uses_native(tmp_path, rng, monkeypatch):
    path = write_file(tmp_path, rng)
    out_native = NReader().read_example(path)
    monkeypatch.setattr(native, "available", lambda: False)
    out_numpy = NReader().read_example(path)
    assert out_native[0] == out_numpy[0]
    for a, b in zip(out_native[1:], out_numpy[1:]):
        np.testing.assert_array_equal(a, b)


def test_native_evt3_matches_numpy(rng, tmp_path):
    """The C++ EVT3 decoder must be bit-exact vs the vectorized numpy
    decoder on round-trip streams (incl. multi-wrap time gaps) and on
    hand-assembled vector-event words."""
    from async_ev_cnn_tpu.data import native
    from async_ev_cnn_tpu.data.evt import Evt3Reader, _split_header

    if not native.available():
        pytest.skip("native library not built")
    codec = Evt3Reader()
    f = str(tmp_path / "a.raw")

    def compare(path):
        with open(path, "rb") as fh:
            payload = _split_header(fh.read())
        nat = native.decode_evt3(payload)
        assert nat is not None
        ref = codec._decode(np.frombuffer(payload, dtype="<u2"))
        for a, b in zip(nat, ref):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # round-trip stream with multi-wrap gaps, total kept inside the int32
    # µs contract (both decoders now raise past 2^31 instead of wrapping)
    n = 300
    gaps = rng.randint(0, 2**20, n).astype(np.int64)
    gaps[rng.choice(n, 4, replace=False)] = rng.randint(
        2**25, 2**26, 4
    )  # k>=2 TIME_HIGH wraps
    ts = np.cumsum(gaps)
    assert int(ts[-1]) < 2**31
    codec.save_example(f, rng.randint(0, 1280, n), rng.randint(0, 720, n),
                       ts, rng.randint(0, 2, n))
    compare(f)

    # past the int32 contract both decoders refuse identically
    f_big = str(tmp_path / "big.raw")
    codec.save_example(f_big, [1, 2], [3, 4],
                       np.array([10, 2**31 + 9], np.int64), [0, 1])
    with open(f_big, "rb") as fh:
        payload_big = _split_header(fh.read())
    with pytest.raises(ValueError, match="int32"):
        native.decode_evt3(payload_big)
    with pytest.raises(ValueError, match="int32"):
        codec._decode(np.frombuffer(payload_big, dtype="<u2"))

    # hand-assembled vector events (VECT_BASE_X / VECT_12 / VECT_8)
    words = np.array([
        (0x8 << 12) | 0x001, (0x6 << 12) | 0x00A, (0x0 << 12) | 37,
        (0x3 << 12) | (1 << 11) | 100,
        (0x4 << 12) | 0b100000000101,
        (0x5 << 12) | 0b10000001,
        (0x2 << 12) | 55,
    ], dtype="<u2")
    with open(f, "wb") as fh:
        fh.write(b"% evt 3.0\n")
        fh.write(words.tobytes())
    compare(f)
