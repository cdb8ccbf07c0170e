"""Fuzz the file codecs: arbitrary bytes must decode to something or raise
cleanly — never hang or corrupt memory (the reader retry loop handles
raising files)."""

import numpy as np
import pytest

from async_ev_cnn_tpu.data.file_reader import AerReader, NReader, NumpyReader


@pytest.mark.parametrize("size", [0, 1, 4, 5, 37, 1024])
def test_ndata_fuzz(tmp_path, rng, size):
    path = str(tmp_path / "f.bin")
    rng.randint(0, 256, size, dtype=np.int64).astype(np.uint8).tofile(path)
    l, x, y, ts, p = NReader().read_example(path)
    assert l == len(x) == len(y) == len(ts) == len(p)
    assert l <= size // 5


@pytest.mark.parametrize("header", [b"", b"#!AER-DAT2.0\r\n", b"#!AER-DAT3.1\r\n#!END-HEADER\r\n"])
def test_aer_fuzz(tmp_path, rng, header):
    path = str(tmp_path / "f.aedat")
    payload = rng.randint(0, 256, 256, dtype=np.int64).astype(np.uint8).tobytes()
    with open(path, "wb") as f:
        f.write(header + payload)
    r = AerReader("DVS128")
    if not header:  # version 1.0 assumed -> clean NotImplementedError
        with pytest.raises(NotImplementedError):
            r.read_example(path)
        return
    l, x, y, ts, p = r.read_example(path)
    assert l == len(x)


def test_numpy_reader_garbage(tmp_path):
    path = str(tmp_path / "f.npy")
    with open(path, "wb") as f:
        f.write(b"not an npy file at all")
    with pytest.raises(Exception):
        NumpyReader().read_example(path)


@pytest.mark.parametrize("size", [0, 1, 2, 3, 64, 1023])
@pytest.mark.parametrize("header", [b"", b"% evt 3.0\n% format EVT3\n", b"% truncated-no-newline"])
def test_evt_fuzz(tmp_path, rng, size, header):
    from async_ev_cnn_tpu.data.evt import Evt2Reader, Evt3Reader

    path = str(tmp_path / "f.raw")
    payload = rng.randint(0, 256, size, dtype=np.int64).astype(np.uint8).tobytes()
    with open(path, "wb") as f:
        f.write(header + payload)
    for codec in (Evt2Reader(), Evt3Reader()):
        try:
            l, x, y, ts, p = codec.read_example(path)
        except ValueError:
            # random bytes can assemble wire times past the int32 µs
            # contract; the decoders now refuse those explicitly instead of
            # wrapping — a clean raise is a valid fuzz outcome (the reader
            # retry loop skips raising files)
            continue
        assert l == len(x) == len(y) == len(ts) == len(p)
