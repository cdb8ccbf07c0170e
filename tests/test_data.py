"""Data-plane tests: codec round-trips, dataset engine, detection variant."""

import os

import numpy as np
import pytest

from async_ev_cnn_tpu.data import detection_reader, event_reader
from async_ev_cnn_tpu.data.file_reader import AerReader, NReader, NumpyReader, factory


def random_events(rng, n=500, max_xy=128, max_ts=2**22):
    x = rng.randint(0, max_xy, n).astype(np.int32)
    y = rng.randint(0, min(max_xy, 239), n).astype(np.int32)  # 240 is reserved
    ts = np.sort(rng.randint(0, max_ts, n)).astype(np.int32)
    p = rng.randint(0, 2, n).astype(np.int32)
    return x, y, ts, p


# ---- format codecs ----------------------------------------------------------


def test_ndata_roundtrip(tmp_path, rng):
    x, y, ts, p = random_events(rng)
    path = str(tmp_path / "ex.bin")
    r = NReader()
    r.save_example(path, x, y, ts, p)
    l2, x2, y2, ts2, p2 = r.read_example(path)
    assert l2 == len(x)
    np.testing.assert_array_equal(x2, x)
    np.testing.assert_array_equal(y2, y)
    np.testing.assert_array_equal(ts2, ts)
    np.testing.assert_array_equal(p2, p)


def test_ndata_timestamp_overflow_markers():
    # hand-build a stream with an overflow marker row (y == 240)
    ev = NReader.encode([5, 0, 6], [7, 240, 8], [100, 0, 200], [1, 0, 0])
    l, x, y, ts, p = NReader.decode(np.frombuffer(ev, np.uint8))
    assert l == 2
    np.testing.assert_array_equal(x, [5, 6])
    np.testing.assert_array_equal(ts, [100, 200 + 2**13])  # post-marker bump


def test_ndata_roundtrip_past_23bit_ts(tmp_path, rng):
    """Recordings longer than the 23-bit raw ts field (~8.39 s) must
    round-trip via emitted y==240 overflow markers — the old writer
    masked ts to 23 bits silently and re-reads jumped backwards."""
    x = np.array([1, 2, 3, 4], np.int32)
    y = np.array([5, 6, 7, 8], np.int32)
    ts = np.array([100, 2**23 - 1, 2**23 + 5, 2**24 + 3], np.int64)
    p = np.array([0, 1, 0, 1], np.int32)
    path = str(tmp_path / "long.bin")
    r = NReader()
    r.save_example(path, x, y, ts, p)
    l2, x2, y2, ts2, p2 = r.read_example(path)
    assert l2 == 4
    np.testing.assert_array_equal(x2, x)
    np.testing.assert_array_equal(y2, y)
    np.testing.assert_array_equal(ts2, ts)
    np.testing.assert_array_equal(p2, p)
    # the numpy decode path agrees with whatever read_example used
    l3, x3, y3, ts3, p3 = NReader.decode(
        np.fromfile(path, dtype=np.uint8))
    np.testing.assert_array_equal(ts3, ts)


def test_aedat20_truncated_file_stays_aligned(tmp_path, rng):
    """A 2.0 file truncated mid-event (odd int32 word count) must decode
    the complete events with ts aligned to x/y/p — not return mismatched
    array lengths."""
    x, y, ts, p = random_events(rng, n=50, max_xy=127)
    path = str(tmp_path / "trunc.aedat")
    r = AerReader("DVS128")
    r.save_example(path, x, y, ts, p, version="2.0")
    raw = open(path, "rb").read()
    open(path, "wb").write(raw[:-4])  # drop the last word (half an event)
    l2, x2, y2, ts2, p2 = r.read_example(path)
    assert l2 == len(x2) == len(y2) == len(ts2) == len(p2) == 49
    np.testing.assert_array_equal(x2, x[:49])
    np.testing.assert_array_equal(ts2, ts[:49])


def test_aedat20_roundtrip(tmp_path, rng):
    # DVS128: 7-bit coords, polarity bit
    x, y, ts, p = random_events(rng, n=300, max_xy=127)
    path = str(tmp_path / "ex20.aedat")
    r = AerReader("DVS128")
    r.save_example(path, x, y, ts, p, version="2.0")
    l2, x2, y2, ts2, p2 = r.read_example(path)
    assert l2 == len(x)
    np.testing.assert_array_equal(x2, x)
    np.testing.assert_array_equal(y2, y)
    np.testing.assert_array_equal(ts2, ts)
    np.testing.assert_array_equal(p2, p)


@pytest.mark.parametrize("camera,max_x,max_y", [
    ("DAVIS240", 239, 179),
    ("DAVIS346", 345, 259),
])
def test_aedat20_roundtrip_davis(tmp_path, rng, camera, max_x, max_y):
    """DAVIS cameras use jAER's 32-bit apsDVS address layout (y 30:22,
    x 21:12, polarity bit 11) — superset over the reference's DVS128-only
    table (/root/reference/src/readers/file_reader.py:96-106)."""
    n = 300
    x = rng.randint(0, max_x + 1, n).astype(np.int32)
    y = rng.randint(0, max_y + 1, n).astype(np.int32)
    ts = np.cumsum(rng.randint(1, 100, n)).astype(np.int32)
    p = rng.randint(0, 2, n).astype(np.int32)
    path = str(tmp_path / f"ex20_{camera}.aedat")
    r = AerReader(camera)
    r.save_example(path, x, y, ts, p, version="2.0")
    l2, x2, y2, ts2, p2 = r.read_example(path)
    assert l2 == n
    np.testing.assert_array_equal(x2, x)
    np.testing.assert_array_equal(y2, y)
    np.testing.assert_array_equal(ts2, ts)
    np.testing.assert_array_equal(p2, p)


def test_aedat20_davis_skips_aps_words(tmp_path, rng):
    """jAER apsDVS streams interleave APS/IMU readout (address bit 31 set);
    the DAVIS decode must drop them instead of producing phantom events."""
    n = 50
    x = rng.randint(0, 240, n).astype(np.uint32)
    y = rng.randint(0, 180, n).astype(np.uint32)
    ts = np.cumsum(rng.randint(1, 100, n)).astype(np.uint32)
    p = rng.randint(0, 2, n).astype(np.uint32)
    addr = (y << 22) | (x << 12) | (p << 11)
    # interleave APS words (bit 31 set) between the DVS events
    aps_addr = (np.uint32(0x80000000) | rng.randint(0, 2**20, n).astype(np.uint32))
    words = np.empty(4 * n, np.uint32)
    words[0::4] = addr
    words[1::4] = ts
    words[2::4] = aps_addr
    words[3::4] = ts  # APS timestamps
    path = str(tmp_path / "davis_mixed.aedat")
    with open(path, "wb") as f:
        f.write(b"#!AER-DAT2.0\r\n")
        f.write(words.astype(">u4").tobytes())
    l2, x2, y2, ts2, p2 = AerReader("DAVIS240").read_example(path)
    assert l2 == n  # APS words dropped
    np.testing.assert_array_equal(x2, x.astype(np.int32))
    np.testing.assert_array_equal(y2, y.astype(np.int32))
    np.testing.assert_array_equal(p2, p.astype(np.int32))


def test_aedat31_roundtrip_with_overflow(tmp_path, rng):
    x, y, ts, p = random_events(rng, n=300, max_xy=1000)
    # push some timestamps past the 31-bit overflow boundary
    ts = ts.astype(np.int64) + np.int64(2**31) * (np.arange(300) >= 150)
    path = str(tmp_path / "ex31.aedat")
    r = AerReader("DVS128")
    r.save_example(path, x, y, ts, p, version="3.1")
    l2, x2, y2, ts2, p2 = r.read_example(path)
    assert l2 == len(x)
    np.testing.assert_array_equal(x2, x)
    np.testing.assert_array_equal(y2, y)
    np.testing.assert_array_equal(ts2, ts)
    np.testing.assert_array_equal(p2, p)


AEDAT31_HEADER = b"#!AER-DAT3.1\r\n#Format: RAW\r\n#!END-HEADER\r\n"


def _pol_packet(evs, overflow=0, source=1, event_size=8, ts_offset=4):
    """A POLARITY_EVENT packet: ``evs`` = (x, y, ts31, p, validbit) rows."""
    n = len(evs)
    head = np.array([1 | (source << 16), event_size, ts_offset,
                     overflow, n, n, n], np.int32)
    wpe = event_size // 4
    ts_col = ts_offset // 4
    data_col = 0 if ts_col != 0 else 1
    body = np.zeros((n, wpe), np.int32)
    for i, (x, y, ts, p, v) in enumerate(evs):
        body[i, data_col] = (x << 17) | (y << 2) | (p << 1) | v
        body[i, ts_col] = ts
    return head.tobytes() + body.tobytes()


def _raw_packet(event_type, body_words, event_size, source=1):
    """A non-polarity packet (frame/IMU/special) with an arbitrary body."""
    body = np.asarray(body_words, np.int32)
    assert body.size * 4 % event_size == 0
    n = body.size * 4 // event_size
    head = np.array([event_type | (source << 16), event_size, 4,
                     0, n, n, n], np.int32)
    return head.tobytes() + body.tobytes()


def _decode31_both(tmp_path, monkeypatch, blob, name="mixed.aedat"):
    """Decode with the native walker and the numpy fallback; assert parity;
    return the (numpy) result."""
    from async_ev_cnn_tpu.data import native

    path = str(tmp_path / name)
    with open(path, "wb") as f:
        f.write(AEDAT31_HEADER + blob)
    r = AerReader("DVS128")
    out_nat = r.read_example(path) if native.available() else None
    monkeypatch.setattr(native, "available", lambda: False)
    out_np = r.read_example(path)
    if out_nat is not None:
        assert out_nat[0] == out_np[0]
        for a, b in zip(out_nat[1:], out_np[1:]):
            np.testing.assert_array_equal(a, b)
    monkeypatch.undo()
    return out_np


def test_aedat31_mixed_packet_stream(tmp_path, rng, monkeypatch):
    """Real cAER recordings interleave frame/IMU/special packets with the
    polarity stream (the reference warns it can't handle these,
    /root/reference/src/readers/file_reader.py:129-132); they must be
    skipped by their declared size, including polarity packets from a
    source id != 1 (whose type the reference misreads from the high
    half-word) and an invalid-marked event inside a valid packet."""
    blob = (
        _raw_packet(0, [7, 123], event_size=8)                  # special
        + _pol_packet([(3, 4, 100, 1, 1), (5, 6, 200, 0, 1),
                       (9, 9, 250, 1, 0)])                      # 3rd invalid
        + _raw_packet(2, list(range(64)), event_size=256)       # frame
        + _pol_packet([(7, 8, 300, 1, 1)], overflow=1, source=2)
        + _raw_packet(3, list(range(8)), event_size=32)         # IMU6
        + _pol_packet([(1, 2, 50, 0, 1)], overflow=1)
    )
    l, x, y, ts, p = _decode31_both(tmp_path, monkeypatch, blob)
    assert l == 4
    np.testing.assert_array_equal(x, [3, 5, 7, 1])
    np.testing.assert_array_equal(y, [4, 6, 8, 2])
    np.testing.assert_array_equal(
        ts, [100, 200, (1 << 31) | 300, (1 << 31) | 50])
    np.testing.assert_array_equal(p, [1, 0, 1, 0])


def test_aedat31_honors_ts_offset(tmp_path, rng, monkeypatch):
    """eventTSOffset declares where the timestamp int32 sits inside each
    event; a 12-byte polarity event with the ts at offset 8 must decode
    (the reference hard-assumes offset 4)."""
    blob = _pol_packet([(10, 20, 111, 1, 1), (30, 40, 222, 0, 1)],
                       event_size=12, ts_offset=8)
    l, x, y, ts, p = _decode31_both(tmp_path, monkeypatch, blob,
                                    name="tsoff.aedat")
    assert l == 2
    np.testing.assert_array_equal(x, [10, 30])
    np.testing.assert_array_equal(ts, [111, 222])


def test_aedat31_truncation_and_corrupt_headers(tmp_path, rng, monkeypatch):
    """Truncated files decode every complete event then stop; corrupt
    headers (size 0 / unaligned size / negative count) stop the walk
    without misparsing — and the native walker agrees bit-for-bit."""
    good = _pol_packet([(3, 4, 100, 1, 1), (5, 6, 200, 0, 1)])
    # (a) cut mid-body: second event of the second packet is incomplete
    tail = _pol_packet([(7, 8, 300, 1, 1), (9, 10, 400, 0, 1)])
    l, x, y, ts, p = _decode31_both(
        tmp_path, monkeypatch, good + tail[:-5], name="cut_body.aedat")
    assert l == 3
    np.testing.assert_array_equal(ts, [100, 200, 300])
    # (b) cut mid-header: only the first packet decodes
    l, x, *_ = _decode31_both(
        tmp_path, monkeypatch, good + tail[:13], name="cut_head.aedat")
    assert l == 2
    # (c) corrupt headers stop the walk cleanly
    for i, bad_head in enumerate([
        np.array([1 | (1 << 16), 0, 4, 0, 2, 2, 2], np.int32),    # size 0
        np.array([1 | (1 << 16), 7, 4, 0, 2, 2, 2], np.int32),    # unaligned
        np.array([1 | (1 << 16), 8, 4, 0, -3, -3, -3], np.int32),  # negative
    ]):
        l, x, *_ = _decode31_both(
            tmp_path, monkeypatch,
            good + bad_head.tobytes() + tail, name=f"corrupt{i}.aedat")
        assert l == 2  # events after the corrupt header are not misparsed


def test_npy_roundtrip(tmp_path, rng):
    x, y, ts, p = random_events(rng, n=100)
    path = str(tmp_path / "ex.npy")
    r = NumpyReader()
    r.save_example(path, x, y, ts, p)
    l2, x2, y2, ts2, p2 = r.read_example(path)
    assert l2 == 100
    np.testing.assert_array_equal(x2, x)


def test_format_factory():
    assert isinstance(factory("n-data"), NReader)
    assert isinstance(factory("aer-data_DVS128"), AerReader)
    assert isinstance(factory("numpy"), NumpyReader)
    with pytest.raises(ValueError):
        factory("tiff")


# ---- dataset engine ----------------------------------------------------------


def make_class_dataset(tmp_path, rng, n_classes=3, per_class=10, split_dirs=False):
    reader = NReader()
    root = tmp_path / "ds"
    for c in range(n_classes):
        if split_dirs:
            for split, k in (("train", per_class), ("validation", 2), ("test", 3)):
                d = root / split / f"class{c}"
                d.mkdir(parents=True, exist_ok=True)
                for i in range(k):
                    x, y, ts, p = random_events(rng, n=50)
                    reader.save_example(str(d / f"ex{i}.bin"), x, y, ts, p)
        else:
            d = root / f"class{c}"
            d.mkdir(parents=True, exist_ok=True)
            for i in range(per_class):
                x, y, ts, p = random_events(rng, n=50)
                reader.save_example(str(d / f"ex{i}.bin"), x, y, ts, p)
    return str(root)


def test_stratified_split(tmp_path, rng):
    root = make_class_dataset(tmp_path, rng, n_classes=3, per_class=10)
    ds = event_reader.EventDataset(root, validation_frac=0.2, test_frac=0.3, seed=7)
    assert ds.num_classes() == 3
    assert ds.train_size() == 15 and ds.validation_size() == 6 and ds.test_size() == 9
    # stratified: each class contributes proportionally to each split
    for split in ("train", "validation", "test"):
        labels = ds._labels[split]
        for c in range(3):
            assert labels.count(f"class{c}") == len(labels) // 3


def test_split_dirs_layout(tmp_path, rng):
    root = make_class_dataset(tmp_path, rng, split_dirs=True)
    ds = event_reader.EventDataset(root)
    assert ds.train_size() == 30 and ds.validation_size() == 6 and ds.test_size() == 9
    assert ds.num_classes() == 3


def test_next_batch_shapes_and_epoch_wrap(tmp_path, rng):
    root = make_class_dataset(tmp_path, rng, n_classes=2, per_class=3)
    ds = event_reader.EventDataset(root, validation_frac=0, test_frac=0, seed=3)
    assert ds.train_size() == 6
    lengths, label, x, y, ts, p = ds.next_batch(2, dataset="train")
    assert lengths.shape == (2,) and label.shape == (2, 2)
    assert x.shape[0] == 2 and x.shape[1] == max(lengths)
    # 3 batches exhaust the epoch; 4th wraps with a reshuffle, no error
    for _ in range(4):
        ds.next_batch(2, dataset="train")


def test_next_batch_single_example_bare(tmp_path, rng):
    root = make_class_dataset(tmp_path, rng, n_classes=2, per_class=2)
    ds = event_reader.EventDataset(root, validation_frac=0, test_frac=0.5, seed=3)
    lengths, label, x, y, ts, p = ds.next_batch(1, dataset="test")
    assert x.ndim == 1 and len(x) == lengths[0]


def test_preprocessing_and_cache(tmp_path, rng):
    root = make_class_dataset(tmp_path, rng, n_classes=2, per_class=2)
    cache_dir = str(tmp_path / "cache")
    ds = event_reader.EventDataset(root, validation_frac=0, test_frac=0,
                                   tmp_dir=cache_dir, seed=5)
    calls = []

    def prep(length, label, x, y, ts, p):
        calls.append(1)
        return length, np.stack([y, x, ts], -1).astype(np.int32)

    out1 = ds.next_batch(1, dataset="train", preprocessing_fn=prep)
    n_calls = len(calls)
    assert n_calls >= 1 and out1[1].shape[-1] == 3
    # one full epoch later the same file comes back -> served from cache
    for _ in range(3):
        ds.next_batch(1, dataset="train", preprocessing_fn=prep)
    assert len(os.listdir(cache_dir)) == 4
    total_after_epoch = len(calls)
    assert total_after_epoch == 4  # each file preprocessed exactly once


def test_cache_invalidated_by_preprocessing_change(tmp_path, rng):
    root = make_class_dataset(tmp_path, rng, n_classes=1, per_class=1)
    cache_dir = str(tmp_path / "cache")
    ds = event_reader.EventDataset(root, validation_frac=0, test_frac=0,
                                   tmp_dir=cache_dir, seed=5)

    def prep_a(length, label, x, y, ts, p):
        return length, np.stack([y, x, ts], -1)

    def prep_b(length, label, x, y, ts, p):
        return length, np.stack([x, y, ts], -1)  # different transform

    out_a = ds.next_batch(1, dataset="train", preprocessing_fn=prep_a)
    out_b = ds.next_batch(1, dataset="train", preprocessing_fn=prep_b)
    # a stale path-keyed cache would have returned prep_a's layout
    assert not np.array_equal(out_a[1], out_b[1])
    assert len(os.listdir(cache_dir)) == 2  # one entry per transform


def test_corrupt_file_skipped(tmp_path, rng, capsys):
    root = make_class_dataset(tmp_path, rng, n_classes=2, per_class=2)
    # corrupt one file: truncated to 3 bytes (not a multiple of 5 -> decodes
    # to 0 events; make preprocessing choke on empty input instead)
    bad = os.path.join(root, "class0", "ex0.bin")
    with open(bad, "wb") as f:
        f.write(b"\x00\x00\x00")

    def prep(length, label, x, y, ts, p):
        if length == 0:
            raise ValueError("empty example")
        return length, np.stack([y, x, ts], -1)

    ds = event_reader.EventDataset(root, validation_frac=0, test_frac=0, seed=5)
    for _ in range(4):
        out = ds.next_batch(1, dataset="train", preprocessing_fn=prep)
        assert out[0][0] > 0
    assert "skipping unreadable example" in capsys.readouterr().out


def test_save_restore_roundtrip(tmp_path, rng):
    root = make_class_dataset(tmp_path, rng, n_classes=2, per_class=4)
    ds = event_reader.EventDataset(root, validation_frac=0, test_frac=0.25, seed=9)
    ds.next_batch(2, dataset="train")
    save = str(tmp_path / "reader_state.npz")
    ds.save(save)
    ds2 = event_reader.factory(save)
    assert ds2.num_classes() == 2
    assert ds2._cursors["train"] == ds._cursors["train"]
    assert ds2._files["train"] == ds._files["train"]
    ds2.next_batch(1, dataset="train")


def test_features_to_pad_mask(tmp_path, rng):
    root = make_class_dataset(tmp_path, rng, n_classes=2, per_class=3)
    ds = event_reader.EventDataset(root, validation_frac=0, test_frac=0, seed=4)

    def prep(length, label, x, y, ts, p):
        keep = x < int(x.mean())  # variable lengths per example
        return int(keep.sum()), np.stack([y[keep], x[keep], ts[keep]], -1)

    lengths, events, mask = ds.next_batch(
        3, dataset="train", preprocessing_fn=prep, features_to_pad_mask=True
    )
    assert mask.shape == (3, max(lengths))
    np.testing.assert_array_equal(mask.sum(axis=1), lengths)


def test_multiple_examples_merging(tmp_path, rng):
    root = make_class_dataset(tmp_path, rng, n_classes=2, per_class=3)
    ds = event_reader.EventDataset(root, validation_frac=0, test_frac=0, seed=4)
    lengths, label, x, y, ts, p = ds.next_batch(1, dataset="train", multiple_examples=3)
    assert lengths[0] == 150  # 3 x 50 events merged
    assert len(x) == 150 and label.shape == (2,)


def test_prefetcher_threads(tmp_path, rng):
    root = make_class_dataset(tmp_path, rng, n_classes=2, per_class=4)
    ds = event_reader.EventDataset(root, validation_frac=0, test_frac=0, seed=2)
    pf = ds.start_prefetch(2, dataset="train", preprocessing_fn=None, num_workers=2)
    try:
        for _ in range(5):
            batch = pf.get(timeout=10)
            assert batch[0].shape == (2,)
    finally:
        pf.stop()


def test_device_prefetch(tmp_path, rng):
    from async_ev_cnn_tpu.data.prefetch import device_prefetch

    batches = [np.full((4,), i, np.float32) for i in range(5)]
    out = list(device_prefetch(iter(batches), size=2))
    assert len(out) == 5
    for i, b in enumerate(out):
        np.testing.assert_array_equal(np.asarray(b), batches[i])


# ---- detection dataset -------------------------------------------------------


def make_detection_dataset(tmp_path, rng):
    reader = NReader()
    root = tmp_path / "det"
    (root / "annotations").mkdir(parents=True)
    for split, k in (("train", 4), ("test", 3), ("validation", 2)):
        d = root / split
        d.mkdir()
        for i in range(k):
            x, y, ts, p = random_events(rng, n=40)
            name = f"{split}_ex{i}"
            reader.save_example(str(d / f"{name}.bin"), x, y, ts, p)
            boxes = rng.rand(2, 6).astype(np.float32)
            np.save(str(root / "annotations" / f"{name}.npy"), boxes)
    np.savez(str(root / "params.npz"), num_classes=5,
             label_to_idx=np.array([("a", 0), ("b", 1)], dtype=object))
    return str(root)


def test_detection_save_restore(tmp_path, rng):
    root = make_detection_dataset(tmp_path, rng)
    ds = detection_reader.factory(root, file_format="n-data")
    ds.next_batch(1, dataset="test")
    save = str(tmp_path / "det_state.npz")
    ds.save(save)
    ds2 = detection_reader.factory(save)
    assert ds2.num_classes() == 5
    assert ds2._cursors["test"] == ds._cursors["test"]
    ds2.next_batch(1, dataset="test")


def test_detection_dataset(tmp_path, rng):
    root = make_detection_dataset(tmp_path, rng)
    ds = detection_reader.factory(root, file_format="n-data")
    assert ds.num_classes() == 5
    assert ds.test_size() == 3 and ds.train_size() == 4

    def prep(length, x, y, ts, p, bboxes):
        assert bboxes.shape == (2, 6)
        return length, np.stack([y, x, ts], -1).astype(np.int32)

    lengths, events = ds.next_batch(1, dataset="test", preprocessing_fn=prep)
    assert events.shape == (40, 3)


class TestEvtCodecs:
    """Prophesee EVT2/EVT3 RAW codecs (data/evt.py)."""

    def _stream(self, rng, n=500, xmax=1280, ymax=720):
        x = rng.randint(0, xmax, n).astype(np.int64)
        y = rng.randint(0, ymax, n).astype(np.int64)
        # strides that exercise TIME_HIGH transitions in both formats
        ts = np.cumsum(rng.randint(0, 5000, n)).astype(np.int64)
        p = rng.randint(0, 2, n).astype(np.int64)
        return x, y, ts, p

    def test_evt2_round_trip(self, rng, tmp_path):
        from async_ev_cnn_tpu.data.evt import Evt2Reader

        codec = Evt2Reader()
        x, y, ts, p = self._stream(rng, xmax=2048, ymax=2048)
        f = str(tmp_path / "a.raw")
        codec.save_example(f, x, y, ts, p)
        n2, x2, y2, ts2, p2 = codec.read_example(f)
        assert n2 == len(x)
        np.testing.assert_array_equal(x2, x)
        np.testing.assert_array_equal(y2, y)
        np.testing.assert_array_equal(ts2, ts)
        np.testing.assert_array_equal(p2, p)

    def test_evt2_writer_masks_polarity(self, rng, tmp_path):
        """An unmasked p outside {0, 1} used to corrupt the 4-bit type
        nibble (p=-1 wrapped to 0xF and the decoder silently dropped the
        event); the writer now masks p like every other field."""
        from async_ev_cnn_tpu.data.evt import Evt2Reader

        codec = Evt2Reader()
        f = str(tmp_path / "pm.raw")
        codec.save_example(f, [3, 4], [5, 6], [10, 20], [-1, 2])
        n2, x2, y2, ts2, p2 = codec.read_example(f)
        assert n2 == 2  # nothing silently dropped
        np.testing.assert_array_equal(x2, [3, 4])
        np.testing.assert_array_equal(p2, [(-1) & 1, 2 & 1])

    def test_evt3_round_trip(self, rng, tmp_path):
        from async_ev_cnn_tpu.data.evt import Evt3Reader

        codec = Evt3Reader()
        x, y, ts, p = self._stream(rng)
        f = str(tmp_path / "a.raw")
        codec.save_example(f, x, y, ts, p)
        n2, x2, y2, ts2, p2 = codec.read_example(f)
        assert n2 == len(x)
        np.testing.assert_array_equal(x2, x)
        np.testing.assert_array_equal(y2, y)
        np.testing.assert_array_equal(ts2, ts)
        np.testing.assert_array_equal(p2, p)

    def test_evt3_vector_events(self, tmp_path):
        """Hand-assembled stream exercising VECT_BASE_X / VECT_12 / VECT_8,
        including base advancement across multiple vector words."""
        from async_ev_cnn_tpu.data.evt import Evt3Reader

        words = np.array([
            (0x8 << 12) | 0x001,            # TIME_HIGH = 1
            (0x6 << 12) | 0x00A,            # TIME_LOW = 10 -> t = 4106
            (0x0 << 12) | 37,               # y = 37
            (0x3 << 12) | (1 << 11) | 100,  # VECT_BASE_X x=100 pol=1
            (0x4 << 12) | 0b100000000101,   # VECT_12: bits 0,2,11
            (0x5 << 12) | 0b10000001,       # VECT_8 (base now 112): bits 0,7
            (0x2 << 12) | (0 << 11) | 55,   # single event x=55 pol=0
        ], dtype="<u2")
        f = str(tmp_path / "v.raw")
        with open(f, "wb") as fh:
            fh.write(b"% evt 3.0\n")
            fh.write(words.tobytes())
        n, x, y, ts, p = Evt3Reader().read_example(f)
        t = (1 << 12) | 10
        assert n == 6
        np.testing.assert_array_equal(x, [100, 102, 111, 112, 119, 55])
        np.testing.assert_array_equal(y, [37] * 6)
        np.testing.assert_array_equal(ts, [t] * 6)
        np.testing.assert_array_equal(p, [1, 1, 1, 1, 1, 0])

    def test_evt3_time_high_rollover(self, tmp_path):
        """24-bit time wraps are unwrapped by TIME_HIGH-decrease detection."""
        from async_ev_cnn_tpu.data.evt import Evt3Reader

        words = np.array([
            (0x8 << 12) | 0xFFF, (0x6 << 12) | 0x005,
            (0x0 << 12) | 1, (0x2 << 12) | 10,
            (0x8 << 12) | 0x000, (0x6 << 12) | 0x002,  # wrapped high
            (0x2 << 12) | 11,
        ], dtype="<u2")
        f = str(tmp_path / "w.raw")
        with open(f, "wb") as fh:
            fh.write(words.tobytes())  # headerless payload is also accepted
        n, x, y, ts, p = Evt3Reader().read_example(f)
        assert n == 2
        assert ts[0] == (0xFFF << 12) | 5
        assert ts[1] == (0x1000 << 12) | 2  # unwrapped past 24 bits

    def test_evt_factory_and_dataset(self, rng, tmp_path):
        import async_ev_cnn_tpu.data.file_reader as ffmt
        from async_ev_cnn_tpu.data.evt import Evt2Reader, Evt3Reader

        assert isinstance(ffmt.factory("evt2"), Evt2Reader)
        assert isinstance(ffmt.factory("evt3"), Evt3Reader)

    def test_evt3_large_gap_wraps(self, rng, tmp_path):
        """Gaps crossing >=1 boundary of the 12-bit TIME_HIGH field (ts
        deltas >= 2^24 us) must round-trip exactly: the writer emits one
        wrap-marker TIME_HIGH pair per crossed boundary so the decoder's
        decrease-counting unwrap lands on the right epoch.  Regression for
        a silent-timestamp-collapse bug (33 s gap -> 0)."""
        from async_ev_cnn_tpu.data.evt import Evt3Reader

        codec = Evt3Reader()
        f = str(tmp_path / "gap.raw")
        cases = [
            np.array([100, 100 + 2**25]),       # multi-wrap gap
            np.array([100, 100 + 2**24]),       # exactly one epoch
            np.array([2**26 + 5, 2**26 + 6]),   # absolute start beyond 24 bits
            np.cumsum(rng.randint(0, 2**25, 50).astype(np.int64)),
        ]
        for ts in cases:
            n = len(ts)
            x = np.arange(n) % 7
            y = np.arange(n) % 5
            p = np.arange(n) % 2
            codec.save_example(f, x, y, ts, p)
            n2, x2, y2, ts2, p2 = codec.read_example(f)
            assert n2 == n
            np.testing.assert_array_equal(ts2.astype(np.int64), ts)
            np.testing.assert_array_equal(x2, x)

    def test_evt3_dataset_end_to_end(self, rng, tmp_path):
        """EventDataset drives the EVT3 codec through the full batch path
        (directory scan, split, padding, preprocessing) like any format."""
        from async_ev_cnn_tpu.data import event_reader
        from async_ev_cnn_tpu.data.evt import Evt3Reader

        codec = Evt3Reader()
        root = tmp_path / "evtds"
        for c in range(2):
            d = root / f"class{c}"
            d.mkdir(parents=True)
            for i in range(4):
                x, y, ts, p = self._stream(rng, n=60, xmax=64, ymax=48)
                codec.save_example(str(d / f"ex{i}.raw"), x, y, ts, p)
        ds = event_reader.EventDataset(
            str(root), file_format="evt3", validation_frac=0, test_frac=0.5,
            seed=1,
        )
        assert ds.num_classes() == 2
        lengths, labels, xs, ys, tss, ps = ds.next_batch(
            2, dataset="train", threads=1,
        )
        assert lengths.shape[0] == 2 and xs.shape[0] == 2
        assert (lengths > 0).all()

    def test_evt2_large_gap_round_trip(self, rng, tmp_path):
        """EVT2 carries the full 28-bit high component per TIME_HIGH word
        (no decrease-counting), so arbitrary int32-range gaps round-trip
        without wrap markers — pinned here for symmetry with the EVT3
        wrap-marker regression."""
        from async_ev_cnn_tpu.data.evt import Evt2Reader

        codec = Evt2Reader()
        f = str(tmp_path / "gap2.raw")
        ts = np.concatenate([
            [5, 5 + 2**25, 2**30 - 50],
            np.sort(rng.randint(2**30, 2**31 - 1, 20).astype(np.int64)),
        ])
        n = len(ts)
        x = np.arange(n) % 11
        y = np.arange(n) % 9
        p = np.arange(n) % 2
        codec.save_example(f, x, y, ts, p)
        n2, x2, y2, ts2, p2 = codec.read_example(f)
        assert n2 == n
        np.testing.assert_array_equal(ts2.astype(np.int64), ts)
        np.testing.assert_array_equal(x2, x)


def test_cursor_thread_safety(tmp_path, rng):
    """Concurrent next_batch callers must partition the epoch — the
    unlocked read/advance/write used to hand both threads the same files
    (duplicate batches) and lose cursor advances."""
    import threading

    root = make_class_dataset(tmp_path, rng, n_classes=4, per_class=16)
    ds = event_reader.EventDataset(root, validation_frac=0, test_frac=0,
                                   seed=2)
    n = ds.train_size()
    seen, errs = [], []

    def work():
        try:
            for _ in range(n // 8):  # 8 threads x n/8 = exactly one epoch
                pairs = ds._next_files(1, "train")
                seen.extend(f for f, _ in pairs)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=work) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    assert len(seen) == n
    assert len(set(seen)) == n  # every file exactly once, no duplicates


def test_corrupt_cache_self_heals(tmp_path, rng):
    """A truncated cache entry must be dropped and recomputed, not
    classify the example 'unreadable' forever."""
    root = make_class_dataset(tmp_path, rng, n_classes=1, per_class=1)
    cache_dir = str(tmp_path / "cache")
    ds = event_reader.EventDataset(root, validation_frac=0, test_frac=0,
                                   tmp_dir=cache_dir, seed=5)

    def prep(length, label, x, y, ts, p):
        return length, np.stack([y, x, ts], -1).astype(np.int32)

    out1 = ds.next_batch(1, dataset="train", preprocessing_fn=prep)
    (entry,) = os.listdir(cache_dir)
    with open(os.path.join(cache_dir, entry), "wb") as f:
        f.write(b"not an npz")
    out2 = ds.next_batch(1, dataset="train", preprocessing_fn=prep)
    np.testing.assert_array_equal(out1[1], out2[1])  # recomputed, not skipped


def test_prefetcher_propagates_worker_errors(tmp_path, rng):
    """A dead worker must surface in get(), not hang the consumer."""
    import pytest

    root = make_class_dataset(tmp_path, rng, n_classes=2, per_class=2)
    ds = event_reader.EventDataset(root, validation_frac=0.5, test_frac=0.5,
                                   seed=2)
    # validation got everything rounded away? ensure train empty instead
    ds._files["train"] = []
    pf = ds.start_prefetch(1, dataset="train", num_workers=1)
    try:
        with pytest.raises(RuntimeError, match="empty"):
            pf.get(timeout=10)
    finally:
        pf.stop()


def test_concat_features_reference_semantics(tmp_path, rng):
    """concat_features concatenates the batch's EXAMPLES along the event
    axis per feature (event_reader.py:605) — not features onto each
    other."""
    root = make_class_dataset(tmp_path, rng, n_classes=2, per_class=2)
    ds = event_reader.EventDataset(root, validation_frac=0, test_frac=0,
                                   seed=3)
    lengths, label, x, y, ts, p = ds.next_batch(
        2, dataset="train", concat_features=True)
    assert x.shape == (int(lengths.sum()),)  # unpadded concat over examples
    assert label.shape == (2, 2)  # labels stacked per example


def test_save_restores_epoch_order(tmp_path, rng):
    """A mid-epoch save/restore must resume against the SAME epoch
    permutation — a fresh identity order re-served seen examples."""
    root = make_class_dataset(tmp_path, rng, n_classes=2, per_class=8)
    ds = event_reader.EventDataset(root, validation_frac=0, test_frac=0,
                                   seed=9)
    n = ds.train_size()
    ds.next_batch(n, dataset="train")  # finish epoch 0 -> epoch 1 shuffled
    first_half = [f for f, _ in ds._next_files(n // 2, "train")]
    save = str(tmp_path / "rs.npz")
    ds.save(save)
    ds2 = event_reader.factory(save)
    second_half = [f for f, _ in ds2._next_files(n - n // 2, "train")]
    assert sorted(first_half + second_half) == sorted(
        ds._files["train"])  # exactly one full epoch, no repeats


def test_prefetcher_process_mode(tmp_path, rng):
    """The dill-shipped process mode works from the public entry point
    (it was unreachable: start_prefetch never forwarded a mode)."""
    root = make_class_dataset(tmp_path, rng, n_classes=2, per_class=4)
    ds = event_reader.EventDataset(root, validation_frac=0, test_frac=0,
                                   seed=2)
    pf = ds.start_prefetch(2, dataset="train", num_workers=1,
                           mode="process")
    try:
        batch = pf.get(timeout=60)
        assert batch[0].shape == (2,)
    finally:
        pf.stop()
