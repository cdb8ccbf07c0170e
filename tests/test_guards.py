"""Contract guards: int32 µs timestamp-wrap detection, header sniffing on
binary payloads, checkpoint dtype validation, and constructor validation.

Round-3 items: VERDICT.md #7 (timestamp truncation) and the ADVICE.md
low-severity findings.
"""

import numpy as np
import pytest


class TestTimestampWrapGuards:
    def test_evt2_decode_raises_past_int32(self, tmp_path):
        """EVT2 carries 34-bit wire times; decoding one past 2^31 µs must
        raise instead of silently wrapping into the int32 contract."""
        from async_ev_cnn_tpu.data.evt import Evt2Reader

        codec = Evt2Reader()
        f = str(tmp_path / "big.raw")
        ts = np.array([100, 2**31 + 5], np.int64)
        codec.save_example(f, [1, 2], [3, 4], ts, [0, 1])
        with pytest.raises(ValueError, match="int32"):
            codec.read_example(f)

    def test_evt2_decode_ok_at_boundary(self, tmp_path):
        from async_ev_cnn_tpu.data.evt import Evt2Reader

        codec = Evt2Reader()
        f = str(tmp_path / "edge.raw")
        ts = np.array([100, 2**31 - 1], np.int64)
        codec.save_example(f, [1, 2], [3, 4], ts, [0, 1])
        n, x, y, ts2, p = codec.read_example(f)
        assert n == 2
        np.testing.assert_array_equal(ts2.astype(np.int64), ts)

    def test_evt3_decode_raises_past_int32(self, tmp_path):
        """EVT3's 24-bit wire time unwraps without bound; past 2^31 µs the
        numpy fallback must raise (the native decoder raises on the wrapped
        negative values it would produce — test_native.py)."""
        from async_ev_cnn_tpu.data.evt import Evt3Reader

        codec = Evt3Reader()
        f = str(tmp_path / "big3.raw")
        ts = np.array([100, 2**31 + 77], np.int64)
        codec.save_example(f, [1, 2], [3, 4], ts, [0, 1])
        # read_example covers whichever decoder is active (the native C++
        # path raises on the wrapped-negative values, the numpy fallback on
        # the unwrapped TIME_HIGH bound)
        with pytest.raises(ValueError, match="int32"):
            codec.read_example(f)

    def test_event_chunk_from_arrays_raises_on_wrap(self):
        from async_ev_cnn_tpu.layers.types import EventChunk

        with pytest.raises(ValueError, match="rebase"):
            EventChunk.from_arrays(
                [1], [2], np.array([2**31 + 3], np.int64), capacity=4
            )

    def test_event_chunk_from_arrays_raises_on_negative_ts(self):
        """Negative timestamps — INCLUDING already-int32 inputs, which
        used to skip validation entirely — violate the non-negative
        contract the event-scatter kernel's 31-bit dt payload needs; an
        un-rebased recording must fail loudly, not diverge silently."""
        from async_ev_cnn_tpu.layers.types import EventChunk

        for dtype in (np.int32, np.int64):
            with pytest.raises(ValueError, match="negative timestamp"):
                EventChunk.from_arrays(
                    [1], [2], np.array([-5], dtype), capacity=4
                )

    def test_event_chunk_from_arrays_accepts_int64_in_range(self):
        from async_ev_cnn_tpu.layers.types import EventChunk

        ch = EventChunk.from_arrays(
            [1], [2], np.array([2**31 - 1], np.int64), capacity=4
        )
        assert int(ch.ts[0]) == 2**31 - 1

    def test_data_transform_rebases_and_guards(self):
        from types import SimpleNamespace

        from async_ev_cnn_tpu.utils.transforms import data_transform

        args = SimpleNamespace(frame_h=8, frame_w=8, example_h=8, example_w=8)
        # a large absolute base rebases fine (the reference's ts - ts[0])
        base = np.int64(2**31 + 1000)
        ts = base + np.array([0, 10, 20], np.int64)
        _, events = data_transform(
            np.int64(3), np.array([1, 2, 3]), np.array([1, 2, 3]), ts,
            np.array([0, 1, 0]), None, args,
        )
        np.testing.assert_array_equal(events[:, 2], [0, 10, 20])
        # a stream that still spans > int32 µs after rebase must raise
        ts_bad = np.array([0, 2**31 + 5], np.int64)
        with pytest.raises(ValueError, match="int32"):
            data_transform(
                np.int64(2), np.array([1, 2]), np.array([1, 2]), ts_bad,
                np.array([0, 1]), None, args,
            )


class TestHeaderSniffing:
    def test_binary_payload_starting_with_percent_kept(self, tmp_path):
        """A headerless EVT2 stream whose first word's low byte is 0x25
        ('%') must not lose payload to header stripping (ADVICE.md)."""
        from async_ev_cnn_tpu.data.evt import Evt2Reader

        # CD_ON word with y chosen so the little-endian low byte is 0x25
        word = (0x1 << 28) | (7 << 22) | (5 << 11) | 0x25
        payload = np.array([word], "<u4").tobytes()
        assert payload[0:1] == b"%"
        # binary bytes follow, so there is no printable-ASCII line to strip
        f = str(tmp_path / "headerless.raw")
        with open(f, "wb") as fh:
            fh.write(payload)
        n, x, y, ts, p = Evt2Reader().read_example(f)
        assert n == 1
        assert int(x[0]) == 5 and int(y[0]) == 0x25 and int(p[0]) == 1

    def test_ascii_header_still_stripped(self):
        from async_ev_cnn_tpu.data.evt import _split_header

        data = b"% evt 3.0\n% format EVT3\n\x01\x02\x03\x04"
        assert _split_header(data) == b"\x01\x02\x03\x04"


def test_restore_stream_state_rejects_wrong_dtype(tmp_path):
    from async_ev_cnn_tpu.utils.checkpoint import (
        restore_stream_state,
        save_stream_state,
    )

    state = (np.zeros((2, 2), np.float32), np.int32(7))
    path = str(tmp_path / "st.npz")
    save_stream_state(path, state)
    wrong = (np.zeros((2, 2), np.float64), np.int32(0))
    with pytest.raises(ValueError, match="dtype"):
        restore_stream_state(path, wrong)


def test_yolo_ts_window_validation():
    from collections import OrderedDict

    from async_ev_cnn_tpu.models.yolo import YoloEventJax

    kw = dict(
        h_frame=16, w_frame=16, num_classes=2,
        cnn_layers=OrderedDict(conv1=[3, 3, 1, 4]),
        cnn_padding="SAME", h_cells=2, w_cells=2, num_bbox=1,
        alpha=0.1, leak=1e-4, conv_mode="full",
    )
    with pytest.raises(ValueError, match="ts_window"):
        YoloEventJax(**kw, ts_window=-3)
    with pytest.raises(ValueError, match="ts_window"):
        YoloEventJax(**kw, ts_window=0)
    YoloEventJax(**kw, ts_window=8)  # valid


def test_evt3_decoders_raise_on_full_wrap(tmp_path):
    """A recording whose TIME_HIGH stream unwraps past int32 µs must raise
    in BOTH decoders — including the full-wrap case where the C++ loop's
    int32 ts would wrap all the way back to positive (so a min()<0
    post-check alone would miss it)."""
    import numpy as np

    from async_ev_cnn_tpu.data import native
    from async_ev_cnn_tpu.data.evt import Evt3Reader

    words = [(0x8 << 12) | 1, (0x6 << 12) | 5, (0x0 << 12) | 3,
             (0x2 << 12) | 4]
    # 129 full 12-bit TIME_HIGH wraps -> unwrapped high 129*4096 > 524287
    for _ in range(129):
        words += [(0x8 << 12) | 0xFFF, (0x8 << 12) | 0x000]
    words += [(0x8 << 12) | 5, (0x6 << 12) | 1, (0x2 << 12) | 7]
    payload = np.array(words, "<u2").tobytes()

    with pytest.raises(ValueError, match="int32"):
        Evt3Reader._decode(np.frombuffer(payload, "<u2"))
    if native.available():
        with pytest.raises(ValueError, match="int32"):
            native.decode_evt3(payload)
