// evio: native event-file decoding for the host-side data plane.
//
// The TPU-native analog of the reference's Cython layer: the device compute
// path is XLA/Pallas, but file decoding is host work on the ingest path, so
// it is implemented in C++ (OpenMP-parallel across the batch) and exposed
// through a plain C ABI consumed via ctypes (no pybind11 dependency).
//
// Formats (bit-level parity with async_ev_cnn_tpu/data/file_reader.py and
// /root/reference/src/readers/file_reader.py):
//   * N-MNIST / N-Caltech101 binary: 5 bytes/event; x=b0, y=b1, p=bit7(b2),
//     ts = 23 bits of b2..b4; rows with y==240 add 2^13 us to later events
//     and are dropped.
//   * AEDAT 2.0: big-endian int32 (address, timestamp) pairs, DVS128 masks.
//
// Build: make -C native   ->  libevio.so

#include <array>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

constexpr uint32_t kOverflowY = 240;
constexpr int32_t kOverflowIncrement = 1 << 13;

struct Events {
  int32_t *x, *y, *ts, *p;
  int64_t n;
};

// Reads a whole file into a malloc'd buffer. Returns nullptr on failure.
uint8_t* read_file(const char* path, int64_t* size) {
  FILE* f = std::fopen(path, "rb");
  if (!f) {
    *size = -1;  // distinguish I/O failure from an empty file
    return nullptr;
  }
  std::fseek(f, 0, SEEK_END);
  *size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (*size == 0) {
    // malloc(0) may legally return nullptr, which the callers would
    // misread as an I/O error; an empty file is simply zero events
    std::fclose(f);
    return nullptr;
  }
  uint8_t* buf = static_cast<uint8_t*>(std::malloc(*size));
  if (buf && std::fread(buf, 1, *size, f) != static_cast<size_t>(*size)) {
    std::free(buf);
    buf = nullptr;
    *size = -1;
  }
  std::fclose(f);
  return buf;
}

int64_t decode_ndata_buffer(const uint8_t* raw, int64_t size, Events out) {
  const int64_t records = size / 5;
  int64_t n = 0;
  int32_t ts_offset = 0;
  for (int64_t i = 0; i < records; ++i) {
    const uint8_t* r = raw + i * 5;
    const uint32_t y = r[1];
    const int32_t ts =
        ((static_cast<int32_t>(r[2]) & 127) << 16) |
        (static_cast<int32_t>(r[3]) << 8) | r[4];
    if (y == kOverflowY) {
      ts_offset += kOverflowIncrement;
      continue;
    }
    out.x[n] = r[0];
    out.y[n] = static_cast<int32_t>(y);
    out.ts[n] = ts + ts_offset;
    out.p[n] = (r[2] & 128) >> 7;
    ++n;
  }
  return n;
}

}  // namespace

extern "C" {

// Number of events (upper bound: every record) in an n-data file of `size`
// bytes.
int64_t evio_ndata_capacity(int64_t size) { return size / 5; }

// Decodes one n-data file. Caller allocates x/y/ts/p with capacity
// evio_ndata_capacity(file size). Returns the event count, or -1 on I/O
// error.
int64_t evio_decode_ndata_file(const char* path, int32_t* x, int32_t* y,
                               int32_t* ts, int32_t* p) {
  int64_t size = 0;
  uint8_t* buf = read_file(path, &size);
  if (!buf) return size == 0 ? 0 : -1;  // empty file = zero events
  const int64_t n = decode_ndata_buffer(buf, size, Events{x, y, ts, p, 0});
  std::free(buf);
  return n;
}

// Decodes an in-memory n-data buffer (for testing / mmap callers).
int64_t evio_decode_ndata(const uint8_t* raw, int64_t size, int32_t* x,
                          int32_t* y, int32_t* ts, int32_t* p) {
  return decode_ndata_buffer(raw, size, Events{x, y, ts, p, 0});
}

// Batched decode: `num` files into one flat set of output arrays, each file
// at offset offsets[i] (capacity prefix sums). lengths[i] receives the
// event count of file i (or -1 on error). OpenMP-parallel across files.
void evio_decode_ndata_batch(const char** paths, int64_t num,
                             const int64_t* offsets, int32_t* x, int32_t* y,
                             int32_t* ts, int32_t* p, int64_t* lengths) {
#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic)
#endif
  for (int64_t i = 0; i < num; ++i) {
    const int64_t off = offsets[i];
    lengths[i] =
        evio_decode_ndata_file(paths[i], x + off, y + off, ts + off, p + off);
  }
}

// Capacity-clamped batched decode: caps[i] bounds how many records of file
// i are decoded — the caller sized its output region from a stat() that a
// concurrently-growing file can invalidate, so the uncapped variant could
// write past the region (heap corruption).  Extra bytes are ignored.
void evio_decode_ndata_batch_cap(const char** paths, int64_t num,
                                 const int64_t* offsets, const int64_t* caps,
                                 int32_t* x, int32_t* y, int32_t* ts,
                                 int32_t* p, int64_t* lengths) {
#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic)
#endif
  for (int64_t i = 0; i < num; ++i) {
    const int64_t off = offsets[i];
    int64_t size = 0;
    uint8_t* buf = read_file(paths[i], &size);
    if (!buf) {
      lengths[i] = size == 0 ? 0 : -1;  // empty file = zero events
      continue;
    }
    if (size > caps[i] * 5) size = caps[i] * 5;
    lengths[i] = decode_ndata_buffer(buf, size,
                                     Events{x + off, y + off, ts + off,
                                            p + off, 0});
    std::free(buf);
  }
}

// AEDAT 2.0 payload decode (payload = file minus '#' header lines), DVS128
// masks. Returns the event count. Caller capacity: size / 8.
int64_t evio_decode_aedat20(const uint8_t* payload, int64_t size, int32_t* x,
                            int32_t* y, int32_t* ts, int32_t* p) {
  const int64_t pairs = size / 8;
  for (int64_t i = 0; i < pairs; ++i) {
    const uint8_t* r = payload + i * 8;
    const uint32_t addr = (static_cast<uint32_t>(r[0]) << 24) |
                          (static_cast<uint32_t>(r[1]) << 16) |
                          (static_cast<uint32_t>(r[2]) << 8) | r[3];
    const uint32_t t = (static_cast<uint32_t>(r[4]) << 24) |
                       (static_cast<uint32_t>(r[5]) << 16) |
                       (static_cast<uint32_t>(r[6]) << 8) | r[7];
    x[i] = static_cast<int32_t>((addr & 0xFEu) >> 1);
    y[i] = static_cast<int32_t>((addr & 0x7F00u) >> 8);
    p[i] = static_cast<int32_t>(addr & 0x1u);
    ts[i] = static_cast<int32_t>(t);
  }
  return pairs;
}

// AEDAT 3.1 payload decode (payload = file minus header lines): packet
// stream of 7-int32 headers + event bodies.  Semantics mirror the numpy
// decoder in data/file_reader.py::_decode_31 bit-for-bit (gated in
// tests/test_native.py): spec-correct low-16-bit packet type, non-polarity
// packets skipped by declared size, eventTSOffset honored, truncated files
// decode every complete event, corrupt headers stop the walk, the ts word
// is masked to its 31 spec bits before the overflow splice.
// Caller capacity: size / 8. Returns the event count.
int64_t evio_decode_aedat31(const uint8_t* payload, int64_t size, int32_t* x,
                            int32_t* y, int64_t* ts, int32_t* p) {
  const int32_t* words = reinterpret_cast<const int32_t*>(payload);
  int64_t n_words = size / 4;
  int64_t pos = 0;
  int64_t n = 0;
  while (pos + 7 <= n_words) {
    const int32_t event_type = words[pos] & 0xFFFF;
    const int32_t event_size = words[pos + 1];
    const int32_t ts_offset = words[pos + 2];
    const int64_t ts_overflow = static_cast<int64_t>(words[pos + 3]);
    const int32_t event_number = words[pos + 5];
    const int32_t event_valid = words[pos + 6];
    pos += 7;
    if (event_size <= 0 || event_size % 4 != 0 || event_number < 0)
      break;  // corrupt header: stop rather than misparse the rest
    const int64_t wpe = event_size / 4;
    const int64_t body_words = static_cast<int64_t>(event_number) * wpe;
    const int64_t avail =
        body_words < n_words - pos ? body_words : n_words - pos;
    const int64_t complete = avail / wpe;  // whole events only
    if (event_valid && event_type == 1 && wpe >= 2) {
      const int64_t ts_col =
          (ts_offset > 0 && ts_offset < event_size && ts_offset % 4 == 0)
              ? ts_offset / 4
              : 1;
      // the polarity word is word 0 (ts_col >= 1 above) — mirrors the
      // numpy walker's invariant comment (file_reader.py)
      const int64_t data_col = 0;
      // mask BEFORE the shift: `ts_overflow << 31` on a corrupt header
      // with bit 31 set is a negative-value left shift (UB pre-C++20)
      // and would also diverge from numpy's defined wrap
      const int64_t ts_hi = (ts_overflow & 0x7FFFFFFFll) << 31;
      for (int64_t e = 0; e < complete; ++e) {
        const uint32_t data =
            static_cast<uint32_t>(words[pos + wpe * e + data_col]);
        if (!(data & 0x1u)) continue;  // validity bit
        x[n] = static_cast<int32_t>((data >> 17) & 0x1FFFu);
        y[n] = static_cast<int32_t>((data >> 2) & 0x1FFFu);
        p[n] = static_cast<int32_t>((data >> 1) & 0x1u);
        ts[n] = ts_hi |
                (static_cast<int64_t>(words[pos + wpe * e + ts_col]) &
                 0x7FFFFFFFll);
        ++n;
      }
    }
    pos += body_words;
  }
  return n;
}

// EVT3 payload decode (payload = file minus '%' header lines): 16-bit LE
// words, 4-bit type in bits [15:12]; stateful — current y, vector base-x
// and polarity, 24-bit (high:12|low:12) time extended by counting
// TIME_HIGH decreases.  Bit-level parity with the vectorized decoder in
// async_ev_cnn_tpu/data/evt.py (gated in tests/test_native.py).  The
// caller sizes the outputs exactly (cheap numpy prepass counts ADDR_X
// words plus VECT_12/VECT_8 set bits) and passes that size as `cap`;
// the loop returns -1 instead of overrunning if the two counts ever
// disagree.  Returns the event count.
int64_t evio_decode_evt3(const uint8_t* payload, int64_t size, int64_t cap,
                         int32_t* x, int32_t* y, int32_t* ts, int32_t* p) {
  const uint16_t* words = reinterpret_cast<const uint16_t*>(payload);
  const int64_t n_words = size / 2;
  int64_t n = 0;
  int32_t cur_y = 0;
  int32_t base_x = 0;
  int32_t vect_p = 0;
  int64_t th = 0;        // extended high component
  int64_t tl = 0;
  int32_t last_raw_th = -1;
  int64_t wraps = 0;
  for (int64_t i = 0; i < n_words; ++i) {
    const uint16_t w = words[i];
    const int32_t typ = w >> 12;
    const int32_t val = w & 0x0FFF;
    switch (typ) {
      case 0x0:  // EVT_ADDR_Y
        cur_y = val & 0x7FF;
        break;
      case 0x2: {  // EVT_ADDR_X: one CD event
        if (n >= cap) return -1;
        x[n] = val & 0x7FF;
        y[n] = cur_y;
        ts[n] = static_cast<int32_t>((th << 12) | tl);
        p[n] = (val >> 11) & 1;
        ++n;
        break;
      }
      case 0x3:  // VECT_BASE_X
        base_x = val & 0x7FF;
        vect_p = (val >> 11) & 1;
        break;
      case 0x4:    // VECT_12
      case 0x5: {  // VECT_8
        const int width = (typ == 0x4) ? 12 : 8;
        const int32_t t32 = static_cast<int32_t>((th << 12) | tl);
        for (int b = 0; b < width; ++b) {
          if ((val >> b) & 1) {
            if (n >= cap) return -1;
            x[n] = base_x + b;
            y[n] = cur_y;
            ts[n] = t32;
            p[n] = vect_p;
            ++n;
          }
        }
        base_x += width;
        break;
      }
      case 0x6:  // EVT_TIME_LOW
        tl = val;
        break;
      case 0x8:  // EVT_TIME_HIGH (decrease = 24-bit epoch wrap)
        if (last_raw_th >= 0 && val < last_raw_th) ++wraps;
        last_raw_th = val;
        th = static_cast<int64_t>(val) + (wraps << 12);
        break;
      default:  // EXT_TRIGGER / OTHERS / CONTINUED: ignored
        break;
    }
  }
  return n;
}

// CRC-32C (Castagnoli) — the TF TensorBundle checksum (utils/tf_bundle.py).
// Uses the SSE4.2 crc32 instruction when the build target has it
// (-march=native on this image); table fallback otherwise.  The Python
// per-byte loop runs at ~6 MB/s, which made checksums dominate multi-MB
// checkpoint exports.
uint32_t evio_crc32c(const uint8_t* data, int64_t n) {
  uint64_t crc = 0xFFFFFFFFull;
#if defined(__SSE4_2__)
  int64_t i = 0;
  for (; i + 8 <= n; i += 8) {
    uint64_t w;
    std::memcpy(&w, data + i, 8);
    crc = __builtin_ia32_crc32di(crc, w);
  }
  for (; i < n; ++i) {
    crc = __builtin_ia32_crc32qi(static_cast<uint32_t>(crc), data[i]);
  }
#else
  // C++ magic-static: thread-safe one-time init (the hand-rolled
  // `static bool init` lazy pattern was a data race when first called
  // from two prefetch workers concurrently)
  static const std::array<uint32_t, 256> table = [] {
    std::array<uint32_t, 256> t{};
    for (uint32_t b = 0; b < 256; ++b) {
      uint32_t c = b;
      for (int k = 0; k < 8; ++k) c = (c & 1) ? (c >> 1) ^ 0x82F63B78u : c >> 1;
      t[b] = c;
    }
    return t;
  }();
  for (int64_t i = 0; i < n; ++i) {
    crc = table[(crc ^ data[i]) & 0xFF] ^ (crc >> 8);
  }
#endif
  return static_cast<uint32_t>(crc) ^ 0xFFFFFFFFu;
}

}  // extern "C"
