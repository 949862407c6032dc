// eventql_tpu native runtime: columnar codec hot paths.
//
// The reference implements its columnar file codecs in C++
// (reference: io/cstable/columns/*, util/util/BitPackDecoder.cc,
// deps/3rdparty/libsimdcomp). This library provides the same
// decode primitives for the TPU engine's host-side ingest path,
// exposed through a plain C ABI consumed via ctypes
// (eventql_tpu/columnar/native.py). The numpy implementations in
// eventql_tpu/columnar/cstable.py are the semantic reference; this
// library must match them bit-for-bit (tests/test_native_codec.py).
//
// Build: make -C native   (produces build/libeventql_native.so)

#include <cstdint>
#include <cstring>
#include <cstddef>

extern "C" {

// Decode `n` values from simdcomp SIMD-BP128 vertical bit-packing
// (128-value blocks, 16*maxbits bytes per block; value order within a
// block is out[4*k + lane] across 4 interleaved 32-bit lanes).
// Returns 0 on success, -1 if the buffer is too small.
int evql_simdbp128_unpack(
    const uint8_t* buf,
    uint64_t buf_len,
    uint32_t maxbits,
    uint64_t n,
    uint32_t* out) {
  if (maxbits == 0) {
    memset(out, 0, n * sizeof(uint32_t));
    return 0;
  }
  if (maxbits > 32) {
    return -1;
  }

  const uint64_t nblocks = (n + 127) / 128;
  const uint64_t block_bytes = 16ull * maxbits;
  if (buf_len < nblocks * block_bytes) {
    return -1;
  }

  const uint32_t mask =
      maxbits == 32 ? 0xffffffffu : ((1u << maxbits) - 1u);

  uint64_t out_pos = 0;
  for (uint64_t blk = 0; blk < nblocks; ++blk) {
    const uint32_t* words =
        reinterpret_cast<const uint32_t*>(buf + blk * block_bytes);
    // words layout: [word][lane], word = 0..maxbits-1, lane = 0..3
    for (uint32_t lane = 0; lane < 4; ++lane) {
      // per-lane bitstream: 32 values of `maxbits` bits, LSB-first
      // across the lane's words
      uint64_t acc = 0;
      uint32_t acc_bits = 0;
      uint32_t w = 0;
      for (uint32_t k = 0; k < 32; ++k) {
        while (acc_bits < maxbits && w < maxbits) {
          acc |= static_cast<uint64_t>(words[w * 4 + lane]) << acc_bits;
          acc_bits += 32;
          ++w;
        }
        const uint64_t idx = blk * 128 + 4ull * k + lane;
        if (idx < n) {
          out[idx] = static_cast<uint32_t>(acc) & mask;
        }
        acc >>= maxbits;
        acc_bits -= maxbits;
      }
    }
    out_pos += 128;
    (void)out_pos;
  }
  return 0;
}

// Decode `count` LEB128 varints. Returns the number of bytes consumed,
// or -1 on truncated input.
int64_t evql_leb128_decode(
    const uint8_t* buf,
    uint64_t buf_len,
    uint64_t count,
    uint64_t* out) {
  uint64_t pos = 0;
  for (uint64_t i = 0; i < count; ++i) {
    uint64_t v = 0;
    uint32_t shift = 0;
    for (;;) {
      if (pos >= buf_len) {
        return -1;
      }
      const uint8_t b = buf[pos++];
      v |= static_cast<uint64_t>(b & 0x7f) << shift;
      shift += 7;
      if (!(b & 0x80)) {
        break;
      }
    }
    out[i] = v;
  }
  return static_cast<int64_t>(pos);
}

// Encode `count` values as LEB128 varints into `out` (caller allocates
// count*10 bytes, the worst case). Returns bytes written. The segment
// flush encodes every UINT64/INT64 column this way
// (reference encoder: io/cstable/columns/UnsignedIntColumnWriter via
// util/util/binarymessagewriter appendVarUInt) — the Python
// per-byte-append version was 66% of the whole insert wall.
int64_t evql_leb128_encode(
    const uint64_t* vals,
    uint64_t count,
    uint8_t* out) {
  uint8_t* p = out;
  for (uint64_t i = 0; i < count; ++i) {
    uint64_t v = vals[i];
    while (v >= 0x80) {
      *p++ = static_cast<uint8_t>(v) | 0x80;
      v >>= 7;
    }
    *p++ = static_cast<uint8_t>(v);
  }
  return static_cast<int64_t>(p - out);
}

// Parse [u32 len][bytes] length-prefixed strings: writes each value's
// (offset, length) pair. Returns bytes consumed or -1 on truncation.
int64_t evql_lenenc_strings(
    const uint8_t* buf,
    uint64_t buf_len,
    uint64_t count,
    uint64_t* offsets,
    uint32_t* lengths) {
  uint64_t pos = 0;
  for (uint64_t i = 0; i < count; ++i) {
    if (pos + 4 > buf_len) {
      return -1;
    }
    uint32_t len;
    memcpy(&len, buf + pos, 4);
    pos += 4;
    if (pos + len > buf_len) {
      return -1;
    }
    offsets[i] = pos;
    lengths[i] = len;
    pos += len;
  }
  return static_cast<int64_t>(pos);
}

// Scatter defined values into a dense row vector: out[i] = values[j++]
// where dlvls[i] == d_max else 0. uint64 variant.
void evql_scatter_defined_u64(
    const uint32_t* dlvls,
    uint64_t n,
    uint32_t d_max,
    const uint64_t* values,
    uint64_t* out,
    uint8_t* valid) {
  uint64_t j = 0;
  for (uint64_t i = 0; i < n; ++i) {
    if (dlvls[i] == d_max) {
      out[i] = values[j++];
      valid[i] = 1;
    } else {
      out[i] = 0;
      valid[i] = 0;
    }
  }
}

}  // extern "C"
