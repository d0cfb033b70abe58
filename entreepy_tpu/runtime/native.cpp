// entreepy_tpu native host runtime.
//
// The TPU owns the bulk compute path (ops/*.py); this library owns the
// host-side serial/bit-twiddling work around it, replacing the numpy
// fallbacks at memory-bandwidth speed:
//
//   * et_pack_body       — serial encode bit-pack (reference hot loop
//                          encode.zig:301-319, one writeBits per bit there;
//                          here a 64-bit accumulator, one store per word)
//   * et_unpack_body     — serial decode via the flat multi-level LUT
//                          (reference decode.zig:143-203 probes a hash per
//                          candidate length; here one table walk per symbol)
//   * et_compact_symbols — gather the TPU FSM decoder's dense (packed,count)
//                          emission slots into the contiguous output stream
//   * et_assemble_payloads / et_stitch_words — compact per-block emission
//                          slots and merge per-block bitstreams at bit
//                          granularity into the single .et body
//
// Exposed with plain C linkage for ctypes (no pybind11 in this toolchain).
// All bit order is big-endian (MSB first) to match the .et format.

#include <cstdint>
#include <cstring>

extern "C" {

// ---------------------------------------------------------------- encode ---
// Pack data[0..n) MSB-first using codes/lens (256 entries, right-aligned
// codes). out must hold at least (sum lens + 7) / 8 bytes. Returns total
// bits, or -1 if a byte with len==0 is hit.
long long et_pack_body(const uint8_t* data, long long n, const uint32_t* codes,
                       const uint8_t* lens, uint8_t* out) {
  uint64_t acc = 0;  // bits held in the TOP `nbits` bits
  int nbits = 0;
  long long total_bits = 0;
  uint8_t* p = out;
  for (long long i = 0; i < n; ++i) {
    const uint8_t b = data[i];
    const int len = lens[b];
    if (len == 0) return -1;
    acc |= (uint64_t)codes[b] << (64 - nbits - len);
    nbits += len;
    total_bits += len;
    while (nbits >= 8) {
      *p++ = (uint8_t)(acc >> 56);
      acc <<= 8;
      nbits -= 8;
    }
  }
  if (nbits > 0) *p++ = (uint8_t)(acc >> 56);
  return total_bits;
}

// ---------------------------------------------------------------- decode ---
// Flat multi-level LUT walk (layout of format/lut.py): entry > 0 is
// (total_len << 8) | symbol, entry < 0 is -child_table_id, 0 is invalid.
// Returns symbols decoded, or -1 on invalid window, -2 on truncated body.
static inline uint32_t et_load32(const uint8_t* body, long long bitpos) {
  // 32 stream bits starting at `bitpos` (caller pads body by >= 16 bytes).
  uint64_t w;
  std::memcpy(&w, body + (bitpos >> 3), 8);
#if defined(__BYTE_ORDER__) && __BYTE_ORDER__ == __ORDER_LITTLE_ENDIAN__
  w = __builtin_bswap64(w);
#endif
  return (uint32_t)((w << (bitpos & 7)) >> 32);
}

long long et_unpack_body(const uint8_t* body, long long body_bytes,
                         const int32_t* lut, int lookup_bits, uint8_t* out,
                         long long n_symbols) {
  const long long avail_bits = body_bytes * 8;
  const uint32_t fanout = 1u << lookup_bits;
  long long bitpos = 0;
  for (long long i = 0; i < n_symbols; ++i) {
    if (bitpos >= avail_bits) return -2;
    int32_t tid = 0;
    int consumed = 0;
    for (;;) {
      const uint32_t window = et_load32(body, bitpos + consumed);
      const uint32_t idx = window >> (32 - lookup_bits);
      const int32_t entry = lut[(uint32_t)tid * fanout + idx];
      if (entry > 0) {
        out[i] = (uint8_t)(entry & 0xFF);
        bitpos += entry >> 8;
        break;
      }
      if (entry == 0) return -1;
      tid = -entry;
      consumed += lookup_bits;
      if (consumed >= 32) return -1;  // malformed LUT / corrupt stream
    }
  }
  return n_symbols;
}

// Compact the FSM decoder's dense emission: packed[i] holds up to 4 symbols
// MSB-first, counts[i] in [0,4]. Writes exactly n_symbols and returns the
// number written (may be < n_symbols if the slots run dry).
long long et_compact_symbols(const uint32_t* packed, const int32_t* counts,
                             long long n_slots, uint8_t* out,
                             long long n_symbols) {
  long long w = 0;
  for (long long i = 0; i < n_slots && w < n_symbols; ++i) {
    const uint32_t p = packed[i];
    const int c = counts[i];
    // c is 0 for most slots; unrolled MSB-first emit
    if (c > 0) {
      out[w++] = (uint8_t)(p >> 24);
      if (c > 1 && w < n_symbols) out[w++] = (uint8_t)(p >> 16);
      if (c > 2 && w < n_symbols) out[w++] = (uint8_t)(p >> 8);
      if (c > 3 && w < n_symbols) out[w++] = (uint8_t)p;
    }
  }
  return w;
}

// Sum counts over the first n_real slots (truncation validation).
long long et_sum_counts(const int32_t* counts, long long n) {
  long long s = 0;
  for (long long i = 0; i < n; ++i) s += counts[i];
  return s;
}

// --------------------------------------------------------------- streams ---
// Compact dense per-block emission slots into per-block payload rows.
// words/emitted: [lanes, steps] row-major; payload: [lanes, cap] row-major
// (zeroed by caller); acc/nbits: final partial word per lane. Writes
// bit_lens[lane]. Returns 0, or -1 if a row overflows cap.
int et_assemble_payloads(const uint32_t* words, const uint8_t* emitted,
                         long long lanes, long long steps, const uint32_t* acc,
                         const int32_t* nbits, uint32_t* payload, long long cap,
                         long long* bit_lens) {
  for (long long l = 0; l < lanes; ++l) {
    const uint32_t* wrow = words + l * steps;
    const uint8_t* erow = emitted + l * steps;
    uint32_t* prow = payload + l * cap;
    long long k = 0;
    for (long long s = 0; s < steps; ++s) {
      if (erow[s]) {
        if (k >= cap) return -1;
        prow[k++] = wrow[s];
      }
    }
    if (k >= cap) return -1;
    prow[k] = acc[l];
    bit_lens[l] = k * 32 + nbits[l];
  }
  return 0;
}

// Bit-granular concatenation of per-block streams. payload: [lanes, cap]
// row-major u32 words in big-endian bit order; bit_lens per block. out:
// zeroed u32 array with capacity >= (sum bits + 31)/32 + 1 words.
// Returns total bits.
long long et_stitch_words(const uint32_t* payload, long long lanes,
                          long long cap, const long long* bit_lens,
                          uint32_t* out) {
  long long off = 0;
  for (long long l = 0; l < lanes; ++l) {
    const long long bl = bit_lens[l];
    if (bl == 0) continue;
    const uint32_t* w = payload + l * cap;
    const long long nw = (bl + 31) >> 5;
    long long base = off >> 5;
    const int s = (int)(off & 31);
    if (s == 0) {
      for (long long i = 0; i < nw; ++i) out[base + i] |= w[i];
    } else {
      for (long long i = 0; i < nw; ++i) {
        out[base + i] |= w[i] >> s;
        out[base + i + 1] |= (uint32_t)((uint64_t)w[i] << (32 - s));
      }
    }
    off += bl;
  }
  return off;
}

}  // extern "C"
