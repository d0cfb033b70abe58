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

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

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

}  // extern "C" (scalar entry points)

// ------------------------------------------------------------- parallel ---
// The multithreaded host backend mirrors the TPU kernels' algorithms:
// independent blocks for encode, self-synchronizing chunks for decode
// (SURVEY.md §5 "long-context" row; the reference names block-parallel
// decoding as unimplemented future work, README.md:55).

static int et_nthreads(int requested) {
  if (requested > 0) return requested;
  const unsigned hc = std::thread::hardware_concurrency();
  return hc ? (int)hc : 1;
}

template <typename F>
static void et_parallel_for(long long n, int nthreads, F f) {
  if (n <= 0) return;
  if (nthreads <= 1 || n == 1) {
    for (long long i = 0; i < n; ++i) f(i);
    return;
  }
  std::vector<std::thread> ts;
  const int k = (int)(nthreads < n ? nthreads : n);
  std::atomic<long long> next(0);
  for (int t = 0; t < k; ++t)
    ts.emplace_back([&] {
      for (;;) {
        const long long i = next.fetch_add(1);
        if (i >= n) return;
        f(i);
      }
    });
  for (auto& th : ts) th.join();
}

extern "C" {

// 256-bin histogram, threaded. out256 must be zeroed by the caller.
void et_histogram(const uint8_t* data, long long n, long long* out256,
                  int nthreads) {
  const int k = et_nthreads(nthreads);
  const long long stripe = (n + k - 1) / k;
  std::vector<std::vector<long long>> part((size_t)k);
  et_parallel_for(k, k, [&](long long t) {
    auto& h = part[(size_t)t];
    h.assign(256, 0);
    const long long lo = t * stripe;
    const long long hi = (lo + stripe < n) ? lo + stripe : n;
    // 4-way sub-histograms to break the store-to-load dependency
    long long h4[4][256];
    std::memset(h4, 0, sizeof h4);
    long long i = lo;
    for (; i + 4 <= hi; i += 4) {
      ++h4[0][data[i]];
      ++h4[1][data[i + 1]];
      ++h4[2][data[i + 2]];
      ++h4[3][data[i + 3]];
    }
    for (; i < hi; ++i) ++h4[0][data[i]];
    for (int s = 0; s < 256; ++s)
      h[(size_t)s] = h4[0][s] + h4[1][s] + h4[2][s] + h4[3][s];
  });
  for (int t = 0; t < k; ++t)
    for (int s = 0; s < 256; ++s) out256[s] += part[(size_t)t][(size_t)s];
}

// Threaded block-parallel pack straight into the final (pre-zeroed) stream:
// pass 1 sizes every block, a prefix sum places it, pass 2 packs blocks
// concurrently, OR-ing the shared boundary bytes atomically.
long long et_pack_parallel(const uint8_t* data, long long n,
                           const uint32_t* codes, const uint8_t* lens,
                           long long block_bytes, uint8_t* out, int nthreads) {
  if (n == 0) return 0;
  const long long nb = (n + block_bytes - 1) / block_bytes;
  std::vector<long long> bits((size_t)nb);
  std::atomic<bool> bad(false);
  et_parallel_for(nb, et_nthreads(nthreads), [&](long long b) {
    const long long lo = b * block_bytes;
    const long long hi = (lo + block_bytes < n) ? lo + block_bytes : n;
    long long s = 0;
    for (long long i = lo; i < hi; ++i) {
      const int len = lens[data[i]];
      if (len == 0) bad.store(true, std::memory_order_relaxed);
      s += len;
    }
    bits[(size_t)b] = s;
  });
  if (bad.load()) return -1;

  std::vector<long long> off((size_t)nb + 1);
  off[0] = 0;
  for (long long b = 0; b < nb; ++b) off[(size_t)b + 1] = off[(size_t)b] + bits[(size_t)b];
  const long long total_bits = off[(size_t)nb];

  et_parallel_for(nb, et_nthreads(nthreads), [&](long long b) {
    const long long lo = b * block_bytes;
    const long long hi = (lo + block_bytes < n) ? lo + block_bytes : n;
    const long long start = off[(size_t)b];
    uint8_t* p = out + (start >> 3);
    uint64_t acc = 0;
    int nbits = (int)(start & 7);  // lead zeros over the shared boundary byte
    bool first = true;
    for (long long i = lo; i < hi; ++i) {
      const uint8_t sym = data[i];
      acc |= (uint64_t)codes[sym] << (64 - nbits - lens[sym]);
      nbits += lens[sym];
      while (nbits >= 8) {
        const uint8_t byte = (uint8_t)(acc >> 56);
        if (first) {
          __atomic_fetch_or(p, byte, __ATOMIC_RELAXED);
          first = false;
        } else {
          *p = byte;
        }
        ++p;
        acc <<= 8;
        nbits -= 8;
      }
    }
    if (nbits > 0) __atomic_fetch_or(p, (uint8_t)(acc >> 56), __ATOMIC_RELAXED);
  });
  return total_bits;
}

// Fast serial walk of [start, end) with a sliding 64-bit buffer (one byte
// load per 8 stream bits instead of an 8-byte load per symbol). Appends
// decoded symbols to `syms`, optionally records the first `nsync` codeword
// start bits into `bounds`, and returns the exit bit position (first
// codeword boundary at or past `end`). `body` must be padded >= 16 bytes.
static long long et_walk_fast(const uint8_t* body, long long start,
                              long long end, const int32_t* lut,
                              int lookup_bits, std::vector<uint8_t>& syms,
                              std::vector<long long>* bounds, int nsync) {
  const uint8_t* p = body + (start >> 3);
  uint64_t buf = 0;
  int nbits = 0;
  long long pos = start;
  // prime the buffer and drop the sub-byte phase
  while (nbits <= 56) {
    buf |= (uint64_t)(*p++) << (56 - nbits);
    nbits += 8;
  }
  buf <<= (start & 7);
  nbits -= (int)(start & 7);
  const uint32_t fanout = 1u << lookup_bits;
  while (pos < end) {
    while (nbits <= 56) {
      buf |= (uint64_t)(*p++) << (56 - nbits);
      nbits += 8;
    }
    if (bounds && (int)bounds->size() < nsync) bounds->push_back(pos);
    int len = 1;
    uint8_t sym = 0;
    int32_t tid = 0;
    int consumed = 0;
    for (;;) {
      const uint32_t idx = (uint32_t)((buf << consumed) >> (64 - lookup_bits));
      const int32_t e = lut[(uint32_t)tid * fanout + idx];
      if (e > 0) {
        len = e >> 8;
        sym = (uint8_t)(e & 0xFF);
        break;
      }
      if (e == 0) break;  // invalid window: emit 0, advance 1 bit
      tid = -e;
      consumed += lookup_bits;
      if (consumed >= 32) break;
    }
    syms.push_back(sym);
    buf <<= len;
    nbits -= len;
    pos += len;
  }
  return pos;
}

// Threaded single-pass speculative chunk decode ("gap array" scheme, cf. the
// GPU decoders in PAPERS.md): every chunk decodes once in parallel from its
// own start bit (a guess for all but chunk 0), recording its first few
// codeword boundary positions; prefix codes self-synchronize, so the true
// entry of chunk i+1 (= chunk i's exit) is almost always one of those
// recorded boundaries, and a serial O(chunks) confirmation walk just looks
// it up. Chunks whose guess never synced (rare, pathological) are re-walked
// serially from their now-known true entry. Returns symbols written, or
// -2 (truncated stream).
long long et_decode_parallel(const uint8_t* body, long long body_bytes,
                             const int32_t* lut, int lookup_bits,
                             long long chunk_bits, uint8_t* out,
                             long long n_symbols, int nthreads,
                             int max_passes) {
  (void)max_passes;
  const long long avail = body_bytes * 8;
  const long long nc = (avail + chunk_bits - 1) / chunk_bits;
  const int k = et_nthreads(nthreads);
  constexpr int NSYNC = 64;  // boundary positions recorded per chunk

  struct Chunk {
    std::vector<uint8_t> syms;        // speculative decode from the guess
    std::vector<long long> bounds;    // start bits of the first NSYNC codes
    long long exit = 0;
    long long valid_from = 0;         // symbol index where decode is correct
  };
  std::vector<Chunk> ch((size_t)nc);

  // --- pass 1: speculative parallel decode of every chunk -----------------
  et_parallel_for(nc, k, [&](long long i) {
    Chunk& c = ch[(size_t)i];
    const long long end = ((i + 1) * chunk_bits < avail) ? (i + 1) * chunk_bits : avail;
    c.syms.reserve((size_t)(chunk_bits / 4));
    c.bounds.reserve(NSYNC);
    c.exit = et_walk_fast(body, i * chunk_bits, end, lut, lookup_bits, c.syms,
                          &c.bounds, NSYNC);
  });

  // --- serial confirmation: link exits to recorded boundaries -------------
  long long entry = 0;
  for (long long i = 0; i < nc; ++i) {
    Chunk& c = ch[(size_t)i];
    const long long end = ((i + 1) * chunk_bits < avail) ? (i + 1) * chunk_bits : avail;
    long long vf = -1;
    for (size_t j = 0; j < c.bounds.size(); ++j) {
      if (c.bounds[j] == entry) {
        vf = (long long)j;
        break;
      }
      if (c.bounds[j] > entry) break;
    }
    if (vf < 0) {
      // guess never synced before `entry` (or entry beyond the recorded
      // window): re-walk this chunk from the true entry
      c.syms.clear();
      c.exit = et_walk_fast(body, entry, end, lut, lookup_bits, c.syms, nullptr, 0);
      c.valid_from = 0;
    } else {
      c.valid_from = vf;
    }
    entry = c.exit;
  }

  // --- offsets + parallel copy-out ---------------------------------------
  std::vector<long long> off((size_t)nc + 1);
  off[0] = 0;
  for (long long i = 0; i < nc; ++i)
    off[(size_t)i + 1] =
        off[(size_t)i] + (long long)ch[(size_t)i].syms.size() - ch[(size_t)i].valid_from;
  if (off[(size_t)nc] < n_symbols) return -2;

  et_parallel_for(nc, k, [&](long long i) {
    const long long start = off[(size_t)i];
    if (start >= n_symbols) return;
    const Chunk& c = ch[(size_t)i];
    long long cnt = (long long)c.syms.size() - c.valid_from;
    if (start + cnt > n_symbols) cnt = n_symbols - start;
    if (cnt > 0)
      std::memcpy(out + start, c.syms.data() + c.valid_from, (size_t)cnt);
  });
  return n_symbols;
}

}  // extern "C"
