// Native strip/tile codec for the GeoTIFF I/O layer.
//
// Implements the hot byte-level loops that are impractically slow in Python:
//   - TIFF-flavor LZW encode/decode (MSB-first bit packing, early change)
//   - PackBits decode
//   - horizontal predictor apply/undo (any sample size 1/2/4/8 bytes)
//
// Exposed as a plain C ABI consumed from Python via ctypes
// (rs_image_segmentation_tpu/io/native.py). Built by native/build.sh.

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------- LZW decode
// Returns number of bytes written to out, or -1 on corrupt stream.
// out_cap must be the exact expected decoded size (decoding stops there).
long lzw_decode(const uint8_t* in, long in_len, uint8_t* out, long out_cap) {
  // Table entries store (previous_code, appended_byte); strings are
  // materialized by walking the chain backwards into a scratch buffer.
  const int MAX_CODES = 4096;
  std::vector<int> prev(MAX_CODES);
  std::vector<uint8_t> last(MAX_CODES);
  std::vector<int> length(MAX_CODES);
  int table_size = 258;
  auto reset = [&]() {
    for (int i = 0; i < 256; i++) { prev[i] = -1; last[i] = (uint8_t)i; length[i] = 1; }
    table_size = 258;
  };
  reset();

  uint32_t buf = 0;
  int nbits = 0;
  int bitlen = 9;
  long pos = 0, out_pos = 0;
  int prev_code = -1;
  std::vector<uint8_t> scratch(MAX_CODES);

  auto emit = [&](int code) -> int {  // returns length emitted or -1
    int len = length[code];
    if (out_pos + len > out_cap) len = (int)(out_cap - out_pos);
    int full = length[code];
    int c = code;
    for (int i = full - 1; i >= 0; i--) { scratch[i] = last[c]; c = prev[c]; }
    std::memcpy(out + out_pos, scratch.data(), len);
    out_pos += len;
    return full;
  };

  while (out_pos < out_cap) {
    while (nbits < bitlen && pos < in_len) {
      buf = (buf << 8) | in[pos++];
      nbits += 8;
    }
    if (nbits < bitlen) break;
    int code = (buf >> (nbits - bitlen)) & ((1u << bitlen) - 1);
    nbits -= bitlen;
    if (code == 256) { reset(); bitlen = 9; prev_code = -1; continue; }
    if (code == 257) break;
    if (prev_code < 0) {
      if (code >= 256) return -1;
      emit(code);
      prev_code = code;
    } else {
      int entry;
      if (code < table_size) {
        entry = code;
      } else if (code == table_size) {
        entry = -2;  // KwKwK case
      } else {
        return -1;
      }
      if (table_size < MAX_CODES) {
        // new entry = prev_code string + first byte of entry string
        int first = (entry == -2) ? prev_code : code;
        while (prev[first] >= 0) first = prev[first];
        int fb_code = first;  // code whose last byte is the first byte
        // find first byte by walking: cheaper to track during emit; do direct:
        // walk chain of `prev_code + x`: first byte of a chain code c is the
        // root byte. Roots are codes < 256 whose last==byte.
        uint8_t first_byte = last[fb_code];
        prev[table_size] = prev_code;
        last[table_size] = first_byte;
        length[table_size] = length[prev_code] + 1;
        table_size++;
      }
      if (entry == -2) emit(table_size - 1); else emit(code);
      prev_code = (entry == -2) ? table_size - 1 : code;
    }
    if (table_size + 1 >= (1 << bitlen) && bitlen < 12) bitlen++;
  }
  return out_pos;
}

// ---------------------------------------------------------------- LZW encode
// Hash-table based encoder. Returns compressed size, or -1 if out_cap too small.
long lzw_encode(const uint8_t* in, long in_len, uint8_t* out, long out_cap) {
  // Dictionary: key = (prefix_code << 8) | byte, value = code.
  // Open-addressing hash table sized 2x max codes.
  const int MAX_CODES = 4096;
  const int HASH_SIZE = 1 << 14;
  const int HASH_MASK = HASH_SIZE - 1;
  std::vector<int32_t> hash_key(HASH_SIZE);
  std::vector<int16_t> hash_val(HASH_SIZE);

  uint64_t buf = 0;
  int nbits = 0;
  long out_pos = 0;

  auto put = [&](int code, int bitlen) -> bool {
    buf = (buf << bitlen) | (uint32_t)code;
    nbits += bitlen;
    while (nbits >= 8) {
      if (out_pos >= out_cap) return false;
      out[out_pos++] = (uint8_t)((buf >> (nbits - 8)) & 0xFF);
      nbits -= 8;
    }
    return true;
  };

  auto clear_table = [&]() {
    std::memset(hash_key.data(), 0xFF, HASH_SIZE * sizeof(int32_t));
  };

  clear_table();
  int next_code = 258;
  int bitlen = 9;
  if (!put(256, bitlen)) return -1;  // initial clear code

  long i = 0;
  if (in_len == 0) {
    if (!put(257, bitlen)) return -1;
  } else {
    int w = in[i++];  // current prefix code (single bytes are codes 0..255)
    while (i < in_len) {
      uint8_t c = in[i++];
      int32_t key = (w << 8) | c;
      uint32_t h = ((uint32_t)key * 2654435761u) & HASH_MASK;
      int found = -1;
      while (hash_key[h] != -1) {
        if (hash_key[h] == key) { found = hash_val[h]; break; }
        h = (h + 1) & HASH_MASK;
      }
      if (found >= 0) {
        w = found;
        continue;
      }
      if (!put(w, bitlen)) return -1;
      hash_key[h] = key;
      hash_val[h] = (int16_t)next_code;
      next_code++;
      if (next_code + 1 > (1 << bitlen)) {
        if (bitlen < 12) {
          bitlen++;
        } else {
          if (!put(256, bitlen)) return -1;
          clear_table();
          next_code = 258;
          bitlen = 9;
        }
      }
      w = c;
    }
    if (!put(w, bitlen)) return -1;
  }
  if (!put(257, bitlen)) return -1;
  if (nbits > 0) {
    if (out_pos >= out_cap) return -1;
    out[out_pos++] = (uint8_t)((buf << (8 - nbits)) & 0xFF);
  }
  return out_pos;
}

// ------------------------------------------------------------ PackBits decode
long packbits_decode(const uint8_t* in, long in_len, uint8_t* out, long out_cap) {
  long i = 0, o = 0;
  while (i < in_len) {
    int h = in[i++];
    if (h < 128) {
      int n = h + 1;
      if (o + n > out_cap || i + n > in_len) return -1;
      std::memcpy(out + o, in + i, n);
      i += n; o += n;
    } else if (h > 128) {
      int n = 257 - h;
      if (o + n > out_cap || i >= in_len) return -1;
      std::memset(out + o, in[i++], n);
      o += n;
    }
  }
  return o;
}

// ------------------------------------------------- horizontal predictor (u8..u64)
// rows x cols pixels, `stride` samples per pixel, sample size `ss` bytes.
// Differencing is per sample channel along the column axis.
void predictor_undo(uint8_t* data, long rows, long cols, long stride, int ss) {
  long row_bytes = cols * stride * ss;
  for (long r = 0; r < rows; r++) {
    uint8_t* row = data + r * row_bytes;
    if (ss == 1) {
      for (long x = stride; x < cols * stride; x++) row[x] = (uint8_t)(row[x] + row[x - stride]);
    } else if (ss == 2) {
      uint16_t* p = (uint16_t*)row;
      for (long x = stride; x < cols * stride; x++) p[x] = (uint16_t)(p[x] + p[x - stride]);
    } else if (ss == 4) {
      uint32_t* p = (uint32_t*)row;
      for (long x = stride; x < cols * stride; x++) p[x] = p[x] + p[x - stride];
    } else if (ss == 8) {
      uint64_t* p = (uint64_t*)row;
      for (long x = stride; x < cols * stride; x++) p[x] = p[x] + p[x - stride];
    }
  }
}

void predictor_apply(uint8_t* data, long rows, long cols, long stride, int ss) {
  long row_bytes = cols * stride * ss;
  for (long r = 0; r < rows; r++) {
    uint8_t* row = data + r * row_bytes;
    if (ss == 1) {
      for (long x = cols * stride - 1; x >= stride; x--) row[x] = (uint8_t)(row[x] - row[x - stride]);
    } else if (ss == 2) {
      uint16_t* p = (uint16_t*)row;
      for (long x = cols * stride - 1; x >= stride; x--) p[x] = (uint16_t)(p[x] - p[x - stride]);
    } else if (ss == 4) {
      uint32_t* p = (uint32_t*)row;
      for (long x = cols * stride - 1; x >= stride; x--) p[x] = p[x] - p[x - stride];
    } else if (ss == 8) {
      uint64_t* p = (uint64_t*)row;
      for (long x = cols * stride - 1; x >= stride; x--) p[x] = p[x] - p[x - stride];
    }
  }
}

}  // extern "C"

// 256-bin histogram of a uint8 buffer: 4 sub-histograms unrolled to break
// the store-to-load dependency chain; ~7x numpy.bincount on this host
// (0.73 -> 0.10 ms per 360k-px band). Used by
// pipeline.preprocess.build_stretch_stats to precompute the stretched-
// value histograms the device preamble would otherwise accumulate.
extern "C" void hist_u8(const uint8_t* in, long n, int64_t* out) {
  int64_t h0[256] = {0}, h1[256] = {0}, h2[256] = {0}, h3[256] = {0};
  long i = 0;
  for (; i + 4 <= n; i += 4) {
    h0[in[i]]++; h1[in[i + 1]]++; h2[in[i + 2]]++; h3[in[i + 3]]++;
  }
  for (; i < n; i++) h0[in[i]]++;
  for (int v = 0; v < 256; v++) out[v] = h0[v] + h1[v] + h2[v] + h3[v];
}
