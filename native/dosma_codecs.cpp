// dosma_tpu native compressed-pixel decoders.
//
// The reference reads compressed DICOM transfer syntaxes through pydicom's
// C pixel handlers (/root/reference/dosma/core/io/dicom_io.py:303-314).
// dosma_tpu's from-scratch Python codecs (core/io/dicom/codecs.py) are
// correct but slow for the bit-serial JPEG-lossless Huffman scan
// (~1.2 s/slice in CPython); these C++ twins decode the same formats at
// native speed and are dispatched via ctypes with a pure-Python fallback.
//
// Semantics mirror core/io/dicom/codecs.py exactly:
//   - RLE Lossless (PS3.5 Annex G): 64-byte header, PackBits segments,
//     MSB-plane-first; output bytes are big-endian samples.
//   - JPEG Lossless (ITU T.81 process 14, SOF3): single component,
//     predictors 1-7, point transform, restart intervals (row-aligned),
//     0xFF00 byte unstuffing, 16-bit wraparound arithmetic.
//
// Build: make -C native  (produces dosma_tpu/_lib/libdosma_codecs.so)

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// PackBits (one RLE segment).
// ---------------------------------------------------------------------------
static long long packbits_decode(const uint8_t *src, long long n, uint8_t *dst,
                                 long long expected) {
  long long si = 0, di = 0;
  while (si < n && di < expected) {
    int8_t h = (int8_t)src[si++];
    if (h >= 0) {
      long long cnt = (long long)h + 1;
      if (si + cnt > n || di + cnt > expected) return -1;
      std::memcpy(dst + di, src + si, (size_t)cnt);
      si += cnt;
      di += cnt;
    } else if (h != -128) {
      long long cnt = 1 - (long long)h;
      if (si >= n || di + cnt > expected) return -1;
      std::memset(dst + di, src[si++], (size_t)cnt);
      di += cnt;
    }
    // h == -128: no-op per spec.
  }
  return di;
}

// Decode one RLE frame. dst receives rows*cols*samples*nbytes bytes laid out
// as big-endian samples (matching numpy dtype ">u<nbytes>"). Returns 0 on
// success; negative error codes otherwise.
int dosma_rle_decode(const uint8_t *src, long long n, uint8_t *dst, int rows,
                     int cols, int samples, int nbytes) {
  if (n < 64) return -1;
  uint32_t header[16];
  std::memcpy(header, src, 64);
  int nseg = (int)header[0];
  if (nseg != samples * nbytes || nseg < 1 || nseg > 15) return -2;

  long long plane_len = (long long)rows * cols;
  long long offsets[16];
  for (int k = 0; k < nseg; ++k) offsets[k] = (long long)header[1 + k];
  offsets[nseg] = n;

  // Temporary plane buffer; interleave into dst as we go.
  std::vector<uint8_t> plane((size_t)plane_len);
  for (int k = 0; k < nseg; ++k) {
    if (offsets[k] < 64 || offsets[k] > n || offsets[k + 1] < offsets[k]) return -3;
    long long got = packbits_decode(src + offsets[k], offsets[k + 1] - offsets[k],
                                    plane.data(), plane_len);
    if (got != plane_len) return -4;
    int s = k / nbytes;  // sample index
    int b = k % nbytes;  // byte plane (0 = MSB)
    long long stride = (long long)samples * nbytes;
    uint8_t *base = dst + (long long)s * nbytes + b;
    for (long long p = 0; p < plane_len; ++p) base[p * stride] = plane[(size_t)p];
  }
  return 0;
}

// ---------------------------------------------------------------------------
// JPEG Lossless (SOF3) decoder.
// ---------------------------------------------------------------------------
namespace {

struct BitReader {
  const uint8_t *data;
  long long n;
  long long pos;
  uint64_t acc = 0;
  int nbits = 0;
  bool error = false;

  BitReader(const uint8_t *d, long long n_, long long p) : data(d), n(n_), pos(p) {}

  inline void fill() {
    if (pos >= n) {
      error = true;
      acc = (acc << 8) | 0xFF;  // 1-padding keeps the decoder terminating
      nbits += 8;
      return;
    }
    uint8_t byte = data[pos++];
    if (byte == 0xFF) {
      uint8_t nxt = pos < n ? data[pos] : 0xD9;
      if (nxt == 0x00) {
        ++pos;  // stuffed byte
      }
      // else: marker — feed 0xFF padding, don't consume the marker.
    }
    acc = (acc << 8) | byte;
    nbits += 8;
  }

  inline uint32_t read(int want) {
    while (nbits < want) fill();
    nbits -= want;
    uint32_t v = (uint32_t)((acc >> nbits) & ((1u << want) - 1));
    acc &= (nbits >= 64) ? ~0ULL : ((1ULL << nbits) - 1);
    return v;
  }
};

// Canonical Huffman decode tables (T.81 F.16): MINCODE/MAXCODE/VALPTR.
struct HuffTable {
  int32_t mincode[17];
  int32_t maxcode[17];  // -1 when no codes of that length
  int valptr[17];
  uint8_t huffval[256];
  bool valid = false;
};

static void build_table(const uint8_t *bits, const uint8_t *values, int nval,
                        HuffTable &t) {
  int code = 0, vi = 0;
  for (int l = 1; l <= 16; ++l) {
    if (bits[l - 1]) {
      t.valptr[l] = vi;
      t.mincode[l] = code;
      code += bits[l - 1];
      vi += bits[l - 1];
      t.maxcode[l] = code - 1;
    } else {
      t.mincode[l] = 0;
      t.maxcode[l] = -1;
      t.valptr[l] = 0;
    }
    code <<= 1;
  }
  std::memcpy(t.huffval, values, (size_t)(nval < 256 ? nval : 256));
  t.valid = true;
}

static inline int read_symbol(BitReader &br, const HuffTable &t) {
  int code = (int)br.read(1);
  for (int l = 1; l <= 16; ++l) {
    if (t.maxcode[l] >= 0 && code <= t.maxcode[l]) {
      return t.huffval[t.valptr[l] + (code - t.mincode[l])];
    }
    code = (code << 1) | (int)br.read(1);
  }
  return -1;
}

}  // namespace

// Decode a single-component SOF3 stream. out_meta receives
// {rows, cols, precision, point_transform}. dst must hold rows*cols uint16
// (call with dst=null and the function fills out_meta only after parsing
// headers — pass probe=1). Returns 0 ok; negative codes:
//  -1 bad stream  -2 unsupported feature  -3 corrupt entropy data
int dosma_jpeg_lossless_decode(const uint8_t *data, long long n, uint16_t *dst,
                               long long dst_len, int *out_meta, int probe) {
  if (n < 4 || data[0] != 0xFF || data[1] != 0xD8) return -1;
  long long pos = 2;
  int precision = -1, rows = -1, cols = -1;
  int predictor = 1, point_transform = 0, restart_interval = 0;
  HuffTable tables[4];
  int scan_table_id = -1;

  while (pos + 1 < n) {
    if (data[pos] != 0xFF) return -1;
    uint8_t marker = data[pos + 1];
    pos += 2;
    if (marker == 0xD9) return -1;  // EOI before SOS
    if (marker == 0x01 || (marker >= 0xD0 && marker <= 0xD7)) continue;
    if (pos + 2 > n) return -1;
    int seglen = (data[pos] << 8) | data[pos + 1];
    if (pos + seglen > n) return -1;
    const uint8_t *body = data + pos + 2;
    int blen = seglen - 2;
    pos += seglen;

    if (marker == 0xC3) {  // SOF3
      if (blen < 6) return -1;
      precision = body[0];
      rows = (body[1] << 8) | body[2];
      cols = (body[3] << 8) | body[4];
      if (body[5] != 1) return -2;  // components
    } else if (marker == 0xC0 || marker == 0xC1 || marker == 0xC2 ||
               (marker >= 0xC5 && marker <= 0xC7) ||
               (marker >= 0xC9 && marker <= 0xCB) ||
               (marker >= 0xCD && marker <= 0xCF)) {
      return -2;  // non-lossless process
    } else if (marker == 0xC4) {  // DHT
      int bpos = 0;
      while (bpos + 17 <= blen) {
        int tc_th = body[bpos];
        const uint8_t *bits = body + bpos + 1;
        int nval = 0;
        for (int i = 0; i < 16; ++i) nval += bits[i];
        if (nval > 256) return -1;  // huffval overflow (corrupt DHT)
        if (bpos + 17 + nval > blen) return -1;
        build_table(bits, body + bpos + 17, nval, tables[tc_th & 0x03]);
        bpos += 17 + nval;
      }
    } else if (marker == 0xDD) {  // DRI
      if (blen < 2) return -1;
      restart_interval = (body[0] << 8) | body[1];
    } else if (marker == 0xDA) {  // SOS
      if (blen < 4) return -1;
      int ns = body[0];
      if (ns != 1) return -2;
      scan_table_id = body[2] >> 4;
      predictor = body[1 + 2 * ns];
      point_transform = body[3 + 2 * ns] & 0x0F;
      break;
    }
  }

  if (precision < 2 || rows < 0 || scan_table_id < 0 ||
      !tables[scan_table_id & 0x03].valid)
    return -1;
  if (out_meta) {
    out_meta[0] = rows;
    out_meta[1] = cols;
    out_meta[2] = precision;
    out_meta[3] = point_transform;
  }
  if (probe) return 0;
  if (!dst || dst_len < (long long)rows * cols) return -1;
  if (predictor < 1 || predictor > 7) return -2;

  const HuffTable &tab = tables[scan_table_id & 0x03];
  BitReader br(data, n, pos);
  int x0 = 1 << (precision - point_transform - 1);
  long long until_restart = restart_interval ? restart_interval : -1;
  bool first_line = true;

  for (int r = 0; r < rows; ++r) {
    uint16_t *row = dst + (long long)r * cols;
    const uint16_t *above = first_line ? nullptr : row - cols;
    for (int c = 0; c < cols; ++c) {
      if (until_restart == 0) {
        if (c > 0) return -2;  // restart mid-row unsupported (matches Python)
        br.nbits = 0;
        br.acc = 0;
        if (br.pos + 1 < n && br.data[br.pos] == 0xFF &&
            br.data[br.pos + 1] >= 0xD0 && br.data[br.pos + 1] <= 0xD7) {
          br.pos += 2;
        } else if (br.pos > 0 && br.pos < n && br.data[br.pos] >= 0xD0 &&
                   br.data[br.pos] <= 0xD7 && br.data[br.pos - 1] == 0xFF) {
          // fill() already consumed the 0xFF while feeding padding.
          br.pos += 1;
        }
        above = nullptr;
        first_line = true;
        until_restart = restart_interval;
      }
      int ssss = read_symbol(br, tab);
      if (ssss < 0) return -3;
      int32_t diff;
      if (ssss == 16) {
        diff = 32768;
      } else if (ssss == 0) {
        diff = 0;
      } else {
        uint32_t v = br.read(ssss);
        diff = (v >= (1u << (ssss - 1))) ? (int32_t)v
                                         : (int32_t)v - (1 << ssss) + 1;
      }
      int32_t px;
      if (above == nullptr) {
        px = c > 0 ? (int32_t)row[c - 1] : x0;
      } else if (c == 0) {
        px = (int32_t)above[0];
      } else {
        int32_t ra = row[c - 1], rb = above[c], rc = above[c - 1];
        switch (predictor) {
          case 1: px = ra; break;
          case 2: px = rb; break;
          case 3: px = rc; break;
          case 4: px = ra + rb - rc; break;
          case 5: px = ra + ((rb - rc) >> 1); break;
          case 6: px = rb + ((ra - rc) >> 1); break;
          default: px = (ra + rb) >> 1; break;  // 7
        }
      }
      row[c] = (uint16_t)((px + diff) & 0xFFFF);
      if (until_restart > 0) --until_restart;
    }
    // Rows after the first of a (restart) interval predict from above.
    if (first_line) first_line = false;
    if (br.error) return -3;
  }

  if (point_transform) {
    long long total = (long long)rows * cols;
    for (long long i = 0; i < total; ++i)
      dst[i] = (uint16_t)(dst[i] << point_transform);
  }
  return 0;
}

// ---------------------------------------------------------------------------
// JPEG Baseline/Extended (SOF0/SOF1) decoder — single component.
// Mirrors core/io/dicom/jpeg_baseline.py: grayscale 8/12-bit, restart
// intervals; multi-component (color) streams return -2 so the ctypes
// bridge falls back to the Python decoder.
// ---------------------------------------------------------------------------
namespace {

// Orthonormal DCT-II basis A[u][x] = alpha(u) cos((2x+1) u pi / 16) —
// JPEG's 1/4 C(u)C(v) normalization IS the orthonormal scaling.
struct DctBasis {
  double A[8][8];
  DctBasis() {
    const double pi = 3.14159265358979323846;
    for (int u = 0; u < 8; ++u)
      for (int x = 0; x < 8; ++x)
        A[u][x] = (u == 0 ? 0.35355339059327373 : 0.5) *
                  __builtin_cos((2 * x + 1) * u * pi / 16.0);
  }
};
static const DctBasis kDct;

static const uint8_t kZigzag[64] = {
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63};

static void idct8x8(const int32_t *coef, const int32_t *quant, int shift,
                    int maxval, int32_t *out) {
  double F[8][8], T[8][8];
  for (int i = 0; i < 64; ++i)
    F[i >> 3][i & 7] = (double)coef[i] * quant[i];
  // T = A^T * F  (T[x][v] = sum_u A[u][x] F[u][v])
  for (int x = 0; x < 8; ++x)
    for (int v = 0; v < 8; ++v) {
      double s = 0;
      for (int u = 0; u < 8; ++u) s += kDct.A[u][x] * F[u][v];
      T[x][v] = s;
    }
  // out = T * A  (out[x][y] = sum_v T[x][v] A[v][y])
  for (int x = 0; x < 8; ++x)
    for (int y = 0; y < 8; ++y) {
      double s = 0;
      for (int v = 0; v < 8; ++v) s += T[x][v] * kDct.A[v][y];
      // nearbyint (default FE_TONEAREST = half-to-even) matches numpy's
      // np.round rounding MODE. NOTE: exact-.5 IDCT outputs (flat blocks
      // at some qualities) can still differ by 1 gray level from the
      // Python twin — numpy's einsum accumulates in a different order, so
      // the tie value itself may differ in the last ULP. The documented
      // codec contract is therefore ±1 on rounding ties (standard across
      // independent JPEG IDCT implementations).
      long long px = (long long)__builtin_nearbyint(s + shift);
      if (px < 0) px = 0;
      if (px > maxval) px = maxval;
      out[x * 8 + y] = (int32_t)px;
    }
}

}  // namespace

// Decode a single-component SOF0/SOF1 stream. out_meta receives
// {rows, cols, precision, 0}. Returns 0 ok; negative codes as lossless:
//  -1 bad stream  -2 unsupported feature (e.g. color)  -3 corrupt entropy
int dosma_jpeg_baseline_decode(const uint8_t *data, long long n, uint16_t *dst,
                               long long dst_len, int *out_meta, int probe) {
  if (n < 4 || data[0] != 0xFF || data[1] != 0xD8) return -1;
  long long pos = 2;
  int precision = -1, rows = -1, cols = -1, restart_interval = 0;
  int dc_id = -1, ac_id = -1;
  HuffTable dc_tables[4], ac_tables[4];
  int32_t quant[4][64];
  bool quant_valid[4] = {false, false, false, false};
  int comp_tq = 0;

  while (pos + 1 < n) {
    if (data[pos] != 0xFF) return -1;
    uint8_t marker = data[pos + 1];
    pos += 2;
    if (marker == 0xD9) return -1;
    if (marker == 0x01 || (marker >= 0xD0 && marker <= 0xD7)) continue;
    if (pos + 2 > n) return -1;
    int seglen = (data[pos] << 8) | data[pos + 1];
    if (pos + seglen > n) return -1;
    const uint8_t *body = data + pos + 2;
    int blen = seglen - 2;
    pos += seglen;

    if (marker == 0xC0 || marker == 0xC1) {  // SOF0/SOF1
      if (blen < 9) return -1;
      precision = body[0];
      rows = (body[1] << 8) | body[2];
      cols = (body[3] << 8) | body[4];
      if (body[5] != 1) return -2;  // color → Python path
      if ((body[7] >> 4) != 1 || (body[7] & 0x0F) != 1) return -2;
      comp_tq = body[8] & 0x03;
    } else if (marker == 0xC2 || marker == 0xC3 ||
               (marker >= 0xC5 && marker <= 0xC7) ||
               (marker >= 0xC9 && marker <= 0xCB) ||
               (marker >= 0xCD && marker <= 0xCF)) {
      return -2;  // progressive / lossless / arithmetic
    } else if (marker == 0xDB) {  // DQT
      int bpos = 0;
      while (bpos < blen) {
        int pq = body[bpos] >> 4, tq = body[bpos] & 0x03;
        int nbytes = 64 * (pq ? 2 : 1);
        if (bpos + 1 + nbytes > blen) return -1;
        for (int i = 0; i < 64; ++i) {
          int v = pq ? ((body[bpos + 1 + 2 * i] << 8) | body[bpos + 2 + 2 * i])
                     : body[bpos + 1 + i];
          quant[tq][kZigzag[i]] = v;
        }
        quant_valid[tq] = true;
        bpos += 1 + nbytes;
      }
    } else if (marker == 0xC4) {  // DHT
      int bpos = 0;
      while (bpos + 17 <= blen) {
        int tc_th = body[bpos];
        const uint8_t *bits = body + bpos + 1;
        int nval = 0;
        for (int i = 0; i < 16; ++i) nval += bits[i];
        if (nval > 256 || bpos + 17 + nval > blen) return -1;
        build_table(bits, body + bpos + 17, nval,
                    ((tc_th >> 4) ? ac_tables : dc_tables)[tc_th & 0x03]);
        bpos += 17 + nval;
      }
    } else if (marker == 0xDD) {  // DRI
      if (blen < 2) return -1;
      restart_interval = (body[0] << 8) | body[1];
    } else if (marker == 0xDA) {  // SOS
      if (blen < 4) return -1;
      if (body[0] != 1) return -2;
      dc_id = body[2] >> 4;
      ac_id = body[2] & 0x0F;
      break;
    }
  }

  if (precision != 8 && precision != 12) return -2;
  if (rows < 0 || dc_id < 0 || !quant_valid[comp_tq]) return -1;
  if (!dc_tables[dc_id & 3].valid || !ac_tables[ac_id & 3].valid) return -1;
  if (out_meta) {
    out_meta[0] = rows;
    out_meta[1] = cols;
    out_meta[2] = precision;
    out_meta[3] = 0;
  }
  if (probe) return 0;
  if (!dst || dst_len < (long long)rows * cols) return -1;

  const HuffTable &dct_ = dc_tables[dc_id & 3];
  const HuffTable &act = ac_tables[ac_id & 3];
  const int32_t *q = quant[comp_tq];
  BitReader br(data, n, pos);
  int shift = 1 << (precision - 1);
  int maxval = (1 << precision) - 1;
  int bx = (cols + 7) / 8, by = (rows + 7) / 8;
  long long until_restart = restart_interval ? restart_interval : -1;
  int32_t pred = 0;

  for (int mb = 0; mb < by; ++mb) {
    for (int nb = 0; nb < bx; ++nb) {
      if (until_restart == 0) {
        br.nbits = 0;
        br.acc = 0;
        if (br.pos + 1 < n && br.data[br.pos] == 0xFF &&
            br.data[br.pos + 1] >= 0xD0 && br.data[br.pos + 1] <= 0xD7) {
          br.pos += 2;
        } else if (br.pos > 0 && br.pos < n && br.data[br.pos] >= 0xD0 &&
                   br.data[br.pos] <= 0xD7 && br.data[br.pos - 1] == 0xFF) {
          br.pos += 1;
        }
        pred = 0;
        until_restart = restart_interval;
      }
      int32_t coef[64];
      std::memset(coef, 0, sizeof(coef));
      int ssss = read_symbol(br, dct_);
      if (ssss < 0 || ssss > 15) return -3;
      int32_t diff = 0;
      if (ssss) {
        uint32_t v = br.read(ssss);
        diff = (v >= (1u << (ssss - 1))) ? (int32_t)v
                                         : (int32_t)v - (1 << ssss) + 1;
      }
      pred += diff;
      coef[0] = pred;
      int k = 1;
      while (k < 64) {
        int rs = read_symbol(br, act);
        if (rs < 0) return -3;
        int r = rs >> 4, s2 = rs & 0x0F;
        if (s2 == 0) {
          if (r == 15) {
            k += 16;
            continue;
          }
          break;  // EOB
        }
        k += r;
        if (k > 63) return -3;
        uint32_t v = br.read(s2);
        coef[kZigzag[k]] = (v >= (1u << (s2 - 1))) ? (int32_t)v
                                                   : (int32_t)v - (1 << s2) + 1;
        ++k;
      }
      if (br.error) return -3;

      int32_t pix[64];
      idct8x8(coef, q, shift, maxval, pix);
      int r0 = mb * 8, c0 = nb * 8;
      int rmax = rows - r0 < 8 ? rows - r0 : 8;
      int cmax = cols - c0 < 8 ? cols - c0 : 8;
      for (int r = 0; r < rmax; ++r)
        for (int c = 0; c < cmax; ++c)
          dst[(long long)(r0 + r) * cols + (c0 + c)] = (uint16_t)pix[r * 8 + c];
      if (until_restart > 0) --until_restart;
    }
  }
  return 0;
}

// ---------------------------------------------------------------------------
// Encoders (byte-identical twins of the Python codecs).
// ---------------------------------------------------------------------------
static long long packbits_encode(const uint8_t *src, long long n, uint8_t *dst,
                                 long long cap) {
  long long i = 0, o = 0;
  while (i < n) {
    long long run = 1;
    while (i + run < n && run < 128 && src[i + run] == src[i]) ++run;
    if (run >= 2) {
      if (o + 2 > cap) return -1;
      dst[o++] = (uint8_t)(257 - run);
      dst[o++] = src[i];
      i += run;
      continue;
    }
    long long j = i + 1;
    while (j < n && j - i < 128) {
      if (j + 2 < n && src[j] == src[j + 1] && src[j] == src[j + 2]) break;
      ++j;
    }
    if (o + 1 + (j - i) > cap) return -1;
    dst[o++] = (uint8_t)(j - i - 1);
    std::memcpy(dst + o, src + i, (size_t)(j - i));
    o += j - i;
    i = j;
  }
  return o;
}

// Encode one frame as RLE Lossless. src_be: big-endian sample bytes in
// pixel-major order (rows*cols*samples*nbytes). Returns total bytes written
// to dst (header + segments), or negative on overflow/invalid input.
long long dosma_rle_encode(const uint8_t *src_be, int rows, int cols,
                           int samples, int nbytes, uint8_t *dst,
                           long long cap) {
  int nseg = samples * nbytes;
  if (nseg < 1 || nseg > 15) return -2;
  long long plane_len = (long long)rows * cols;
  if (cap < 64) return -1;

  uint32_t header[16] = {0};
  header[0] = (uint32_t)nseg;
  long long o = 64;
  std::vector<uint8_t> plane((size_t)plane_len);
  long long stride = (long long)samples * nbytes;
  int k = 0;
  for (int s = 0; s < samples; ++s) {
    for (int b = 0; b < nbytes; ++b, ++k) {
      const uint8_t *base = src_be + (long long)s * nbytes + b;
      for (long long p = 0; p < plane_len; ++p) plane[(size_t)p] = base[p * stride];
      long long got = packbits_encode(plane.data(), plane_len, dst + o, cap - o);
      if (got < 0) return -1;
      if (got % 2) {
        if (o + got + 1 > cap) return -1;
        dst[o + got] = 0x00;
        ++got;
      }
      header[1 + k] = (uint32_t)o;
      o += got;
    }
  }
  std::memcpy(dst, header, 64);
  return o;
}

namespace {

struct BitWriter {
  uint8_t *dst;
  long long cap;
  long long o = 0;
  uint64_t acc = 0;
  int nbits = 0;
  bool overflow = false;

  BitWriter(uint8_t *d, long long c) : dst(d), cap(c) {}

  inline void write(uint32_t value, int want) {
    if (want == 0) return;
    acc = (acc << want) | (value & ((want >= 32) ? 0xFFFFFFFFu : ((1u << want) - 1)));
    nbits += want;
    while (nbits >= 8) {
      uint8_t byte = (uint8_t)((acc >> (nbits - 8)) & 0xFF);
      if (o >= cap) { overflow = true; return; }
      dst[o++] = byte;
      if (byte == 0xFF) {
        if (o >= cap) { overflow = true; return; }
        dst[o++] = 0x00;  // stuffing
      }
      nbits -= 8;
    }
    acc &= (nbits >= 64) ? ~0ULL : ((1ULL << nbits) - 1);
  }

  inline void flush() {
    if (nbits) {
      int pad = 8 - nbits;
      write((1u << pad) - 1, pad);  // 1-padding per T.81 F.1.2.3
    }
  }
};

}  // namespace

// Encode a 2D unsigned frame (uint16 samples) as a single-component JPEG
// lossless (SOF3) stream with the fixed Huffman table the Python encoder
// uses. Returns bytes written, negative on error.
long long dosma_jpeg_lossless_encode(const uint16_t *src, int rows, int cols,
                                     int precision, int predictor,
                                     int point_transform, uint8_t *dst,
                                     long long cap) {
  if (precision < 2 || precision > 16) return -2;
  if (predictor < 1 || predictor > 7) return -2;
  // Fixed encoder table: categories 0-2 at 2 bits, 3..16 at 3..16 bits.
  static const uint8_t enc_bits[16] = {0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1};
  static const uint8_t enc_values[17] = {0, 1, 2, 3, 4, 5, 6, 7, 8,
                                         9, 10, 11, 12, 13, 14, 15, 16};
  uint16_t codes[17];
  uint8_t lens[17];
  {
    int code = 0, vi = 0;
    for (int l = 1; l <= 16; ++l) {
      for (int c = 0; c < enc_bits[l - 1]; ++c) {
        codes[enc_values[vi]] = (uint16_t)code;
        lens[enc_values[vi]] = (uint8_t)l;
        ++code;
        ++vi;
      }
      code <<= 1;
    }
  }

  long long o = 0;
  auto put = [&](std::initializer_list<uint8_t> bytes) -> bool {
    for (uint8_t b : bytes) {
      if (o >= cap) return false;
      dst[o++] = b;
    }
    return true;
  };
  if (!put({0xFF, 0xD8})) return -1;  // SOI
  // SOF3: length 11, precision, lines, samples/line, 1 component (1, 1x1, 0)
  if (!put({0xFF, 0xC3, 0x00, 11, (uint8_t)precision, (uint8_t)(rows >> 8),
            (uint8_t)rows, (uint8_t)(cols >> 8), (uint8_t)cols, 1, 1, 0x11, 0}))
    return -1;
  // DHT (class 0, id 0)
  int dht_len = 2 + 1 + 16 + 17;
  if (!put({0xFF, 0xC4, (uint8_t)(dht_len >> 8), (uint8_t)dht_len, 0x00})) return -1;
  for (int i = 0; i < 16; ++i)
    if (!put({enc_bits[i]})) return -1;
  for (int i = 0; i < 17; ++i)
    if (!put({enc_values[i]})) return -1;
  // SOS: 1 component, Ss=predictor, Se=0, Ah<<4|Al=point transform
  if (!put({0xFF, 0xDA, 0x00, 8, 1, 1, 0x00, (uint8_t)predictor, 0,
            (uint8_t)point_transform}))
    return -1;

  BitWriter bw(dst + o, cap - o);
  int x0 = 1 << (precision - point_transform - 1);
  std::vector<int32_t> prev((size_t)cols), cur((size_t)cols);
  bool first_line = true;
  for (int r = 0; r < rows; ++r) {
    const uint16_t *row = src + (long long)r * cols;
    for (int c = 0; c < cols; ++c) cur[(size_t)c] = (int32_t)(row[c] >> point_transform);
    for (int c = 0; c < cols; ++c) {
      int32_t px;
      if (first_line) {
        px = c > 0 ? cur[(size_t)(c - 1)] : x0;
      } else if (c == 0) {
        px = prev[0];
      } else {
        int32_t ra = cur[(size_t)(c - 1)], rb = prev[(size_t)c], rc = prev[(size_t)(c - 1)];
        switch (predictor) {
          case 1: px = ra; break;
          case 2: px = rb; break;
          case 3: px = rc; break;
          case 4: px = ra + rb - rc; break;
          case 5: px = ra + ((rb - rc) >> 1); break;
          case 6: px = rb + ((ra - rc) >> 1); break;
          default: px = (ra + rb) >> 1; break;
        }
      }
      int32_t diff = (cur[(size_t)c] - px) & 0xFFFF;
      if (diff >= 0x8000) diff -= 0x10000;
      int ssss;
      if (diff == -32768) {
        ssss = 16;
      } else {
        uint32_t a = (uint32_t)(diff < 0 ? -diff : diff);
        ssss = 0;
        while (a) { ++ssss; a >>= 1; }
      }
      bw.write(codes[ssss], lens[ssss]);
      if (ssss > 0 && ssss < 16) {
        int32_t v = diff > 0 ? diff : diff + (1 << ssss) - 1;
        bw.write((uint32_t)v, ssss);
      }
      if (bw.overflow) return -1;
    }
    std::swap(prev, cur);
    first_line = false;
  }
  bw.flush();
  if (bw.overflow) return -1;
  o += bw.o;
  if (o + 2 > cap) return -1;
  dst[o++] = 0xFF;
  dst[o++] = 0xD9;  // EOI
  return o;
}

}  // extern "C"
