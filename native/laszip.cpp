// LASzip (LAZ) codec for COPC / LAS 1.4 point clouds — TPU framework native IO.
//
// Clean-room implementation of the public LASzip compression scheme
// (Isenburg, "LASzip: lossless compression of lidar data", PE&RS 2013;
// format spec at laszip.org) for compressor 3 ("layered chunked") with the
// POINT14 v3 item — the encoding used by COPC .laz files, which is the only
// LiDAR format the P3 dataset ships (reference reads it via laspy[lazrs]:
// /root/reference/pixelspointspolygons/datasets/p3_coco.py:78).
//
// Components:
//  - FastAC-style 32-bit range coder (adaptive binary + symbol models)
//  - IntegerCompressor (k-bit interval corrector coding)
//  - StreamingMedian5 predictors
//  - POINT14 v3 layered per-chunk decode/encode with 4 scanner-channel
//    contexts and selective layer framing
//  - chunked file assembly: LAS 1.4 header, LASzip VLR, chunk table
//
// The two 16x16 return-context tables (map->6ctx, level->8ctx) only select
// prediction buckets (median bucket for X/Y, last_Z slot for Z); they never
// influence which arithmetic models decode the stream — stream sync is
// table-independent. The tables below match the published LASzip v3
// constants: DEFAULT_MAP6 is number_return_map_6ctx and level8() computes
// number_return_level_8ctx = clamp(|n - r|, 0..7) in closed form (verified
// against the values recovered from real COPC streams by
// scripts/dev_recover_laz_tables.py). Multi-return coding is exercised end
// to end by tests/test_laz.py round-trips with randomized
// (return_number, number_of_returns), including degenerate combos (0,0)
// (what P3 tiles carry), r > n, and the full 0..15 range. As defense in
// depth the Python binding still verifies decoded min/max against the
// header bbox and refuses silently-corrupt output.
//
// C API (ctypes): p3laz_read_points / p3laz_write_points / p3laz_last_error.

#include <cstdint>
#include <cstring>
#include <cstdio>
#include <cstdlib>
#include <string>
#include <vector>

typedef uint8_t U8;
typedef uint16_t U16;
typedef uint32_t U32;
typedef uint64_t U64;
typedef int8_t I8;
typedef int16_t I16;
typedef int32_t I32;
typedef int64_t I64;
typedef double F64;

static const U32 AC_MaxLength = 0xFFFFFFFFu;
static const U32 AC_MinLength = 0x01000000u;
static const U32 BM_LengthShift = 13;
static const U32 BM_MaxCount = 1u << BM_LengthShift;
static const U32 DM_LengthShift = 15;
static const U32 DM_MaxCount = 1u << DM_LengthShift;

struct LazError {
  std::string msg;
};

// ---------------------------------------------------------------------------
// byte streams
// ---------------------------------------------------------------------------

struct ByteIn {
  const U8* buf;
  I64 len;
  I64 pos;
  ByteIn(const U8* b, I64 n) : buf(b), len(n), pos(0) {}
  inline U8 getByte() { return pos < len ? buf[pos++] : (pos++, 0); }
  inline void getBytes(U8* out, I64 n) {
    for (I64 i = 0; i < n; i++) out[i] = getByte();
  }
  inline U32 get32() {
    U32 v = 0;
    for (int i = 0; i < 4; i++) v |= U32(getByte()) << (8 * i);
    return v;
  }
  inline U64 get64() {
    U64 v = 0;
    for (int i = 0; i < 8; i++) v |= U64(getByte()) << (8 * i);
    return v;
  }
  inline void skip(I64 n) { pos += n; }
};

struct ByteOut {
  std::vector<U8> buf;
  inline void putByte(U8 b) { buf.push_back(b); }
  inline void putBytes(const U8* b, I64 n) { buf.insert(buf.end(), b, b + n); }
  inline void put32(U32 v) {
    for (int i = 0; i < 4; i++) putByte(U8(v >> (8 * i)));
  }
  inline void put64(U64 v) {
    for (int i = 0; i < 8; i++) putByte(U8(v >> (8 * i)));
  }
  inline I64 size() const { return (I64)buf.size(); }
};

// ---------------------------------------------------------------------------
// adaptive models
// ---------------------------------------------------------------------------

struct BitModel {
  U32 bit_0_count, bit_count, bit_0_prob, update_cycle, bits_until_update;
  void init() {
    bit_0_count = 1;
    bit_count = 2;
    bit_0_prob = 1u << (BM_LengthShift - 1);
    update_cycle = bits_until_update = 4;
  }
  void update() {
    if ((bit_count += update_cycle) > BM_MaxCount) {
      bit_count = (bit_count + 1) >> 1;
      bit_0_count = (bit_0_count + 1) >> 1;
      if (bit_0_count == bit_count) ++bit_count;
    }
    U32 scale = 0x80000000u / bit_count;
    bit_0_prob = (bit_0_count * scale) >> (31 - BM_LengthShift);
    update_cycle = (5 * update_cycle) >> 2;
    if (update_cycle > 64) update_cycle = 64;
    bits_until_update = update_cycle;
  }
};

struct SymModel {
  std::vector<U32> storage;  // distribution | symbol_count | decoder_table
  U32* distribution = nullptr;
  U32* symbol_count = nullptr;
  U32* decoder_table = nullptr;
  U32 symbols = 0, last_symbol = 0, table_size = 0, table_shift = 0;
  U32 total_count = 0, update_cycle = 0, symbols_until_update = 0;
  bool compress = false;

  void create(U32 n, bool for_compress) {
    symbols = n;
    compress = for_compress;
    last_symbol = n - 1;
    if (!compress && n > 16) {
      U32 table_bits = 3;
      while (n > (1u << (table_bits + 2))) ++table_bits;
      table_size = 1u << table_bits;
      table_shift = DM_LengthShift - table_bits;
      storage.assign(2 * n + table_size + 2, 0);
      decoder_table = storage.data() + 2 * n;
    } else {
      table_size = table_shift = 0;
      storage.assign(2 * n, 0);
      decoder_table = nullptr;
    }
    distribution = storage.data();
    symbol_count = storage.data() + n;
  }
  void init() {
    total_count = 0;
    update_cycle = symbols;
    for (U32 k = 0; k < symbols; k++) symbol_count[k] = 1;
    update();
    symbols_until_update = update_cycle = (symbols + 6) >> 1;
  }
  void update() {
    if ((total_count += update_cycle) > DM_MaxCount) {
      total_count = 0;
      for (U32 n = 0; n < symbols; n++)
        total_count += (symbol_count[n] = (symbol_count[n] + 1) >> 1);
    }
    U32 k, sum = 0, s = 0;
    U32 scale = 0x80000000u / total_count;
    if (compress || table_size == 0) {
      for (k = 0; k < symbols; k++) {
        distribution[k] = (scale * sum) >> (31 - DM_LengthShift);
        sum += symbol_count[k];
      }
    } else {
      for (k = 0; k < symbols; k++) {
        distribution[k] = (scale * sum) >> (31 - DM_LengthShift);
        sum += symbol_count[k];
        U32 w = distribution[k] >> table_shift;
        while (s < w) decoder_table[++s] = k - 1;
      }
      decoder_table[0] = 0;
      while (s <= table_size) decoder_table[++s] = symbols - 1;
    }
    update_cycle = (5 * update_cycle) >> 2;
    U32 max_cycle = (symbols + 6) << 3;
    if (update_cycle > max_cycle) update_cycle = max_cycle;
    symbols_until_update = update_cycle;
  }
};

// ---------------------------------------------------------------------------
// range decoder / encoder (FastAC)
// ---------------------------------------------------------------------------

struct Decoder {
  ByteIn* in = nullptr;
  U32 value = 0, length = 0;

  void init(ByteIn* stream, bool really_init = true) {
    in = stream;
    length = AC_MaxLength;
    if (really_init) {
      value = (U32(in->getByte()) << 24) | (U32(in->getByte()) << 16) |
              (U32(in->getByte()) << 8) | U32(in->getByte());
    }
  }
  inline void renorm() {
    do {
      value = (value << 8) | in->getByte();
    } while ((length <<= 8) < AC_MinLength);
  }
  U32 decodeBit(BitModel& m) {
    U32 x = m.bit_0_prob * (length >> BM_LengthShift);
    U32 sym = (value >= x);
    if (sym == 0) {
      length = x;
      ++m.bit_0_count;
    } else {
      value -= x;
      length -= x;
    }
    if (length < AC_MinLength) renorm();
    if (--m.bits_until_update == 0) m.update();
    return sym;
  }
  U32 decodeSymbol(SymModel& m) {
    U32 n, sym, x, y = length;
    if (m.decoder_table) {
      U32 dv = value / (length >>= DM_LengthShift);
      U32 t = dv >> m.table_shift;
      sym = m.decoder_table[t];
      n = m.decoder_table[t + 1] + 1;
      while (n > sym + 1) {
        U32 k = (sym + n) >> 1;
        if (m.distribution[k] > dv)
          n = k;
        else
          sym = k;
      }
      x = m.distribution[sym] * length;
      if (sym != m.last_symbol) y = m.distribution[sym + 1] * length;
    } else {
      x = sym = 0;
      length >>= DM_LengthShift;
      U32 k = (n = m.symbols) >> 1;
      do {
        U32 z = length * m.distribution[k];
        if (z > value) {
          n = k;
          y = z;
        } else {
          sym = k;
          x = z;
        }
      } while ((k = (sym + n) >> 1) != sym);
    }
    value -= x;
    length = y - x;
    if (length < AC_MinLength) renorm();
    ++m.symbol_count[sym];
    if (--m.symbols_until_update == 0) m.update();
    return sym;
  }
  U32 readBits(U32 bits) {
    if (bits > 19) {
      U32 lo = readBits(16);
      U32 hi = readBits(bits - 16) << 16;
      return hi | lo;
    }
    U32 sym = value / (length >>= bits);
    value -= length * sym;
    if (length < AC_MinLength) renorm();
    return sym;
  }
  U32 readInt() { return readBits(32); }
};

struct Encoder {
  ByteOut* out = nullptr;
  I64 start = 0;
  U32 base = 0, length = 0;

  void init(ByteOut* stream) {
    out = stream;
    start = stream->size();
    base = 0;
    length = AC_MaxLength;
  }
  inline void propagate_carry() {
    I64 p = out->size() - 1;
    while (p >= start && out->buf[p] == 0xFFu) out->buf[p--] = 0;
    if (p >= start) ++out->buf[p];
  }
  inline void renorm() {
    do {
      out->putByte(U8(base >> 24));
      base <<= 8;
    } while ((length <<= 8) < AC_MinLength);
  }
  void encodeBit(BitModel& m, U32 bit) {
    U32 x = m.bit_0_prob * (length >> BM_LengthShift);
    if (bit == 0) {
      length = x;
      ++m.bit_0_count;
    } else {
      U32 init_base = base;
      base += x;
      length -= x;
      if (init_base > base) propagate_carry();
    }
    if (length < AC_MinLength) renorm();
    if (--m.bits_until_update == 0) m.update();
  }
  void encodeSymbol(SymModel& m, U32 sym) {
    U32 x, init_base = base;
    if (sym == m.last_symbol) {
      // upper interval: [x, full length) — length must NOT be pre-shifted
      x = m.distribution[sym] * (length >> DM_LengthShift);
      base += x;
      length -= x;
    } else {
      x = m.distribution[sym] * (length >>= DM_LengthShift);
      base += x;
      length = m.distribution[sym + 1] * length - x;
    }
    if (init_base > base) propagate_carry();
    if (length < AC_MinLength) renorm();
    ++m.symbol_count[sym];
    if (--m.symbols_until_update == 0) m.update();
  }
  void writeBits(U32 bits, U32 sym) {
    if (bits > 19) {
      writeBits(16, sym & 0xFFFFu);
      writeBits(bits - 16, sym >> 16);
      return;
    }
    U32 init_base = base;
    base += sym * (length >>= bits);
    if (init_base > base) propagate_carry();
    if (length < AC_MinLength) renorm();
  }
  void writeInt(U32 v) { writeBits(32, v); }
  void done() {
    U32 init_base = base;
    bool another_byte = true;
    if (length > 2 * AC_MinLength) {
      base += AC_MinLength;
      length = AC_MinLength >> 1;
    } else {
      base += AC_MinLength >> 1;
      length = AC_MinLength >> 9;
      another_byte = false;
    }
    if (init_base > base) propagate_carry();
    renorm();
    out->putByte(0);
    out->putByte(0);
    if (!another_byte) out->putByte(0);
  }
};

// ---------------------------------------------------------------------------
// IntegerCompressor: corrector coding relative to a prediction
// ---------------------------------------------------------------------------

struct IntDecompressor {
  Decoder* dec = nullptr;
  U32 bits, contexts, bits_high;
  U32 corr_bits;
  U32 corr_range;
  I32 corr_min, corr_max;
  U32 k = 0;
  std::vector<SymModel> mBits;
  BitModel mCorrector0;
  std::vector<SymModel> mCorrector;  // [1..corr_bits]

  void setup(Decoder* d, U32 bits_, U32 contexts_ = 1, U32 bits_high_ = 8) {
    dec = d;
    bits = bits_;
    contexts = contexts_;
    bits_high = bits_high_;
    if (bits && bits < 32) {
      corr_bits = bits;
      corr_range = 1u << bits;
      corr_min = -I32(corr_range / 2);
      corr_max = corr_min + I32(corr_range) - 1;
    } else {
      corr_bits = 32;
      corr_range = 0;
      corr_min = INT32_MIN;
      corr_max = INT32_MAX;
    }
    mBits.resize(contexts);
    for (U32 i = 0; i < contexts; i++) mBits[i].create(corr_bits + 1, false);
    mCorrector.resize(corr_bits + 1);
    for (U32 i = 1; i <= corr_bits; i++)
      mCorrector[i].create(i <= bits_high ? (1u << i) : (1u << bits_high), false);
  }
  void initDecompressor() {
    for (U32 i = 0; i < contexts; i++) mBits[i].init();
    mCorrector0.init();
    for (U32 i = 1; i <= corr_bits; i++) mCorrector[i].init();
  }
  I32 readCorrector(SymModel& model) {
    I32 c;
    k = dec->decodeSymbol(model);
    if (k) {
      if (k < 32) {
        if (k <= bits_high) {
          c = (I32)dec->decodeSymbol(mCorrector[k]);
        } else {
          U32 k1 = k - bits_high;
          c = (I32)dec->decodeSymbol(mCorrector[k]);
          U32 c1 = dec->readBits(k1);
          c = (c << k1) | (I32)c1;
        }
        if (c >= (1 << (k - 1)))
          c += 1;
        else
          c -= ((1 << k) - 1);
      } else {
        c = corr_min;
      }
    } else {
      c = (I32)dec->decodeBit(mCorrector0);
    }
    return c;
  }
  I32 decompress(I32 pred, U32 context = 0) {
    I32 real = pred + readCorrector(mBits[context]);
    if (corr_range) {
      if (real < 0)
        real += (I32)corr_range;
      else if ((U32)real >= corr_range)
        real -= (I32)corr_range;
    }
    return real;
  }
  // decompress but with an externally-supplied corrector (used by the table
  // recovery replay; must mirror decompress() exactly)
  U32 getK() const { return k; }
};

struct IntCompressor {
  Encoder* enc = nullptr;
  U32 bits, contexts, bits_high;
  U32 corr_bits;
  U32 corr_range;
  I32 corr_min, corr_max;
  U32 k = 0;
  std::vector<SymModel> mBits;
  BitModel mCorrector0;
  std::vector<SymModel> mCorrector;

  void setup(Encoder* e, U32 bits_, U32 contexts_ = 1, U32 bits_high_ = 8) {
    enc = e;
    bits = bits_;
    contexts = contexts_;
    bits_high = bits_high_;
    if (bits && bits < 32) {
      corr_bits = bits;
      corr_range = 1u << bits;
      corr_min = -I32(corr_range / 2);
      corr_max = corr_min + I32(corr_range) - 1;
    } else {
      corr_bits = 32;
      corr_range = 0;
      corr_min = INT32_MIN;
      corr_max = INT32_MAX;
    }
    mBits.resize(contexts);
    for (U32 i = 0; i < contexts; i++) mBits[i].create(corr_bits + 1, true);
    mCorrector.resize(corr_bits + 1);
    for (U32 i = 1; i <= corr_bits; i++)
      mCorrector[i].create(i <= bits_high ? (1u << i) : (1u << bits_high), true);
  }
  void initCompressor() {
    for (U32 i = 0; i < contexts; i++) mBits[i].init();
    mCorrector0.init();
    for (U32 i = 1; i <= corr_bits; i++) mCorrector[i].init();
  }
  void writeCorrector(I32 c, SymModel& model) {
    U32 c1 = (U32)(c <= 0 ? -c : c - 1);
    k = 0;
    while (c1) {
      c1 >>= 1;
      k++;
    }
    enc->encodeSymbol(model, k);
    if (k) {
      if (k < 32) {
        if (c >= 0)
          c -= 1;
        else
          c += ((1 << k) - 1);
        if (k <= bits_high) {
          enc->encodeSymbol(mCorrector[k], (U32)c);
        } else {
          U32 k1 = k - bits_high;
          U32 lo = (U32)c & ((1u << k1) - 1);
          enc->encodeSymbol(mCorrector[k], (U32)c >> k1);
          enc->writeBits(k1, lo);
        }
      }
    } else {
      enc->encodeBit(mCorrector0, (U32)c);
    }
  }
  void compress(I32 pred, I32 real, U32 context = 0) {
    I32 corr = real - pred;
    if (corr_range) {
      if (corr < corr_min)
        corr += (I32)corr_range;
      else if (corr > corr_max)
        corr -= (I32)corr_range;
    }
    writeCorrector(corr, mBits[context]);
  }
  U32 getK() const { return k; }
};

// ---------------------------------------------------------------------------
// streaming median of 5 (X/Y difference predictor)
// ---------------------------------------------------------------------------

struct StreamingMedian5 {
  I32 values[5];
  bool high;
  void init() {
    values[0] = values[1] = values[2] = values[3] = values[4] = 0;
    high = true;
  }
  void add(I32 v) {
    if (high) {
      if (v < values[2]) {
        values[4] = values[3];
        values[3] = values[2];
        if (v < values[0]) {
          values[2] = values[1];
          values[1] = values[0];
          values[0] = v;
        } else if (v < values[1]) {
          values[2] = values[1];
          values[1] = v;
        } else {
          values[2] = v;
        }
      } else {
        if (v < values[3]) {
          values[4] = values[3];
          values[3] = v;
        } else {
          values[4] = v;
        }
        high = false;
      }
    } else {
      if (values[2] < v) {
        values[0] = values[1];
        values[1] = values[2];
        if (values[4] < v) {
          values[2] = values[3];
          values[3] = values[4];
          values[4] = v;
        } else if (values[3] < v) {
          values[2] = values[3];
          values[3] = v;
        } else {
          values[2] = v;
        }
      } else {
        if (values[1] < v) {
          values[0] = values[1];
          values[1] = v;
        } else {
          values[0] = v;
        }
        high = true;
      }
    }
  }
  I32 get() const { return values[2]; }
};

// ---------------------------------------------------------------------------
// POINT14 v3 item
// ---------------------------------------------------------------------------

// Return-context tables. They map the (number_of_returns, return_number)
// pair of the current point to 6 X/Y median-bucket groups and 8 last-Z
// slots. Values recovered from a real COPC tile via
// scripts/dev_recover_laz_tables.py (see file header); overridable at the
// C API for the recovery harness itself.
static const U8 DEFAULT_MAP6[16][16] = {
    {0, 1, 2, 3, 4, 5, 3, 4, 4, 5, 5, 5, 5, 5, 5, 5},
    {1, 0, 1, 3, 4, 5, 3, 4, 4, 5, 5, 5, 5, 5, 5, 5},
    {2, 1, 2, 3, 4, 5, 3, 4, 4, 5, 5, 5, 5, 5, 5, 5},
    {3, 3, 3, 3, 4, 5, 3, 4, 4, 5, 5, 5, 5, 5, 5, 5},
    {4, 4, 4, 4, 4, 5, 3, 4, 4, 5, 5, 5, 5, 5, 5, 5},
    {5, 5, 5, 5, 5, 5, 3, 4, 4, 5, 5, 5, 5, 5, 5, 5},
    {3, 3, 3, 3, 3, 3, 3, 4, 4, 5, 5, 5, 5, 5, 5, 5},
    {4, 4, 4, 4, 4, 4, 4, 4, 4, 5, 5, 5, 5, 5, 5, 5},
    {4, 4, 4, 4, 4, 4, 4, 4, 4, 5, 5, 5, 5, 5, 5, 5},
    {5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5},
    {5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5},
    {5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5},
    {5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5},
    {5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5},
    {5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5},
    {5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5},
};

static U8 level8(U32 n, U32 r) {
  U32 d = n > r ? n - r : r - n;
  return (U8)(d > 7 ? 7 : d);
}

struct Point14 {
  I32 X = 0, Y = 0, Z = 0;
  U16 intensity = 0;
  U8 return_number = 0;      // 4 bits
  U8 number_of_returns = 0;  // 4 bits
  U8 classification_flags = 0;  // 4 bits
  U8 scanner_channel = 0;       // 2 bits
  U8 scan_direction_flag = 0;
  U8 edge_of_flight_line = 0;
  U8 classification = 0;
  U8 user_data = 0;
  I16 scan_angle = 0;
  U16 point_source_ID = 0;
  U64 gps_time_bits = 0;  // f64 bit pattern
  bool gps_time_change = false;  // bookkeeping (not on wire)
};

static void point14_from_wire(const U8* w, Point14* p) {
  memcpy(&p->X, w + 0, 4);
  memcpy(&p->Y, w + 4, 4);
  memcpy(&p->Z, w + 8, 4);
  memcpy(&p->intensity, w + 12, 2);
  U8 rb = w[14];
  p->return_number = rb & 0x0F;
  p->number_of_returns = (rb >> 4) & 0x0F;
  U8 fb = w[15];
  p->classification_flags = fb & 0x0F;
  p->scanner_channel = (fb >> 4) & 0x03;
  p->scan_direction_flag = (fb >> 6) & 0x01;
  p->edge_of_flight_line = (fb >> 7) & 0x01;
  p->classification = w[16];
  p->user_data = w[17];
  memcpy(&p->scan_angle, w + 18, 2);
  memcpy(&p->point_source_ID, w + 20, 2);
  memcpy(&p->gps_time_bits, w + 22, 8);
  p->gps_time_change = false;
}

static void point14_to_wire(const Point14* p, U8* w) {
  memcpy(w + 0, &p->X, 4);
  memcpy(w + 4, &p->Y, 4);
  memcpy(w + 8, &p->Z, 4);
  memcpy(w + 12, &p->intensity, 2);
  w[14] = (U8)((p->return_number & 0x0F) | ((p->number_of_returns & 0x0F) << 4));
  w[15] = (U8)((p->classification_flags & 0x0F) | ((p->scanner_channel & 0x03) << 4) |
               ((p->scan_direction_flag & 1) << 6) | ((p->edge_of_flight_line & 1) << 7));
  w[16] = p->classification;
  w[17] = p->user_data;
  memcpy(w + 18, &p->scan_angle, 2);
  memcpy(w + 20, &p->point_source_ID, 2);
  memcpy(w + 22, &p->gps_time_bits, 8);
}

static const I32 GPSTIME_MULTI = 500;
static const I32 GPSTIME_MULTI_MINUS = -10;
static const I32 GPSTIME_MULTI_UNCHANGED = GPSTIME_MULTI - GPSTIME_MULTI_MINUS + 1;   // 511
static const I32 GPSTIME_MULTI_CODE_FULL = GPSTIME_MULTI - GPSTIME_MULTI_MINUS + 2;   // 512
static const I32 GPSTIME_MULTI_TOTAL = GPSTIME_MULTI - GPSTIME_MULTI_MINUS + 6;       // 516

// per-scanner-channel decoder context
struct CtxDec {
  bool unused = true;
  bool created = false;
  Point14 last;
  StreamingMedian5 last_X_diff_median5[12];
  StreamingMedian5 last_Y_diff_median5[12];
  I32 last_Z[8];
  U16 last_intensity[8];

  SymModel m_changed_values[8];  // 128 syms
  SymModel m_scanner_channel;    // 3
  SymModel m_number_of_returns[16];  // lazy, 16 syms
  SymModel m_return_number[16];      // lazy, 16 syms
  SymModel m_return_number_gps_same;  // 13
  IntDecompressor ic_dX, ic_dY, ic_Z;
  SymModel m_classification[64];  // lazy, 256
  SymModel m_flags[64];           // lazy, 64
  SymModel m_user_data[64];       // lazy, 256
  IntDecompressor ic_intensity, ic_scan_angle, ic_point_source;
  SymModel m_gpstime_multi, m_gpstime_0diff;
  IntDecompressor ic_gpstime;
  U64 last_gpstime[4];
  I32 last_gpstime_diff[4];
  I32 multi_extreme_counter[4];
  U32 gt_last = 0, gt_next = 0;
};

struct RecRecord {  // per-point dump for the table-recovery harness (32 B)
  U8 flags;  // 1=new_chunk, 2=fresh_ctx, 4=gpsflag, 8=z_layer_changed
  U8 ctx, src_ctx, n, r, sc, pad0, pad1;
  I32 cX, cY, cZ;
  I32 firstX, firstY, firstZ;
};

struct Point14v3Dec {
  Decoder dec_xy, dec_z, dec_cls, dec_flags, dec_int, dec_angle, dec_user,
      dec_psrc, dec_gps;
  std::vector<U8> lay_xy, lay_z, lay_cls, lay_flags, lay_int, lay_angle,
      lay_user, lay_psrc, lay_gps;
  ByteIn *bi_xy = nullptr, *bi_z = nullptr, *bi_cls = nullptr,
         *bi_flags = nullptr, *bi_int = nullptr, *bi_angle = nullptr,
         *bi_user = nullptr, *bi_psrc = nullptr, *bi_gps = nullptr;
  std::vector<ByteIn> streams;
  bool ch_z = false, ch_cls = false, ch_flags = false, ch_int = false,
       ch_angle = false, ch_user = false, ch_psrc = false, ch_gps = false;
  CtxDec ctx[4];
  U32 current = 0;
  const U8 (*map6)[16];
  const U8 (*lvl8)[16];  // null -> level8()

  Point14v3Dec(const U8 (*m6)[16], const U8 (*l8)[16]) : map6(m6), lvl8(l8) {}

  U8 lvl(U32 n, U32 r) const { return lvl8 ? lvl8[n][r] : level8(n, r); }

  void create_models(CtxDec& c) {
    if (c.created) return;
    for (int i = 0; i < 8; i++) c.m_changed_values[i].create(128, false);
    c.m_scanner_channel.create(3, false);
    c.m_return_number_gps_same.create(13, false);
    c.ic_dX.setup(&dec_xy, 32, 2);
    c.ic_dY.setup(&dec_xy, 32, 22);
    c.ic_Z.setup(&dec_z, 32, 20);
    c.ic_intensity.setup(&dec_int, 16, 4);
    c.ic_scan_angle.setup(&dec_angle, 16, 2);
    c.ic_point_source.setup(&dec_psrc, 16, 1);
    c.m_gpstime_multi.create(GPSTIME_MULTI_TOTAL, false);
    c.m_gpstime_0diff.create(6, false);
    c.ic_gpstime.setup(&dec_gps, 32, 9);
    c.created = true;
  }

  void init_ctx(U32 which, const Point14& item) {
    CtxDec& c = ctx[which];
    create_models(c);
    for (int i = 0; i < 8; i++) c.m_changed_values[i].init();
    c.m_scanner_channel.init();
    for (int i = 0; i < 16; i++) {
      if (c.m_number_of_returns[i].symbols) c.m_number_of_returns[i].init();
      if (c.m_return_number[i].symbols) c.m_return_number[i].init();
    }
    c.m_return_number_gps_same.init();
    c.ic_dX.initDecompressor();
    c.ic_dY.initDecompressor();
    c.ic_Z.initDecompressor();
    for (int i = 0; i < 64; i++) {
      if (c.m_classification[i].symbols) c.m_classification[i].init();
      if (c.m_flags[i].symbols) c.m_flags[i].init();
      if (c.m_user_data[i].symbols) c.m_user_data[i].init();
    }
    c.ic_intensity.initDecompressor();
    c.ic_scan_angle.initDecompressor();
    c.ic_point_source.initDecompressor();
    c.m_gpstime_multi.init();
    c.m_gpstime_0diff.init();
    c.ic_gpstime.initDecompressor();
    for (int i = 0; i < 12; i++) {
      c.last_X_diff_median5[i].init();
      c.last_Y_diff_median5[i].init();
    }
    c.last = item;
    c.last.gps_time_change = false;
    for (int i = 0; i < 8; i++) c.last_Z[i] = item.Z;
    for (int i = 0; i < 8; i++) c.last_intensity[i] = item.intensity;
    c.last_gpstime[0] = item.gps_time_bits;
    c.last_gpstime[1] = c.last_gpstime[2] = c.last_gpstime[3] = 0;
    c.last_gpstime_diff[0] = c.last_gpstime_diff[1] = c.last_gpstime_diff[2] =
        c.last_gpstime_diff[3] = 0;
    c.multi_extreme_counter[0] = c.multi_extreme_counter[1] =
        c.multi_extreme_counter[2] = c.multi_extreme_counter[3] = 0;
    c.gt_last = c.gt_next = 0;
    c.unused = false;
  }

  // layer sizes as read from the chunk framing
  U32 nb[9] = {0};

  void chunk_sizes(ByteIn& in) {
    for (int i = 0; i < 9; i++) nb[i] = in.get32();
  }

  void init_chunk(ByteIn& in, const Point14& first) {
    auto slurp = [&](std::vector<U8>& dst, U32 n) {
      dst.resize(n);
      in.getBytes(dst.data(), n);
    };
    slurp(lay_xy, nb[0]);
    slurp(lay_z, nb[1]);
    slurp(lay_cls, nb[2]);
    slurp(lay_flags, nb[3]);
    slurp(lay_int, nb[4]);
    slurp(lay_angle, nb[5]);
    slurp(lay_user, nb[6]);
    slurp(lay_psrc, nb[7]);
    slurp(lay_gps, nb[8]);
    streams.clear();
    streams.reserve(9);
    streams.emplace_back(lay_xy.data(), (I64)lay_xy.size());
    streams.emplace_back(lay_z.data(), (I64)lay_z.size());
    streams.emplace_back(lay_cls.data(), (I64)lay_cls.size());
    streams.emplace_back(lay_flags.data(), (I64)lay_flags.size());
    streams.emplace_back(lay_int.data(), (I64)lay_int.size());
    streams.emplace_back(lay_angle.data(), (I64)lay_angle.size());
    streams.emplace_back(lay_user.data(), (I64)lay_user.size());
    streams.emplace_back(lay_psrc.data(), (I64)lay_psrc.size());
    streams.emplace_back(lay_gps.data(), (I64)lay_gps.size());
    if (nb[0]) dec_xy.init(&streams[0]);
    ch_z = nb[1] > 0;
    if (ch_z) dec_z.init(&streams[1]);
    ch_cls = nb[2] > 0;
    if (ch_cls) dec_cls.init(&streams[2]);
    ch_flags = nb[3] > 0;
    if (ch_flags) dec_flags.init(&streams[3]);
    ch_int = nb[4] > 0;
    if (ch_int) dec_int.init(&streams[4]);
    ch_angle = nb[5] > 0;
    if (ch_angle) dec_angle.init(&streams[5]);
    ch_user = nb[6] > 0;
    if (ch_user) dec_user.init(&streams[6]);
    ch_psrc = nb[7] > 0;
    if (ch_psrc) dec_psrc.init(&streams[7]);
    ch_gps = nb[8] > 0;
    if (ch_gps) dec_gps.init(&streams[8]);
    for (int i = 0; i < 4; i++) ctx[i].unused = true;
    current = first.scanner_channel;
    init_ctx(current, first);
  }

  void read_gps_time(CtxDec& c) {
    U32 multi;
    if (c.last_gpstime_diff[c.gt_last] == 0) {
      multi = dec_gps.decodeSymbol(c.m_gpstime_0diff);
      if (multi == 1) {
        c.last_gpstime_diff[c.gt_last] = c.ic_gpstime.decompress(0, 0);
        c.last_gpstime[c.gt_last] =
            (U64)((I64)c.last_gpstime[c.gt_last] + c.last_gpstime_diff[c.gt_last]);
        c.multi_extreme_counter[c.gt_last] = 0;
      } else if (multi == 2) {
        c.gt_next = (c.gt_next + 1) & 3;
        U64 hi = (U64)(U32)c.ic_gpstime.decompress(
            (I32)(c.last_gpstime[c.gt_last] >> 32), 8);
        hi <<= 32;
        hi |= (U64)dec_gps.readInt();
        c.last_gpstime[c.gt_next] = hi;
        c.gt_last = c.gt_next;
        c.last_gpstime_diff[c.gt_last] = 0;
        c.multi_extreme_counter[c.gt_last] = 0;
      } else if (multi > 2) {
        c.gt_last = (c.gt_last + multi - 2) & 3;
        read_gps_time(c);
      }
    } else {
      multi = dec_gps.decodeSymbol(c.m_gpstime_multi);
      if (multi == 1) {
        c.last_gpstime[c.gt_last] = (U64)((I64)c.last_gpstime[c.gt_last] +
            c.ic_gpstime.decompress(c.last_gpstime_diff[c.gt_last], 1));
        c.multi_extreme_counter[c.gt_last] = 0;
      } else if (multi < (U32)GPSTIME_MULTI_UNCHANGED) {
        I32 gpstime_diff;
        if (multi == 0) {
          gpstime_diff = c.ic_gpstime.decompress(0, 7);
          c.multi_extreme_counter[c.gt_last]++;
          if (c.multi_extreme_counter[c.gt_last] > 3) {
            c.last_gpstime_diff[c.gt_last] = gpstime_diff;
            c.multi_extreme_counter[c.gt_last] = 0;
          }
        } else if (multi < (U32)GPSTIME_MULTI) {
          if (multi < 10)
            gpstime_diff = c.ic_gpstime.decompress(
                (I32)multi * c.last_gpstime_diff[c.gt_last], 2);
          else
            gpstime_diff = c.ic_gpstime.decompress(
                (I32)multi * c.last_gpstime_diff[c.gt_last], 3);
        } else if (multi == (U32)GPSTIME_MULTI) {
          gpstime_diff = c.ic_gpstime.decompress(
              GPSTIME_MULTI * c.last_gpstime_diff[c.gt_last], 4);
          c.multi_extreme_counter[c.gt_last]++;
          if (c.multi_extreme_counter[c.gt_last] > 3) {
            c.last_gpstime_diff[c.gt_last] = gpstime_diff;
            c.multi_extreme_counter[c.gt_last] = 0;
          }
        } else {
          I32 multi_neg = GPSTIME_MULTI - (I32)multi;  // -1..-10
          if (multi_neg > GPSTIME_MULTI_MINUS) {
            gpstime_diff = c.ic_gpstime.decompress(
                multi_neg * c.last_gpstime_diff[c.gt_last], 5);
          } else {
            gpstime_diff = c.ic_gpstime.decompress(
                GPSTIME_MULTI_MINUS * c.last_gpstime_diff[c.gt_last], 6);
            c.multi_extreme_counter[c.gt_last]++;
            if (c.multi_extreme_counter[c.gt_last] > 3) {
              c.last_gpstime_diff[c.gt_last] = gpstime_diff;
              c.multi_extreme_counter[c.gt_last] = 0;
            }
          }
        }
        c.last_gpstime[c.gt_last] =
            (U64)((I64)c.last_gpstime[c.gt_last] + gpstime_diff);
      } else if (multi == (U32)GPSTIME_MULTI_CODE_FULL) {
        c.gt_next = (c.gt_next + 1) & 3;
        U64 hi = (U64)(U32)c.ic_gpstime.decompress(
            (I32)(c.last_gpstime[c.gt_last] >> 32), 8);
        hi <<= 32;
        hi |= (U64)dec_gps.readInt();
        c.last_gpstime[c.gt_next] = hi;
        c.gt_last = c.gt_next;
        c.last_gpstime_diff[c.gt_last] = 0;
        c.multi_extreme_counter[c.gt_last] = 0;
      } else if (multi >= (U32)GPSTIME_MULTI_CODE_FULL) {
        c.gt_last = (c.gt_last + multi - GPSTIME_MULTI_CODE_FULL) & 3;
        read_gps_time(c);
      }
    }
  }

  void read(Point14* out, RecRecord* rec) {
    Point14* last = &ctx[current].last;
    U32 lpr = (last->return_number == 1 ? 1u : 0u);
    lpr += (last->return_number >= last->number_of_returns ? 2u : 0u);
    lpr += (last->gps_time_change ? 4u : 0u);

    I32 changed_values =
        (I32)dec_xy.decodeSymbol(ctx[current].m_changed_values[lpr]);

    bool point_source_change = false, gps_time_change = false,
         scan_angle_change = false;
    U32 n, r;
    bool fresh = false;
    U32 src = current;
    if (changed_values) {
      if (changed_values & (1 << 6)) {
        U32 diff = dec_xy.decodeSymbol(ctx[current].m_scanner_channel);
        U32 sc = (current + diff + 1) % 4;
        if (ctx[sc].unused) {
          init_ctx(sc, ctx[current].last);
          fresh = true;
        }
        current = sc;
        last = &ctx[current].last;
        last->scanner_channel = (U8)sc;
      }
      point_source_change = (changed_values & (1 << 5)) != 0;
      gps_time_change = (changed_values & (1 << 4)) != 0;
      scan_angle_change = (changed_values & (1 << 3)) != 0;

      U32 last_n = last->number_of_returns;
      U32 last_r = last->return_number;
      if (changed_values & (1 << 2)) {
        CtxDec& c = ctx[current];
        if (c.m_number_of_returns[last_n].symbols == 0) {
          c.m_number_of_returns[last_n].create(16, false);
          c.m_number_of_returns[last_n].init();
        }
        n = dec_xy.decodeSymbol(c.m_number_of_returns[last_n]);
        last->number_of_returns = (U8)n;
      } else {
        n = last_n;
      }

      switch (changed_values & 3) {
        case 0:
          r = last_r;
          break;
        case 1:
          r = (last_r + 1) % 16;
          last->return_number = (U8)r;
          break;
        case 2:
          r = (last_r + 15) % 16;
          last->return_number = (U8)r;
          break;
        default: {
          CtxDec& c = ctx[current];
          if (gps_time_change) {
            if (c.m_return_number[last_r].symbols == 0) {
              c.m_return_number[last_r].create(16, false);
              c.m_return_number[last_r].init();
            }
            r = dec_xy.decodeSymbol(c.m_return_number[last_r]);
          } else {
            U32 sym = dec_xy.decodeSymbol(c.m_return_number_gps_same);
            r = (last_r + sym + 2) % 16;
          }
          last->return_number = (U8)r;
          break;
        }
      }
    } else {
      n = last->number_of_returns;
      r = last->return_number;
    }

    U32 m = map6[n][r];
    U32 l = lvl(n, r);
    U32 cpr = (r == 1 ? 2u : 0u) + (r >= n ? 1u : 0u);
    U32 gps_flag = gps_time_change ? 1u : 0u;
    CtxDec& c = ctx[current];

    // X
    I32 median = c.last_X_diff_median5[(m << 1) | gps_flag].get();
    I32 diff = c.ic_dX.decompress(median, n == 1 ? 1 : 0);
    last->X += diff;
    c.last_X_diff_median5[(m << 1) | gps_flag].add(diff);
    I32 cX = diff - median;

    // Y
    median = c.last_Y_diff_median5[(m << 1) | gps_flag].get();
    U32 k_bits = c.ic_dX.getK();
    diff = c.ic_dY.decompress(
        median, (n == 1 ? 1u : 0u) + (k_bits < 20 ? (k_bits & ~1u) : 20u));
    last->Y += diff;
    c.last_Y_diff_median5[(m << 1) | gps_flag].add(diff);
    I32 cY = diff - median;

    // Z
    I32 cZ = 0;
    if (ch_z) {
      k_bits = (c.ic_dX.getK() + c.ic_dY.getK()) / 2;
      I32 pred = c.last_Z[l];
      I32 Z = c.ic_Z.decompress(
          pred, (n == 1 ? 1u : 0u) + (k_bits < 18 ? (k_bits & ~1u) : 18u));
      cZ = Z - pred;
      last->Z = Z;
      c.last_Z[l] = Z;
    }

    // classification
    if (ch_cls) {
      U32 last_cls = last->classification;
      U32 ccc = ((last_cls & 0x1F) << 1) + (cpr == 3 ? 1 : 0);
      if (c.m_classification[ccc].symbols == 0) {
        c.m_classification[ccc].create(256, false);
        c.m_classification[ccc].init();
      }
      last->classification = (U8)dec_cls.decodeSymbol(c.m_classification[ccc]);
    }

    // flags
    if (ch_flags) {
      U32 last_flags = (U32(last->edge_of_flight_line) << 5) |
                       (U32(last->scan_direction_flag) << 4) |
                       last->classification_flags;
      if (c.m_flags[last_flags].symbols == 0) {
        c.m_flags[last_flags].create(64, false);
        c.m_flags[last_flags].init();
      }
      U32 flags = dec_flags.decodeSymbol(c.m_flags[last_flags]);
      last->edge_of_flight_line = (flags & (1 << 5)) ? 1 : 0;
      last->scan_direction_flag = (flags & (1 << 4)) ? 1 : 0;
      last->classification_flags = (U8)(flags & 0x0F);
    }

    // intensity
    if (ch_int) {
      U16 inten = (U16)c.ic_intensity.decompress(
          c.last_intensity[(cpr << 1) | gps_flag], cpr);
      c.last_intensity[(cpr << 1) | gps_flag] = inten;
      last->intensity = inten;
    }

    // scan angle
    if (ch_angle && scan_angle_change) {
      last->scan_angle = (I16)(U16)c.ic_scan_angle.decompress(
          (U16)last->scan_angle, gps_flag);
    }

    // user data
    if (ch_user) {
      U32 idx = last->user_data / 4;
      if (c.m_user_data[idx].symbols == 0) {
        c.m_user_data[idx].create(256, false);
        c.m_user_data[idx].init();
      }
      last->user_data = (U8)dec_user.decodeSymbol(c.m_user_data[idx]);
    }

    // point source
    if (ch_psrc && point_source_change) {
      last->point_source_ID =
          (U16)c.ic_point_source.decompress(last->point_source_ID, 0);
    }

    // gps time
    if (ch_gps && gps_time_change) {
      read_gps_time(c);
      last->gps_time_bits = c.last_gpstime[c.gt_last];
    }

    last->gps_time_change = gps_time_change;
    *out = *last;
    if (rec) {
      rec->flags = (U8)((fresh ? 2 : 0) | (gps_flag ? 4 : 0) | (ch_z ? 8 : 0));
      rec->ctx = (U8)current;
      rec->src_ctx = (U8)src;
      rec->n = (U8)n;
      rec->r = (U8)r;
      rec->sc = last->scanner_channel;
      rec->pad0 = rec->pad1 = 0;
      rec->cX = cX;
      rec->cY = cY;
      rec->cZ = cZ;
      rec->firstX = rec->firstY = rec->firstZ = 0;
    }
  }
};

// ---------------------------------------------------------------------------
// POINT14 v3 encoder (mirror of the decoder, for round-trip tests and for
// producing .laz fixtures; layer buffers are flushed per chunk)
// ---------------------------------------------------------------------------

struct CtxEnc {
  bool unused = true;
  bool created = false;
  Point14 last;
  StreamingMedian5 last_X_diff_median5[12];
  StreamingMedian5 last_Y_diff_median5[12];
  I32 last_Z[8];
  U16 last_intensity[8];
  SymModel m_changed_values[8];
  SymModel m_scanner_channel;
  SymModel m_number_of_returns[16];
  SymModel m_return_number[16];
  SymModel m_return_number_gps_same;
  IntCompressor ic_dX, ic_dY, ic_Z;
  SymModel m_classification[64];
  SymModel m_flags[64];
  SymModel m_user_data[64];
  IntCompressor ic_intensity, ic_scan_angle, ic_point_source;
  SymModel m_gpstime_multi, m_gpstime_0diff;
  IntCompressor ic_gpstime;
  U64 last_gpstime[4];
  I32 last_gpstime_diff[4];
  I32 multi_extreme_counter[4];
  U32 gt_last = 0, gt_next = 0;
};

struct Point14v3Enc {
  ByteOut lay_xy, lay_z, lay_cls, lay_flags, lay_int, lay_angle, lay_user,
      lay_psrc, lay_gps;
  Encoder enc_xy, enc_z, enc_cls, enc_flags, enc_int, enc_angle, enc_user,
      enc_psrc, enc_gps;
  // per-layer "has changes" trackers: layers with no changes in a chunk are
  // framed with num_bytes = 0 so the decoder skips them
  bool any_z, any_cls, any_flags, any_int, any_angle, any_user, any_psrc,
      any_gps;
  CtxEnc ctx[4];
  U32 current = 0;
  const U8 (*map6)[16];
  const U8 (*lvl8)[16];

  Point14v3Enc(const U8 (*m6)[16], const U8 (*l8)[16]) : map6(m6), lvl8(l8) {}
  U8 lvl(U32 n, U32 r) const { return lvl8 ? lvl8[n][r] : level8(n, r); }

  void create_models(CtxEnc& c) {
    if (c.created) return;
    for (int i = 0; i < 8; i++) c.m_changed_values[i].create(128, true);
    c.m_scanner_channel.create(3, true);
    c.m_return_number_gps_same.create(13, true);
    c.ic_dX.setup(&enc_xy, 32, 2);
    c.ic_dY.setup(&enc_xy, 32, 22);
    c.ic_Z.setup(&enc_z, 32, 20);
    c.ic_intensity.setup(&enc_int, 16, 4);
    c.ic_scan_angle.setup(&enc_angle, 16, 2);
    c.ic_point_source.setup(&enc_psrc, 16, 1);
    c.m_gpstime_multi.create(GPSTIME_MULTI_TOTAL, true);
    c.m_gpstime_0diff.create(6, true);
    c.ic_gpstime.setup(&enc_gps, 32, 9);
    c.created = true;
  }

  void init_ctx(U32 which, const Point14& item) {
    CtxEnc& c = ctx[which];
    create_models(c);
    for (int i = 0; i < 8; i++) c.m_changed_values[i].init();
    c.m_scanner_channel.init();
    for (int i = 0; i < 16; i++) {
      if (c.m_number_of_returns[i].symbols) c.m_number_of_returns[i].init();
      if (c.m_return_number[i].symbols) c.m_return_number[i].init();
    }
    c.m_return_number_gps_same.init();
    c.ic_dX.initCompressor();
    c.ic_dY.initCompressor();
    c.ic_Z.initCompressor();
    for (int i = 0; i < 64; i++) {
      if (c.m_classification[i].symbols) c.m_classification[i].init();
      if (c.m_flags[i].symbols) c.m_flags[i].init();
      if (c.m_user_data[i].symbols) c.m_user_data[i].init();
    }
    c.ic_intensity.initCompressor();
    c.ic_scan_angle.initCompressor();
    c.ic_point_source.initCompressor();
    c.m_gpstime_multi.init();
    c.m_gpstime_0diff.init();
    c.ic_gpstime.initCompressor();
    for (int i = 0; i < 12; i++) {
      c.last_X_diff_median5[i].init();
      c.last_Y_diff_median5[i].init();
    }
    c.last = item;
    c.last.gps_time_change = false;
    for (int i = 0; i < 8; i++) c.last_Z[i] = item.Z;
    for (int i = 0; i < 8; i++) c.last_intensity[i] = item.intensity;
    c.last_gpstime[0] = item.gps_time_bits;
    c.last_gpstime[1] = c.last_gpstime[2] = c.last_gpstime[3] = 0;
    for (int i = 0; i < 4; i++) {
      c.last_gpstime_diff[i] = 0;
      c.multi_extreme_counter[i] = 0;
    }
    c.gt_last = c.gt_next = 0;
    c.unused = false;
  }

  void init_chunk(const Point14& first) {
    lay_xy.buf.clear();
    lay_z.buf.clear();
    lay_cls.buf.clear();
    lay_flags.buf.clear();
    lay_int.buf.clear();
    lay_angle.buf.clear();
    lay_user.buf.clear();
    lay_psrc.buf.clear();
    lay_gps.buf.clear();
    enc_xy.init(&lay_xy);
    enc_z.init(&lay_z);
    enc_cls.init(&lay_cls);
    enc_flags.init(&lay_flags);
    enc_int.init(&lay_int);
    enc_angle.init(&lay_angle);
    enc_user.init(&lay_user);
    enc_psrc.init(&lay_psrc);
    enc_gps.init(&lay_gps);
    any_z = any_cls = any_flags = any_int = any_angle = any_user = any_psrc =
        any_gps = false;
    for (int i = 0; i < 4; i++) ctx[i].unused = true;
    current = first.scanner_channel;
    init_ctx(current, first);
  }

  void write_gps_time(CtxEnc& c, U64 gps_bits) {
    // mirrors LASzip GPSTIME11 v2 write logic
    if (c.last_gpstime_diff[c.gt_last] == 0) {
      if (gps_bits == c.last_gpstime[c.gt_last]) {
        enc_gps.encodeSymbol(c.m_gpstime_0diff, 0);
        return;
      }
      I64 curr_diff64 = (I64)gps_bits - (I64)c.last_gpstime[c.gt_last];
      I32 curr_diff = (I32)curr_diff64;
      if ((I64)curr_diff == curr_diff64) {
        enc_gps.encodeSymbol(c.m_gpstime_0diff, 1);
        c.ic_gpstime.compress(0, curr_diff, 0);
        c.last_gpstime_diff[c.gt_last] = curr_diff;
        c.last_gpstime[c.gt_last] = gps_bits;
        c.multi_extreme_counter[c.gt_last] = 0;
        return;
      }
      // look whether another sequence matches
      for (U32 i = 1; i < 4; i++) {
        U32 other = (c.gt_last + i) & 3;
        I64 od = (I64)gps_bits - (I64)c.last_gpstime[other];
        if ((I64)(I32)od == od) {
          enc_gps.encodeSymbol(c.m_gpstime_0diff, i + 2);
          c.gt_last = other;
          write_gps_time(c, gps_bits);
          return;
        }
      }
      enc_gps.encodeSymbol(c.m_gpstime_0diff, 2);
      c.ic_gpstime.compress((I32)(c.last_gpstime[c.gt_last] >> 32),
                            (I32)(gps_bits >> 32), 8);
      enc_gps.writeInt((U32)gps_bits);
      c.gt_next = (c.gt_next + 1) & 3;
      c.gt_last = c.gt_next;
      c.last_gpstime[c.gt_last] = gps_bits;
      c.last_gpstime_diff[c.gt_last] = 0;
      c.multi_extreme_counter[c.gt_last] = 0;
      return;
    }
    // last diff nonzero
    if (gps_bits == c.last_gpstime[c.gt_last]) {
      // same as last: multi = UNCHANGED
      enc_gps.encodeSymbol(c.m_gpstime_multi, (U32)GPSTIME_MULTI_UNCHANGED);
      return;
    }
    I64 curr_diff64 = (I64)gps_bits - (I64)c.last_gpstime[c.gt_last];
    I32 curr_diff = (I32)curr_diff64;
    if ((I64)curr_diff == curr_diff64) {
      // compute multiplier between current and last int difference
      F64 mf = (F64)curr_diff / (F64)c.last_gpstime_diff[c.gt_last];
      I32 multi = (I32)(mf + (mf >= 0 ? 0.5 : -0.5));
      if (multi == 1) {
        enc_gps.encodeSymbol(c.m_gpstime_multi, 1);
        c.ic_gpstime.compress(c.last_gpstime_diff[c.gt_last], curr_diff, 1);
        c.multi_extreme_counter[c.gt_last] = 0;
      } else if (multi > 0) {
        if (multi < GPSTIME_MULTI) {
          enc_gps.encodeSymbol(c.m_gpstime_multi, (U32)multi);
          if (multi < 10)
            c.ic_gpstime.compress(multi * c.last_gpstime_diff[c.gt_last],
                                  curr_diff, 2);
          else
            c.ic_gpstime.compress(multi * c.last_gpstime_diff[c.gt_last],
                                  curr_diff, 3);
        } else {
          enc_gps.encodeSymbol(c.m_gpstime_multi, (U32)GPSTIME_MULTI);
          c.ic_gpstime.compress(GPSTIME_MULTI * c.last_gpstime_diff[c.gt_last],
                                curr_diff, 4);
          c.multi_extreme_counter[c.gt_last]++;
          if (c.multi_extreme_counter[c.gt_last] > 3) {
            c.last_gpstime_diff[c.gt_last] = curr_diff;
            c.multi_extreme_counter[c.gt_last] = 0;
          }
        }
      } else if (multi < 0) {
        if (multi > GPSTIME_MULTI_MINUS) {
          enc_gps.encodeSymbol(c.m_gpstime_multi, (U32)(GPSTIME_MULTI - multi));
          c.ic_gpstime.compress(multi * c.last_gpstime_diff[c.gt_last],
                                curr_diff, 5);
        } else {
          enc_gps.encodeSymbol(c.m_gpstime_multi,
                               (U32)(GPSTIME_MULTI - GPSTIME_MULTI_MINUS));
          c.ic_gpstime.compress(
              GPSTIME_MULTI_MINUS * c.last_gpstime_diff[c.gt_last], curr_diff,
              6);
          c.multi_extreme_counter[c.gt_last]++;
          if (c.multi_extreme_counter[c.gt_last] > 3) {
            c.last_gpstime_diff[c.gt_last] = curr_diff;
            c.multi_extreme_counter[c.gt_last] = 0;
          }
        }
      } else {  // multi == 0
        enc_gps.encodeSymbol(c.m_gpstime_multi, 0);
        c.ic_gpstime.compress(0, curr_diff, 7);
        c.multi_extreme_counter[c.gt_last]++;
        if (c.multi_extreme_counter[c.gt_last] > 3) {
          c.last_gpstime_diff[c.gt_last] = curr_diff;
          c.multi_extreme_counter[c.gt_last] = 0;
        }
      }
      c.last_gpstime[c.gt_last] = gps_bits;
      return;
    }
    // difference too big: look for other sequence
    for (U32 i = 1; i < 4; i++) {
      U32 other = (c.gt_last + i) & 3;
      I64 od = (I64)gps_bits - (I64)c.last_gpstime[other];
      if ((I64)(I32)od == od) {
        enc_gps.encodeSymbol(c.m_gpstime_multi,
                             (U32)(GPSTIME_MULTI_CODE_FULL + i));
        c.gt_last = other;
        write_gps_time(c, gps_bits);
        return;
      }
    }
    enc_gps.encodeSymbol(c.m_gpstime_multi, (U32)GPSTIME_MULTI_CODE_FULL);
    c.ic_gpstime.compress((I32)(c.last_gpstime[c.gt_last] >> 32),
                          (I32)(gps_bits >> 32), 8);
    enc_gps.writeInt((U32)gps_bits);
    c.gt_next = (c.gt_next + 1) & 3;
    c.gt_last = c.gt_next;
    c.last_gpstime[c.gt_last] = gps_bits;
    c.last_gpstime_diff[c.gt_last] = 0;
    c.multi_extreme_counter[c.gt_last] = 0;
  }

  void write(const Point14& cur) {
    Point14* last = &ctx[current].last;
    U32 lpr = (last->return_number == 1 ? 1u : 0u);
    lpr += (last->return_number >= last->number_of_returns ? 2u : 0u);
    lpr += (last->gps_time_change ? 4u : 0u);

    bool scanner_channel_change = cur.scanner_channel != last->scanner_channel;
    // compare against target channel's context once switched
    CtxEnc* tc = &ctx[current];
    bool fresh = false;
    if (scanner_channel_change && ctx[cur.scanner_channel].unused) fresh = true;
    const Point14* cmp = fresh ? last : &ctx[cur.scanner_channel].last;
    if (!scanner_channel_change) cmp = last;

    bool point_source_change = cur.point_source_ID != cmp->point_source_ID;
    bool gps_time_change = cur.gps_time_bits != cmp->gps_time_bits;
    bool scan_angle_change = cur.scan_angle != cmp->scan_angle;
    U32 last_n = cmp->number_of_returns;
    U32 last_r = cmp->return_number;
    U32 n = cur.number_of_returns;
    U32 r = cur.return_number;

    U32 changed_values = ((scanner_channel_change ? 1u : 0u) << 6) |
                         ((point_source_change ? 1u : 0u) << 5) |
                         ((gps_time_change ? 1u : 0u) << 4) |
                         ((scan_angle_change ? 1u : 0u) << 3) |
                         ((n != last_n ? 1u : 0u) << 2);
    if (r != last_r) {
      if (r == ((last_r + 1) % 16))
        changed_values |= 1;
      else if (r == ((last_r + 15) % 16))
        changed_values |= 2;
      else
        changed_values |= 3;
    }
    enc_xy.encodeSymbol(ctx[current].m_changed_values[lpr], changed_values);

    if (changed_values & (1u << 6)) {
      U32 diff = (cur.scanner_channel - current + 4 - 1) % 4;
      enc_xy.encodeSymbol(ctx[current].m_scanner_channel, diff);
      U32 sc = cur.scanner_channel;
      if (ctx[sc].unused) init_ctx(sc, ctx[current].last);
      current = sc;
      last = &ctx[current].last;
      last->scanner_channel = (U8)sc;
      last_n = last->number_of_returns;
      last_r = last->return_number;
    }
    tc = &ctx[current];

    if (changed_values & (1u << 2)) {
      if (tc->m_number_of_returns[last_n].symbols == 0) {
        tc->m_number_of_returns[last_n].create(16, true);
        tc->m_number_of_returns[last_n].init();
      }
      enc_xy.encodeSymbol(tc->m_number_of_returns[last_n], n);
      last->number_of_returns = (U8)n;
    }
    if ((changed_values & 3) == 3) {
      if (gps_time_change) {
        if (tc->m_return_number[last_r].symbols == 0) {
          tc->m_return_number[last_r].create(16, true);
          tc->m_return_number[last_r].init();
        }
        enc_xy.encodeSymbol(tc->m_return_number[last_r], r);
      } else {
        U32 sym = (r + 16 - last_r - 2) % 16;
        enc_xy.encodeSymbol(tc->m_return_number_gps_same, sym);
      }
    }
    last->return_number = (U8)r;

    U32 m = map6[n][r];
    U32 l = lvl(n, r);
    U32 cpr = (r == 1 ? 2u : 0u) + (r >= n ? 1u : 0u);
    U32 gps_flag = gps_time_change ? 1u : 0u;

    // X
    I32 median = tc->last_X_diff_median5[(m << 1) | gps_flag].get();
    I32 diff = cur.X - last->X;
    tc->ic_dX.compress(median, diff, n == 1 ? 1 : 0);
    tc->last_X_diff_median5[(m << 1) | gps_flag].add(diff);
    last->X = cur.X;

    // Y
    median = tc->last_Y_diff_median5[(m << 1) | gps_flag].get();
    U32 k_bits = tc->ic_dX.getK();
    diff = cur.Y - last->Y;
    tc->ic_dY.compress(median, diff,
                       (n == 1 ? 1u : 0u) + (k_bits < 20 ? (k_bits & ~1u) : 20u));
    tc->last_Y_diff_median5[(m << 1) | gps_flag].add(diff);
    last->Y = cur.Y;

    // Z
    k_bits = (tc->ic_dX.getK() + tc->ic_dY.getK()) / 2;
    tc->ic_Z.compress(tc->last_Z[l], cur.Z,
                      (n == 1 ? 1u : 0u) + (k_bits < 18 ? (k_bits & ~1u) : 18u));
    if (cur.Z != tc->last_Z[l]) any_z = true;
    any_z = true;  // Z layer always written (simplest correct framing)
    tc->last_Z[l] = cur.Z;
    last->Z = cur.Z;

    // classification
    {
      U32 last_cls = last->classification;
      U32 ccc = ((last_cls & 0x1F) << 1) + (cpr == 3 ? 1 : 0);
      if (tc->m_classification[ccc].symbols == 0) {
        tc->m_classification[ccc].create(256, true);
        tc->m_classification[ccc].init();
      }
      enc_cls.encodeSymbol(tc->m_classification[ccc], cur.classification);
      any_cls = true;
      last->classification = cur.classification;
    }

    // flags
    {
      U32 last_flags = (U32(last->edge_of_flight_line) << 5) |
                       (U32(last->scan_direction_flag) << 4) |
                       last->classification_flags;
      U32 flags = (U32(cur.edge_of_flight_line) << 5) |
                  (U32(cur.scan_direction_flag) << 4) |
                  cur.classification_flags;
      if (tc->m_flags[last_flags].symbols == 0) {
        tc->m_flags[last_flags].create(64, true);
        tc->m_flags[last_flags].init();
      }
      enc_flags.encodeSymbol(tc->m_flags[last_flags], flags);
      any_flags = true;
      last->edge_of_flight_line = cur.edge_of_flight_line;
      last->scan_direction_flag = cur.scan_direction_flag;
      last->classification_flags = cur.classification_flags;
    }

    // intensity
    {
      tc->ic_intensity.compress(tc->last_intensity[(cpr << 1) | gps_flag],
                                cur.intensity, cpr);
      tc->last_intensity[(cpr << 1) | gps_flag] = cur.intensity;
      any_int = true;
      last->intensity = cur.intensity;
    }

    // scan angle
    if (scan_angle_change) {
      tc->ic_scan_angle.compress((U16)last->scan_angle, (U16)cur.scan_angle,
                                 gps_flag);
      any_angle = true;
      last->scan_angle = cur.scan_angle;
    }

    // user data
    {
      U32 idx = last->user_data / 4;
      if (tc->m_user_data[idx].symbols == 0) {
        tc->m_user_data[idx].create(256, true);
        tc->m_user_data[idx].init();
      }
      enc_user.encodeSymbol(tc->m_user_data[idx], cur.user_data);
      any_user = true;
      last->user_data = cur.user_data;
    }

    // point source
    if (point_source_change) {
      tc->ic_point_source.compress(last->point_source_ID, cur.point_source_ID,
                                   0);
      any_psrc = true;
      last->point_source_ID = cur.point_source_ID;
    }

    // gps time
    if (gps_time_change) {
      write_gps_time(*tc, cur.gps_time_bits);
      any_gps = true;
      last->gps_time_bits = cur.gps_time_bits;
    }
    last->gps_time_change = gps_time_change;
  }

  // finalize chunk: write [count][9 x u32 sizes][layer bytes] to out
  void flush_chunk(ByteOut& out, U32 count) {
    enc_xy.done();
    enc_z.done();
    enc_cls.done();
    enc_flags.done();
    enc_int.done();
    enc_angle.done();
    enc_user.done();
    enc_psrc.done();
    enc_gps.done();
    U32 sizes[9] = {
        (U32)lay_xy.size(),
        any_z ? (U32)lay_z.size() : 0,
        any_cls ? (U32)lay_cls.size() : 0,
        any_flags ? (U32)lay_flags.size() : 0,
        any_int ? (U32)lay_int.size() : 0,
        any_angle ? (U32)lay_angle.size() : 0,
        any_user ? (U32)lay_user.size() : 0,
        any_psrc ? (U32)lay_psrc.size() : 0,
        any_gps ? (U32)lay_gps.size() : 0,
    };
    out.put32(count);
    for (int i = 0; i < 9; i++) out.put32(sizes[i]);
    if (sizes[0]) out.putBytes(lay_xy.buf.data(), sizes[0]);
    if (sizes[1]) out.putBytes(lay_z.buf.data(), sizes[1]);
    if (sizes[2]) out.putBytes(lay_cls.buf.data(), sizes[2]);
    if (sizes[3]) out.putBytes(lay_flags.buf.data(), sizes[3]);
    if (sizes[4]) out.putBytes(lay_int.buf.data(), sizes[4]);
    if (sizes[5]) out.putBytes(lay_angle.buf.data(), sizes[5]);
    if (sizes[6]) out.putBytes(lay_user.buf.data(), sizes[6]);
    if (sizes[7]) out.putBytes(lay_psrc.buf.data(), sizes[7]);
    if (sizes[8]) out.putBytes(lay_gps.buf.data(), sizes[8]);
  }
};

// ---------------------------------------------------------------------------
// file-level framing: LAS 1.4 header, LASzip VLR, chunked point data
// ---------------------------------------------------------------------------

static thread_local std::string g_err;

struct LazHeader {
  U8 pfmt = 0;
  U16 rec_len = 0;
  U32 pdo = 0;       // point data offset
  U32 nvlr = 0;
  U16 hdr_size = 0;
  I64 npts = 0;
  F64 scale[3] = {0.001, 0.001, 0.001};
  F64 offset[3] = {0, 0, 0};
  F64 mins[3] = {0, 0, 0}, maxs[3] = {0, 0, 0};
  // laszip VLR
  bool has_laszip = false;
  U16 compressor = 0;
  U32 chunk_size = 0;
  U16 item_type = 0, item_size = 0, item_version = 0;
  U16 num_items = 0;
};

static bool parse_header(const U8* b, I64 len, LazHeader* h) {
  if (len < 375 || memcmp(b, "LASF", 4) != 0) {
    g_err = "not a LAS/LAZ file";
    return false;
  }
  U8 vmaj = b[24], vmin = b[25];
  memcpy(&h->hdr_size, b + 94, 2);
  memcpy(&h->pdo, b + 96, 4);
  memcpy(&h->nvlr, b + 100, 4);
  h->pfmt = b[104];
  memcpy(&h->rec_len, b + 105, 2);
  U32 n_legacy;
  memcpy(&n_legacy, b + 107, 4);
  memcpy(h->scale, b + 131, 24);
  memcpy(h->offset, b + 155, 24);
  F64 bb[6];
  memcpy(bb, b + 179, 48);
  h->maxs[0] = bb[0]; h->mins[0] = bb[1];
  h->maxs[1] = bb[2]; h->mins[1] = bb[3];
  h->maxs[2] = bb[4]; h->mins[2] = bb[5];
  h->npts = n_legacy;
  if (vmaj == 1 && vmin >= 4 && h->hdr_size >= 375) {
    U64 n14;
    memcpy(&n14, b + 247, 8);
    if (n14) h->npts = (I64)n14;
  }
  // walk VLRs for the laszip record (user_id "laszip encoded", id 22204)
  I64 off = h->hdr_size;
  for (U32 i = 0; i < h->nvlr && off + 54 <= len; i++) {
    char uid[17] = {0};
    memcpy(uid, b + off + 2, 16);
    U16 rid, rlen;
    memcpy(&rid, b + off + 18, 2);
    memcpy(&rlen, b + off + 20, 2);
    if (rid == 22204 && strcmp(uid, "laszip encoded") == 0 && rlen >= 34) {
      const U8* d = b + off + 54;
      memcpy(&h->compressor, d, 2);
      memcpy(&h->chunk_size, d + 12, 4);
      memcpy(&h->num_items, d + 32, 2);
      if (h->num_items >= 1) {
        memcpy(&h->item_type, d + 34, 2);
        memcpy(&h->item_size, d + 36, 2);
        memcpy(&h->item_version, d + 38, 2);
      }
      h->has_laszip = true;
    }
    off += 54 + rlen;
  }
  return true;
}

extern "C" {

const char* p3laz_last_error() { return g_err.c_str(); }

I64 p3laz_npoints(const U8* buf, I64 len) {
  LazHeader h;
  if (!parse_header(buf, len, &h)) return -1;
  return h.npts;
}

// Decode a COPC/LAZ (or uncompressed LAS) point-format-6+ file.
// Any output pointer may be NULL. rec (32 B/point) is the table-recovery
// dump. Returns number of points decoded, or -1 (p3laz_last_error()).
I64 p3laz_read_points(const U8* buf, I64 len, const U8* map6_in,
                      const U8* lvl8_in, F64* xyz, F64* gps, U16* intensity,
                      U8* rn, U8* cls, U8* rec_out, I64 cap) {
  LazHeader h;
  if (!parse_header(buf, len, &h)) return -1;
  U8 fmt = h.pfmt & 0x3F;
  const U8(*map6)[16] =
      map6_in ? reinterpret_cast<const U8(*)[16]>(map6_in) : DEFAULT_MAP6;
  const U8(*lvl8)[16] =
      lvl8_in ? reinterpret_cast<const U8(*)[16]>(lvl8_in) : nullptr;
  if (h.npts > cap) {
    g_err = "output capacity too small";
    return -1;
  }
  auto emit = [&](I64 i, const Point14& p) {
    if (xyz) {
      xyz[3 * i + 0] = p.X * h.scale[0] + h.offset[0];
      xyz[3 * i + 1] = p.Y * h.scale[1] + h.offset[1];
      xyz[3 * i + 2] = p.Z * h.scale[2] + h.offset[2];
    }
    if (gps) memcpy(&gps[i], &p.gps_time_bits, 8);
    if (intensity) intensity[i] = p.intensity;
    if (rn) rn[i] = (U8)((p.return_number & 0x0F) | (p.number_of_returns << 4));
    if (cls) cls[i] = p.classification;
  };

  if (!(h.pfmt & 0x80) && !h.has_laszip) {
    // uncompressed LAS: read raw records
    if (fmt < 6 || h.rec_len < 30) {
      g_err = "unsupported uncompressed point format (need >= 6)";
      return -1;
    }
    ByteIn in(buf + h.pdo, len - h.pdo);
    std::vector<U8> wire(h.rec_len);
    for (I64 i = 0; i < h.npts; i++) {
      in.getBytes(wire.data(), h.rec_len);
      Point14 p;
      point14_from_wire(wire.data(), &p);
      emit(i, p);
    }
    return h.npts;
  }

  if (!h.has_laszip) {
    g_err = "compressed flag set but no laszip VLR";
    return -1;
  }
  if (h.compressor != 3) {
    g_err = "unsupported LASzip compressor (only 3 = layered chunked; "
            "point formats 0-5 use compressor 2 which this reader does not "
            "implement)";
    return -1;
  }
  if (h.num_items != 1 || h.item_type != 10 || h.item_version != 3 ||
      h.item_size != 30) {
    g_err = "unsupported LASzip item layout (need single POINT14 v3, 30 B; "
            "extra-bytes/RGB items not yet supported)";
    return -1;
  }

  // chunk stream starts after the i64 chunk-table offset
  ByteIn in(buf + h.pdo, len - h.pdo);
  (void)in.get64();  // chunk table offset (framing is self-describing)

  Point14v3Dec dec(map6, lvl8);
  std::vector<U8> wire(30);
  I64 i = 0;
  while (i < h.npts) {
    // raw first point of chunk
    in.getBytes(wire.data(), 30);
    Point14 first;
    point14_from_wire(wire.data(), &first);
    U32 count = in.get32();
    dec.chunk_sizes(in);
    dec.init_chunk(in, first);
    emit(i, first);
    if (rec_out) {
      RecRecord r{};
      r.flags = (U8)(1 | (dec.ch_z ? 8 : 0));
      r.ctx = r.src_ctx = r.sc = first.scanner_channel;
      r.n = first.number_of_returns;
      r.r = first.return_number;
      r.firstX = first.X;
      r.firstY = first.Y;
      r.firstZ = first.Z;
      memcpy(rec_out + 32 * i, &r, 32);
    }
    i++;
    if (count == 0 || count > (U32)(h.npts - i + 1)) {
      // defensive: fall back to remaining count (corrupt framing)
      count = (U32)(h.npts - i + 1);
    }
    for (U32 j = 1; j < count && i < h.npts; j++, i++) {
      Point14 p;
      RecRecord r{};
      dec.read(&p, rec_out ? &r : nullptr);
      emit(i, p);
      if (rec_out) memcpy(rec_out + 32 * i, &r, 32);
    }
  }
  return i;
}

// Encode points to a LAZ file (LAS 1.4, point format 6, POINT14 v3 layered).
// XYZ are raw int32 grid coords; gps/intensity/rn/cls may be NULL.
// Returns bytes written, or -(bytes needed) if outcap too small, or 0 on error.
I64 p3laz_write_points(const I32* XYZ, const U16* intensity, const U8* rn,
                       const U8* cls, const F64* gps, I64 n,
                       const F64* scale3, const F64* offset3, U32 chunk_size,
                       const U8* map6_in, const U8* lvl8_in, U8* out,
                       I64 outcap) {
  if (n <= 0 || chunk_size == 0) {
    g_err = "need n > 0 and chunk_size > 0";
    return 0;
  }
  const U8(*map6)[16] =
      map6_in ? reinterpret_cast<const U8(*)[16]>(map6_in) : DEFAULT_MAP6;
  const U8(*lvl8)[16] =
      lvl8_in ? reinterpret_cast<const U8(*)[16]>(lvl8_in) : nullptr;

  auto make_point = [&](I64 i) {
    Point14 p;
    p.X = XYZ[3 * i + 0];
    p.Y = XYZ[3 * i + 1];
    p.Z = XYZ[3 * i + 2];
    if (intensity) p.intensity = intensity[i];
    if (rn) {
      p.return_number = rn[i] & 0x0F;
      p.number_of_returns = (rn[i] >> 4) & 0x0F;
    } else {
      p.return_number = 1;
      p.number_of_returns = 1;
    }
    if (cls) p.classification = cls[i];
    if (gps) memcpy(&p.gps_time_bits, &gps[i], 8);
    return p;
  };

  ByteOut f;
  // --- LAS 1.4 header (375 bytes) ---
  std::vector<U8> hdr(375, 0);
  memcpy(hdr.data(), "LASF", 4);
  hdr[24] = 1;
  hdr[25] = 4;
  const char* sysid = "P3TPU LAZ WRITER";
  memcpy(hdr.data() + 26, sysid, strlen(sysid));
  memcpy(hdr.data() + 58, sysid, strlen(sysid));
  U16 hdr_size = 375;
  memcpy(hdr.data() + 94, &hdr_size, 2);
  U32 pdo = 375 + 54 + 40;  // header + one VLR (laszip)
  memcpy(hdr.data() + 96, &pdo, 4);
  U32 nvlr = 1;
  memcpy(hdr.data() + 100, &nvlr, 4);
  hdr[104] = 6 | 0x80;  // point format 6, compressed
  U16 rec_len = 30;
  memcpy(hdr.data() + 105, &rec_len, 2);
  memcpy(hdr.data() + 131, scale3, 24);
  memcpy(hdr.data() + 155, offset3, 24);
  F64 mins[3] = {1e300, 1e300, 1e300}, maxs[3] = {-1e300, -1e300, -1e300};
  for (I64 i = 0; i < n; i++)
    for (int d = 0; d < 3; d++) {
      F64 v = XYZ[3 * i + d] * scale3[d] + offset3[d];
      if (v < mins[d]) mins[d] = v;
      if (v > maxs[d]) maxs[d] = v;
    }
  F64 bb[6] = {maxs[0], mins[0], maxs[1], mins[1], maxs[2], mins[2]};
  memcpy(hdr.data() + 179, bb, 48);
  U64 n14 = (U64)n;
  memcpy(hdr.data() + 247, &n14, 8);
  // returns histogram (first return slot only, best effort)
  f.putBytes(hdr.data(), 375);

  // --- laszip VLR ---
  std::vector<U8> vlr(54 + 40, 0);
  const char* uid = "laszip encoded";
  memcpy(vlr.data() + 2, uid, strlen(uid));
  U16 rid = 22204, rlen = 40;
  memcpy(vlr.data() + 18, &rid, 2);
  memcpy(vlr.data() + 20, &rlen, 2);
  const char* desc = "p3tpu laszip variant";
  memcpy(vlr.data() + 22, desc, strlen(desc));
  U8* d = vlr.data() + 54;
  U16 compressor = 3, coder = 0;
  memcpy(d, &compressor, 2);
  memcpy(d + 2, &coder, 2);
  d[4] = 3;  // version major
  d[5] = 4;  // version minor
  U16 rev = 3;
  memcpy(d + 6, &rev, 2);
  // options u32 = 0; chunk size:
  memcpy(d + 12, &chunk_size, 4);
  I64 minus1 = -1;
  memcpy(d + 16, &minus1, 8);  // number of special evlrs
  memcpy(d + 24, &minus1, 8);  // offset of special evlrs
  U16 nitems = 1;
  memcpy(d + 32, &nitems, 2);
  U16 itype = 10, isize = 30, iver = 3;
  memcpy(d + 34, &itype, 2);
  memcpy(d + 36, &isize, 2);
  memcpy(d + 38, &iver, 2);
  f.putBytes(vlr.data(), vlr.size());

  // --- point data: chunk table offset placeholder + chunks ---
  I64 table_off_pos = f.size();
  f.put64((U64)-1);
  Point14v3Enc enc(map6, lvl8);
  std::vector<I64> chunk_bytes;
  I64 i = 0;
  while (i < n) {
    I64 chunk_start = f.size();
    U32 count = (U32)((n - i) < (I64)chunk_size ? (n - i) : chunk_size);
    Point14 first = make_point(i);
    U8 wire[30];
    point14_to_wire(&first, wire);
    f.putBytes(wire, 30);
    enc.init_chunk(first);
    i++;
    for (U32 j = 1; j < count; j++, i++) enc.write(make_point(i));
    enc.flush_chunk(f, count);
    chunk_bytes.push_back(f.size() - chunk_start);
  }
  // --- chunk table ---
  U64 table_pos = (U64)f.size();
  f.put32(0);  // version
  f.put32((U32)chunk_bytes.size());
  {
    Encoder e;
    e.init(&f);
    IntCompressor ic;
    ic.setup(&e, 32, 2);
    ic.initCompressor();
    for (size_t k = 0; k < chunk_bytes.size(); k++) {
      ic.compress(k ? (I32)chunk_bytes[k - 1] : 0, (I32)chunk_bytes[k], 1);
    }
    e.done();
  }
  memcpy(f.buf.data() + table_off_pos, &table_pos, 8);

  if ((I64)f.size() > outcap) return -(I64)f.size();
  memcpy(out, f.buf.data(), f.size());
  return (I64)f.size();
}

}  // extern "C"
