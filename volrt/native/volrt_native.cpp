// Native runtime components of volrt (C ABI, loaded via ctypes).
//
// The reference framework's loader is native C++ (Stefan Roettger's ddsbase,
// reference: VolumeRendering/ddsbase.cpp); this is the TPU framework's native
// equivalent, implemented from the format description derived in
// volrt/io/pvm.py (not a copy of the reference code):
//
//   DDS container body (after the 8-byte magic): big-endian MSB-first
//   bitstream of [2 bits skip-1] [16 bits strip-1] then groups of
//   [7-bit count][3-bit width-code][count x width-bit residuals] until a
//   zero count. Width code b means b+1 bits when b >= 1 else 0 bits. Each
//   residual decodes to value - 2^bits/2; bytes reconstruct with a
//   first-order predictor for the first strip+1 bytes and a second-order
//   strip predictor afterwards (mod 256); finally the byte stream is
//   de-interleaved with period `skip` (v3e: in chunks of skip * 2^24).
//
// Also provides the ESL min/max block-grid build (the host hot loop of
// reference RaycasterBase.cpp:94-125) for large volumes.
//
// Build: g++ -O3 -shared -fPIC -o libvolrt_native.so volrt_native.cpp

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

class BitReader {
 public:
  BitReader(const uint8_t* data, int64_t n) : data_(data), nbits_(n * 8) {}

  // Read up to 24 bits MSB-first.
  inline uint32_t read(int bits) {
    uint32_t v = 0;
    for (int i = 0; i < bits; ++i) {
      v = (v << 1) | bit(pos_ + i);
    }
    pos_ += bits;
    return v;
  }

  inline void skip(int64_t bits) { pos_ += bits; }
  inline int64_t pos() const { return pos_; }
  inline int64_t nbits() const { return nbits_; }

  inline uint32_t bit(int64_t p) const {
    if (p >= nbits_) return 0;
    return (data_[p >> 3] >> (7 - (p & 7))) & 1u;
  }

  // Fast extraction of a <=8-bit value at an arbitrary bit offset.
  inline uint32_t extract(int64_t p, int bits) const {
    int64_t byte0 = p >> 3;
    int bit_in = static_cast<int>(p & 7);
    uint32_t word = 0;
    for (int i = 0; i < 2; ++i) {
      uint32_t b = (byte0 + i) * 8 < nbits_ ? data_[byte0 + i] : 0;
      word = (word << 8) | b;
    }
    int shift = 16 - bit_in - bits;
    return (word >> shift) & ((1u << bits) - 1u);
  }

 private:
  const uint8_t* data_;
  int64_t nbits_;
  int64_t pos_ = 0;
};

inline int width_code(int code) { return code >= 1 ? code + 1 : code; }

void deinterleave_chunk(const uint8_t* in, uint8_t* out, int64_t n,
                        int skip) {
  int64_t src = 0;
  for (int i = 0; i < skip; ++i) {
    for (int64_t j = i; j < n; j += skip) {
      out[j] = in[src++];
    }
  }
}

}  // namespace

extern "C" {

// Decode a DDS body (bytes after the magic). Writes up to out_cap bytes;
// sets *n_out to the true decoded size. Returns:
//   0 = ok; 1 = output buffer too small (*n_out holds required size);
//   2 = corrupt stream.
int volrt_dds_decode(const uint8_t* in, int64_t n_in, int block,
                     uint8_t* out, int64_t out_cap, int64_t* n_out) {
  BitReader br(in, n_in);
  int skip = static_cast<int>(br.read(2)) + 1;
  int64_t strip = static_cast<int64_t>(br.read(16)) + 1;

  // Pass 1: count total output bytes.
  struct Group {
    int64_t start;
    int32_t count;
    int32_t width;
  };
  std::vector<Group> groups;
  int64_t total = 0;
  while (true) {
    uint32_t cnt = br.read(7);
    if (cnt == 0) break;
    int w = width_code(static_cast<int>(br.read(3)));
    groups.push_back({br.pos(), static_cast<int32_t>(cnt), w});
    br.skip(static_cast<int64_t>(cnt) * w);
    total += cnt;
    if (br.pos() > br.nbits() + 32) return 2;
  }
  *n_out = total;
  if (total > out_cap) return 1;
  if (total == 0) return 0;

  // Pass 2+3: residual extraction + predictor reconstruction (mod 256).
  std::vector<uint8_t> flat(total);
  int64_t idx = 0;
  uint32_t act = 0;  // running predictor accumulator
  for (const Group& g : groups) {
    int64_t p = g.start;
    int bits = g.width;
    int32_t half = bits ? (1 << bits) / 2 : 0;
    for (int32_t i = 0; i < g.count; ++i, ++idx) {
      int32_t delta =
          static_cast<int32_t>(bits ? br.extract(p, bits) : 0) - half;
      p += bits;
      if (strip == 1 || idx <= strip) {
        act = static_cast<uint32_t>(
            static_cast<int32_t>(act) + delta);
      } else {
        act = static_cast<uint32_t>(
            static_cast<int32_t>(act) + delta +
            static_cast<int32_t>(flat[idx - strip]) -
            static_cast<int32_t>(flat[idx - strip - 1]));
      }
      flat[idx] = static_cast<uint8_t>(act & 255u);
    }
  }

  // Pass 4: de-interleave with period `skip`.
  if (skip <= 1) {
    std::memcpy(out, flat.data(), total);
  } else if (block == 0) {
    deinterleave_chunk(flat.data(), out, total, skip);
  } else {
    int64_t chunk = static_cast<int64_t>(skip) * block;
    for (int64_t start = 0; start < total; start += chunk) {
      int64_t len = total - start < chunk ? total - start : chunk;
      deinterleave_chunk(flat.data() + start, out + start, len, skip);
    }
  }
  return 0;
}

// ESL min/max block grid over a uint8 volume (z-major (d, h, w)).
// min_out/max_out are dense (gd, gh, gw) grids with gd=ceil(d/block) etc.
// Mirrors the semantics of the reference's host scan
// (reference: RaycasterBase.cpp:101-117) without the 32^3 padding.
int volrt_esl_minmax(const uint8_t* vol, int64_t d, int64_t h, int64_t w,
                     int64_t block, uint8_t* min_out, uint8_t* max_out) {
  if (block <= 0) return 2;
  int64_t gd = (d + block - 1) / block;
  int64_t gh = (h + block - 1) / block;
  int64_t gw = (w + block - 1) / block;
  int64_t gn = gd * gh * gw;
  std::memset(min_out, 255, gn);
  std::memset(max_out, 0, gn);
  for (int64_t z = 0; z < d; ++z) {
    int64_t gz = z / block;
    for (int64_t y = 0; y < h; ++y) {
      int64_t gy = y / block;
      const uint8_t* row = vol + (z * h + y) * w;
      int64_t gbase = (gz * gh + gy) * gw;
      for (int64_t x = 0; x < w; ++x) {
        uint8_t v = row[x];
        int64_t gi = gbase + x / block;
        if (v < min_out[gi]) min_out[gi] = v;
        if (v > max_out[gi]) max_out[gi] = v;
      }
    }
  }
  return 0;
}

// Histogram of a uint8 volume (256 bins) — the loader-side stat the
// reference computes per volume (reference: ModelBase.cpp:19-33).
int volrt_histogram(const uint8_t* vol, int64_t n, int64_t* bins) {
  std::memset(bins, 0, 256 * sizeof(int64_t));
  for (int64_t i = 0; i < n; ++i) bins[vol[i]]++;
  return 0;
}

int volrt_native_abi_version(void) { return 1; }

}  // extern "C"
