// Native host-side codec: 40-bit complex pack/unpack, wire-format (de)serialization,
// and the streaming accumulate loop — the compiled specification of the reference CPU
// path (Compression/CompressHelper.cpp:224-389 semantics; OutputStreams/
// IndexOutputStream.cpp:397-450 accumulate order), written fresh against the bit-format
// spec in kwave_tpu/bitpack.py.
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this image). All functions operate
// on caller-owned buffers; layouts match kwave_tpu.oracle:
//   SoA planes: header uint8[n], mr uint16[n], mi uint16[n]
//   wire:       5 bytes per coefficient [hdr, mr_lo, mr_hi, mi_lo, mi_hi]
//
// Build: kwave_tpu/native/build.py (g++ -O3 -march=native -fopenmp -shared -fPIC).

#include <cstdint>
#include <cstring>
#include <cmath>

extern "C" {

// ---------------------------------------------------------------------------
// 40-bit scalar codec
// ---------------------------------------------------------------------------

static inline void enc1(float re, float im, int e,
                        uint8_t* hdr, uint16_t* mr, uint16_t* mi) {
  uint32_t br, bi;
  std::memcpy(&br, &re, 4);
  std::memcpy(&bi, &im, 4);
  uint32_t sr = br >> 31, si = bi >> 31;
  int32_t ers = (int32_t)((br >> 23) & 0xFF) - e;
  int32_t eis = (int32_t)((bi >> 23) & 0xFF) - e;
  int32_t es = ers > eis ? ers : eis;
  uint32_t m_r = br & 0x007FFFFFu;
  uint32_t m_i = bi & 0x007FFFFFu;
  // uint8 shift counts with mod-256 wraparound (reference uses uint8_t locals)
  uint8_t rsr = (uint8_t)(6 + (eis > ers ? eis - ers : 0));
  uint8_t rsi = (uint8_t)(6 + (ers > eis ? ers - eis : 0));
  if (es < 0) {
    rsr = (uint8_t)(rsr - es);
    rsi = (uint8_t)(rsi - es);
    es = 0;
  }
  uint32_t sh_r = rsr > 23 ? 23u : rsr;
  uint32_t sh_i = rsi > 23 ? 23u : rsi;
  m_r >>= sh_r;
  m_i >>= sh_i;
  uint32_t max_r = 0x7FFFFFu >> sh_r, max_i = 0x7FFFFFu >> sh_i;
  if (m_r > 0 && m_r != max_r) m_r += 1;
  if (m_i > 0 && m_i != max_i) m_i += 1;
  m_r = (m_r | (1u << (23 - sh_r))) >> 1;
  m_i = (m_i | (1u << (23 - sh_i))) >> 1;
  if (es > 0xF) {  // exponent overflow: saturate
    m_r = 0xFFFFu;
    m_i = 0xFFFFu;
    es = 0xF;
  }
  *hdr = (uint8_t)((sr << 7) | (si << 6) | ((m_r & 0x10000u) >> 11) |
                   ((m_i & 0x10000u) >> 12) | ((uint32_t)es & 0xF));
  *mr = (uint16_t)(m_r & 0xFFFFu);
  *mi = (uint16_t)(m_i & 0xFFFFu);
}

static inline void dec1(uint8_t hdr, uint16_t mr, uint16_t mi, int e,
                        float* re, float* im) {
  uint32_t h = hdr;
  uint32_t m_r = ((h & 0x20u) << 11) | mr;
  uint32_t m_i = ((h & 0x10u) << 12) | mi;
  uint32_t sr = h >> 7, si = (h & 0x40u) >> 6;
  int32_t es = (int32_t)(h & 0xFu) + e;
  m_r <<= 6;
  m_i <<= 6;
  uint32_t outr = 0, outi = 0;
  if (m_r) {
    int idx = 31 - __builtin_clz(m_r);
    uint32_t mm = (m_r << (23 - idx)) & 0x7FFFFFu;
    int32_t ex = es - (22 - idx);
    outr = (sr << 31) | ((uint32_t)ex << 23) | mm;
  } else {
    outr = sr << 31;
  }
  if (m_i) {
    int idx = 31 - __builtin_clz(m_i);
    uint32_t mm = (m_i << (23 - idx)) & 0x7FFFFFu;
    int32_t ex = es - (22 - idx);
    outi = (si << 31) | ((uint32_t)ex << 23) | mm;
  } else {
    outi = si << 31;
  }
  std::memcpy(re, &outr, 4);
  std::memcpy(im, &outi, 4);
}

void kw_encode40(const float* re, const float* im, int64_t n, int e,
                 uint8_t* hdr, uint16_t* mr, uint16_t* mi) {
#pragma omp parallel for schedule(static)
  for (int64_t k = 0; k < n; k++) enc1(re[k], im[k], e, hdr + k, mr + k, mi + k);
}

void kw_decode40(const uint8_t* hdr, const uint16_t* mr, const uint16_t* mi,
                 int64_t n, int e, float* re, float* im) {
#pragma omp parallel for schedule(static)
  for (int64_t k = 0; k < n; k++) dec1(hdr[k], mr[k], mi[k], e, re + k, im + k);
}

// ---------------------------------------------------------------------------
// Wire format: SoA <-> interleaved 5-byte AoS
// ---------------------------------------------------------------------------

void kw_soa_to_bytes(const uint8_t* hdr, const uint16_t* mr, const uint16_t* mi,
                     int64_t n, uint8_t* out) {
#pragma omp parallel for schedule(static)
  for (int64_t k = 0; k < n; k++) {
    uint8_t* p = out + 5 * k;
    p[0] = hdr[k];
    p[1] = (uint8_t)(mr[k] & 0xFF);
    p[2] = (uint8_t)(mr[k] >> 8);
    p[3] = (uint8_t)(mi[k] & 0xFF);
    p[4] = (uint8_t)(mi[k] >> 8);
  }
}

void kw_bytes_to_soa(const uint8_t* in, int64_t n,
                     uint8_t* hdr, uint16_t* mr, uint16_t* mi) {
#pragma omp parallel for schedule(static)
  for (int64_t k = 0; k < n; k++) {
    const uint8_t* p = in + 5 * k;
    hdr[k] = p[0];
    mr[k] = (uint16_t)(p[1] | (p[2] << 8));
    mi[k] = (uint16_t)(p[3] | (p[4] << 8));
  }
}

// ---------------------------------------------------------------------------
// Streaming accumulate (one timestep, both staggered buffers)
// ---------------------------------------------------------------------------
//
// Float mode: buf{1,2} are interleaved complex rows, pH = sensor*H + h
// (IndexOutputStream.cpp:438-448). 40-bit mode: decode -> MAC -> encode per step
// (:411-437). tables bE/bE_1 are the CompressHelper layout [h*bSize + stepLocal].

void kw_accum_step_float(float* buf1, float* buf2, const float* x, int64_t n_sensors,
                         int n_harmonics, int64_t b_size, int64_t step_local,
                         const float* be_re, const float* be_im,
                         const float* be1_re, const float* be1_im, int mirror) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n_sensors; i++) {
    for (int h = 0; h < n_harmonics; h++) {
      const int64_t ph = 2 * (i * n_harmonics + h);
      const int64_t bi = h * b_size + step_local;
      buf1[ph] += be_re[bi] * x[i];
      buf1[ph + 1] += be_im[bi] * x[i];
      buf2[ph] += be1_re[bi] * x[i];
      buf2[ph + 1] += be1_im[bi] * x[i];
      if (mirror) {
        buf2[ph] += buf1[ph];
        buf2[ph + 1] += buf1[ph + 1];
      }
    }
  }
}

void kw_accum_step_40b(uint8_t* buf1, uint8_t* buf2, const float* x,
                       int64_t n_sensors, int n_harmonics, int64_t b_size,
                       int64_t step_local, const float* be_re, const float* be_im,
                       const float* be1_re, const float* be1_im, int e, int mirror) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n_sensors; i++) {
    for (int h = 0; h < n_harmonics; h++) {
      const int64_t ph = 5 * (i * n_harmonics + h);
      const int64_t bi = h * b_size + step_local;
      uint8_t h1 = buf1[ph];
      uint16_t r1 = (uint16_t)(buf1[ph + 1] | (buf1[ph + 2] << 8));
      uint16_t i1 = (uint16_t)(buf1[ph + 3] | (buf1[ph + 4] << 8));
      uint8_t h2 = buf2[ph];
      uint16_t r2 = (uint16_t)(buf2[ph + 1] | (buf2[ph + 2] << 8));
      uint16_t i2 = (uint16_t)(buf2[ph + 3] | (buf2[ph + 4] << 8));
      float c1r, c1i, c2r, c2i;
      dec1(h1, r1, i1, e, &c1r, &c1i);
      dec1(h2, r2, i2, e, &c2r, &c2i);
      c1r += be_re[bi] * x[i];
      c1i += be_im[bi] * x[i];
      c2r += be1_re[bi] * x[i];
      c2i += be1_im[bi] * x[i];
      enc1(c1r, c1i, e, &h1, &r1, &i1);
      if (mirror) {
        enc1(c2r + c1r, c2i + c1i, e, &h2, &r2, &i2);
      } else {
        enc1(c2r, c2i, e, &h2, &r2, &i2);
      }
      buf1[ph] = h1;
      buf1[ph + 1] = (uint8_t)(r1 & 0xFF);
      buf1[ph + 2] = (uint8_t)(r1 >> 8);
      buf1[ph + 3] = (uint8_t)(i1 & 0xFF);
      buf1[ph + 4] = (uint8_t)(i1 >> 8);
      buf2[ph] = h2;
      buf2[ph + 1] = (uint8_t)(r2 & 0xFF);
      buf2[ph + 2] = (uint8_t)(r2 >> 8);
      buf2[ph + 3] = (uint8_t)(i2 & 0xFF);
      buf2[ph + 4] = (uint8_t)(i2 >> 8);
    }
  }
}

}  // extern "C"
