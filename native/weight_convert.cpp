// Native weight-conversion kernels for the checkpoint streaming path.
//
// The reference's loader round-trips every tensor through torch for dtype
// conversion (weight_converter.py:383-414). Here the host-side work —
// bf16 -> f32 widening, fp8-E4M3 dequantization (w * scale), f32 -> bf16
// narrowing with round-to-nearest-even — runs as vectorizable C++ loops
// sharded across threads, feeding jax.device_put directly.
//
// Build: make -C native  (produces libweight_convert.so; loaded via ctypes
// with a numpy fallback when absent).

#include <cmath>
#include <cstddef>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

inline float bf16_bits_to_f32(uint16_t h) {
  uint32_t bits = static_cast<uint32_t>(h) << 16;
  float out;
  std::memcpy(&out, &bits, sizeof(out));
  return out;
}

inline uint16_t f32_to_bf16_bits(float f) {
  uint32_t bits;
  std::memcpy(&bits, &f, sizeof(bits));
  // NaN first: the round-to-nearest-even add below would carry a low-16-bit
  // NaN payload into the exponent and launder NaN into +/-Inf (ml_dtypes/
  // XLA preserve NaN — a corrupted weight must stay visibly NaN).
  if ((bits & 0x7F800000u) == 0x7F800000u && (bits & 0x007FFFFFu) != 0u) {
    return static_cast<uint16_t>((bits >> 16) | 0x0040u);  // quiet NaN
  }
  // Round to nearest even (matches XLA/ml_dtypes semantics for normals).
  uint32_t lsb = (bits >> 16) & 1u;
  uint32_t rounded = bits + 0x7FFFu + lsb;
  return static_cast<uint16_t>(rounded >> 16);
}

// fp8 E4M3FN: 1 sign, 4 exponent (bias 7), 3 mantissa; no inf, 0x7F/0xFF = NaN.
inline float fp8_e4m3_to_f32(uint8_t v) {
  uint32_t sign = (v >> 7) & 1u;
  uint32_t exp = (v >> 3) & 0xFu;
  uint32_t man = v & 0x7u;
  float result;
  if (exp == 0) {
    // Subnormal: man * 2^-9
    result = static_cast<float>(man) * 0.001953125f;  // 2^-9
  } else if (exp == 0xFu && man == 0x7u) {
    result = __builtin_nanf("");
  } else {
    int e = static_cast<int>(exp) - 7;
    float frac = 1.0f + static_cast<float>(man) / 8.0f;
    result = std::ldexp(frac, e);
  }
  return sign ? -result : result;
}

template <typename Fn>
void parallel_for(size_t n, size_t n_threads, Fn fn) {
  if (n_threads <= 1 || n < (1u << 20)) {
    fn(0, n);
    return;
  }
  std::vector<std::thread> threads;
  size_t chunk = (n + n_threads - 1) / n_threads;
  for (size_t t = 0; t < n_threads; ++t) {
    size_t begin = t * chunk;
    size_t end = begin + chunk < n ? begin + chunk : n;
    if (begin >= end) break;
    threads.emplace_back([=] { fn(begin, end); });
  }
  for (auto& th : threads) th.join();
}

size_t default_threads() {
  unsigned hw = std::thread::hardware_concurrency();
  return hw > 0 ? hw : 1;
}

}  // namespace

extern "C" {

void bf16_to_f32(const uint16_t* in, float* out, size_t n) {
  parallel_for(n, default_threads(), [&](size_t b, size_t e) {
    for (size_t i = b; i < e; ++i) out[i] = bf16_bits_to_f32(in[i]);
  });
}

void f32_to_bf16(const float* in, uint16_t* out, size_t n) {
  parallel_for(n, default_threads(), [&](size_t b, size_t e) {
    for (size_t i = b; i < e; ++i) out[i] = f32_to_bf16_bits(in[i]);
  });
}

void fp8_e4m3_dequant_f32(const uint8_t* in, float* out, size_t n, float scale) {
  parallel_for(n, default_threads(), [&](size_t b, size_t e) {
    for (size_t i = b; i < e; ++i) out[i] = fp8_e4m3_to_f32(in[i]) * scale;
  });
}

void fp8_e4m3_dequant_bf16(const uint8_t* in, uint16_t* out, size_t n, float scale) {
  parallel_for(n, default_threads(), [&](size_t b, size_t e) {
    for (size_t i = b; i < e; ++i)
      out[i] = f32_to_bf16_bits(fp8_e4m3_to_f32(in[i]) * scale);
  });
}

void bf16_to_bf16_copy(const uint16_t* in, uint16_t* out, size_t n) {
  std::memcpy(out, in, n * sizeof(uint16_t));
}

}  // extern "C"
