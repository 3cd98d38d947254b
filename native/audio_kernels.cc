// Native host-side audio kernels for the vocoder_tpu input pipeline.
//
// The reference delegates its data-path native work to torchaudio/libsox
// (fish_vocoder/data/transforms/load.py:14-29); this library provides the
// TPU build's equivalent: a multithread-friendly, dependency-free C++ core
// for the decode/resample/normalize hot path, bound via ctypes
// (vocoder_tpu/data/native.py).  The Python numpy implementations remain as
// behaviour-identical fallbacks; parity between the two is tested.
//
// Build: make -C native   (produces libaudio_kernels.so)

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// PCM decode: interleaved integer PCM -> float32 planar (channels, frames).
// ---------------------------------------------------------------------------

void decode_pcm16(const int16_t* in, float* out, int64_t frames, int channels) {
  const float scale = 1.0f / 32768.0f;
  for (int c = 0; c < channels; ++c) {
    float* dst = out + (int64_t)c * frames;
    const int16_t* src = in + c;
    for (int64_t i = 0; i < frames; ++i) dst[i] = (float)src[i * channels] * scale;
  }
}

void decode_pcm24(const uint8_t* in, float* out, int64_t frames, int channels) {
  const float scale = 1.0f / 8388608.0f;
  for (int c = 0; c < channels; ++c) {
    float* dst = out + (int64_t)c * frames;
    for (int64_t i = 0; i < frames; ++i) {
      const uint8_t* p = in + 3 * (i * channels + c);
      int32_t v = (int32_t)p[0] | ((int32_t)p[1] << 8) | ((int32_t)p[2] << 16);
      v = (v << 8) >> 8;  // sign extend
      dst[i] = (float)v * scale;
    }
  }
}

void decode_pcm32(const int32_t* in, float* out, int64_t frames, int channels) {
  const float scale = 1.0f / 2147483648.0f;
  for (int c = 0; c < channels; ++c) {
    float* dst = out + (int64_t)c * frames;
    const int32_t* src = in + c;
    for (int64_t i = 0; i < frames; ++i) dst[i] = (float)src[i * channels] * scale;
  }
}

// ---------------------------------------------------------------------------
// Polyphase sinc resampler (same math as vocoder_tpu/data/resample.py, i.e.
// torchaudio.functional.resample semantics: sinc_interp_hann, width 6,
// rolloff 0.99).  The kernel table is computed by the Python side and passed
// in, so both paths share one filter design.
// ---------------------------------------------------------------------------

// x: (T,), kernels: (new_freq, taps), y: (ceil(new_freq*T/orig_freq),)
void resample_poly(const float* x, int64_t t, const float* kernels, int new_freq,
                   int orig_freq, int taps, int width, float* y, int64_t y_len) {
  // Virtual left pad of `width` zeros; right pad width + orig_freq.
  int64_t n_frames = (t + width + width + orig_freq - taps) / orig_freq + 1;
  int64_t out_idx = 0;
  for (int64_t f = 0; f < n_frames && out_idx < y_len; ++f) {
    int64_t base = f * orig_freq - width;  // position of tap 0 in x
    for (int j = 0; j < new_freq && out_idx < y_len; ++j) {
      const float* k = kernels + (int64_t)j * taps;
      float acc = 0.0f;
      int64_t lo = base < 0 ? -base : 0;
      int64_t hi = taps;
      if (base + hi > t) hi = t - base;
      for (int64_t i = lo; i < hi; ++i) acc += x[base + i] * k[i];
      y[out_idx++] = acc;
    }
  }
}

// ---------------------------------------------------------------------------
// Peak statistics + in-place normalisation (datasets/vocoder.py:39-40).
// ---------------------------------------------------------------------------

float peak_abs(const float* x, int64_t n) {
  float m = 0.0f;
  for (int64_t i = 0; i < n; ++i) {
    float a = std::fabs(x[i]);
    if (a > m) m = a;
  }
  return m;
}

void scale_inplace(float* x, int64_t n, float s) {
  for (int64_t i = 0; i < n; ++i) x[i] *= s;
}

}  // extern "C"
