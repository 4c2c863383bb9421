// Native host-side audio runtime: polyphase sinc resampling + PCM
// conversion hot loops.
//
// The reference's equivalents live in native code too (AVAudioConverter
// behind resampleAudio, AudioUtils.swift:130, and the mic-format converter
// behind PCMStreamConverter.swift:24); the TPU build keeps the *model* math
// on-device but the host-side streaming frontend benefits from the same
// treatment: the polyphase inner product below is the per-chunk cost of
// every real-time mic/decoder stream.
//
// Build: g++ -O3 -shared -fPIC (see tpu_audio/native/__init__.py, which
// compiles lazily and falls back to the pure-NumPy path when no compiler
// is available).

#include <cstdint>
#include <cstring>

extern "C" {

// out[m * new_r + j] = dot(buf[start0 + m*orig_r .. +k_taps], kernel[j])
// kernel is [new_r, k_taps] row-major. Frames are guaranteed in-bounds by
// the caller (same precondition as the NumPy fancy-index gather).
void ta_polyphase(const float* buf, int64_t start0, int32_t orig_r,
                  const float* kernel, int32_t new_r, int32_t k_taps,
                  int64_t n_frames, float* out) {
    for (int64_t m = 0; m < n_frames; ++m) {
        const float* frame = buf + start0 + m * orig_r;
        float* dst = out + m * new_r;
        for (int32_t j = 0; j < new_r; ++j) {
            const float* krow = kernel + (int64_t)j * k_taps;
            float acc0 = 0.f, acc1 = 0.f, acc2 = 0.f, acc3 = 0.f;
            int32_t t = 0;
            for (; t + 4 <= k_taps; t += 4) {
                acc0 += frame[t] * krow[t];
                acc1 += frame[t + 1] * krow[t + 1];
                acc2 += frame[t + 2] * krow[t + 2];
                acc3 += frame[t + 3] * krow[t + 3];
            }
            float acc = (acc0 + acc1) + (acc2 + acc3);
            for (; t < k_taps; ++t) acc += frame[t] * krow[t];
            dst[j] = acc;
        }
    }
}

void ta_pcm16_to_f32(const int16_t* in, int64_t n, float* out) {
    const float s = 1.0f / 32768.0f;
    for (int64_t i = 0; i < n; ++i) out[i] = (float)in[i] * s;
}

void ta_f32_to_pcm16(const float* in, int64_t n, int16_t* out) {
    for (int64_t i = 0; i < n; ++i) {
        float v = in[i];
        if (v > 1.0f) v = 1.0f;
        if (v < -1.0f) v = -1.0f;
        float scaled = v * 32767.0f;
        out[i] = (int16_t)(scaled >= 0.0f ? scaled + 0.5f : scaled - 0.5f);
    }
}

// interleaved [n_frames, channels] -> mono mean
void ta_mix_to_mono(const float* in, int64_t n_frames, int32_t channels,
                    float* out) {
    const float inv = 1.0f / (float)channels;
    for (int64_t i = 0; i < n_frames; ++i) {
        float acc = 0.f;
        const float* row = in + i * channels;
        for (int32_t c = 0; c < channels; ++c) acc += row[c];
        out[i] = acc * inv;
    }
}

}  // extern "C"
