// Native host-side audio pipeline kernels (C++, ctypes ABI).
//
// Role: the reference leans on torchaudio's C++ decoders inside DataLoader
// worker processes (blvm/data/loaders.py:48). This host has one CPU core and
// threads instead of workers, so the decode + µ-law + frame-stack path is
// implemented here as tight vectorizable loops callable via ctypes with the
// GIL released (numpy buffers in, numpy buffers out).
//
// Build: g++ -O3 -march=native -shared -fPIC audio_native.cpp -o libaudio_native.so

#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" {

// int16 little-endian PCM -> float32 in [-1, 1)
void decode_pcm16(const int16_t* in, int64_t n, float* out) {
    constexpr float scale = 1.0f / 32768.0f;
    for (int64_t i = 0; i < n; ++i) {
        out[i] = static_cast<float>(in[i]) * scale;
    }
}

// Continuous µ-law companding: sign(x) * log1p(mu*|x|) / log1p(mu)
void mu_law_encode(const float* in, int64_t n, float mu, float* out) {
    const float inv_log1p_mu = 1.0f / std::log1p(mu);
    for (int64_t i = 0; i < n; ++i) {
        const float x = in[i];
        const float a = std::fabs(x);
        const float y = std::log1p(mu * a) * inv_log1p_mu;
        out[i] = x < 0.0f ? -y : y;
    }
}

// Inverse companding: sign(y) * (exp(|y| * log1p(mu)) - 1) / mu
void mu_law_decode(const float* in, int64_t n, float mu, float* out) {
    const float log1p_mu = std::log1p(mu);
    const float inv_mu = 1.0f / mu;
    for (int64_t i = 0; i < n; ++i) {
        const float y = in[i];
        const float a = std::fabs(y);
        const float x = (std::exp(a * log1p_mu) - 1.0f) * inv_mu;
        out[i] = y < 0.0f ? -x : x;
    }
}

// Fused decode + µ-law: the hot path of every audio example load.
void decode_pcm16_mu_law(const int16_t* in, int64_t n, float mu, float* out) {
    constexpr float scale = 1.0f / 32768.0f;
    const float inv_log1p_mu = 1.0f / std::log1p(mu);
    for (int64_t i = 0; i < n; ++i) {
        const float x = static_cast<float>(in[i]) * scale;
        const float a = std::fabs(x);
        const float y = std::log1p(mu * a) * inv_log1p_mu;
        out[i] = x < 0.0f ? -y : y;
    }
}

// Right-zero-padded frame stacking: (T,) -> (ceil(T/s), s)
void stack_frames(const float* in, int64_t n, int64_t stack, float* out) {
    const int64_t n_stacks = (n + stack - 1) / stack;
    const int64_t total = n_stacks * stack;
    std::memcpy(out, in, sizeof(float) * n);
    if (total > n) {
        std::memset(out + n, 0, sizeof(float) * (total - n));
    }
}

}  // extern "C"
