// hostio: native host-side frame I/O helpers for phaneron_tpu.
//
// The reference's performance-critical host work lived in C++ N-API
// modules (nodencl staging, beamcoder decode buffers — SURVEY.md §2.6).
// In the TPU build, device math is XLA/Pallas; this library covers the
// host half: packed-format byte shuffling used by producers/consumers
// before/after DMA, PCM audio conversion, and a single-producer/
// single-consumer staging ring for decode->device pipelining.
//
// C ABI only (loaded via ctypes). Build: see native/build.py.

#include <atomic>
#include <cstdint>
#include <cstring>

extern "C" {

// --- v210 word-plane (de)interleave -----------------------------------
// Splitting each line's 4-word groups into four word planes turns the
// device-side unpack into pure lane-aligned elementwise ops (no
// cross-lane shuffles on the VPU).

void v210_deinterleave(const uint32_t* in, uint32_t* out,
                       int64_t rows, int64_t groups_per_row) {
    const int64_t plane = rows * groups_per_row;
    for (int64_t r = 0; r < rows; ++r) {
        const uint32_t* src = in + r * groups_per_row * 4;
        uint32_t* d0 = out + 0 * plane + r * groups_per_row;
        uint32_t* d1 = out + 1 * plane + r * groups_per_row;
        uint32_t* d2 = out + 2 * plane + r * groups_per_row;
        uint32_t* d3 = out + 3 * plane + r * groups_per_row;
        for (int64_t g = 0; g < groups_per_row; ++g) {
            d0[g] = src[4 * g + 0];
            d1[g] = src[4 * g + 1];
            d2[g] = src[4 * g + 2];
            d3[g] = src[4 * g + 3];
        }
    }
}

void v210_interleave(const uint32_t* in, uint32_t* out,
                     int64_t rows, int64_t groups_per_row) {
    const int64_t plane = rows * groups_per_row;
    for (int64_t r = 0; r < rows; ++r) {
        uint32_t* dst = out + r * groups_per_row * 4;
        const uint32_t* s0 = in + 0 * plane + r * groups_per_row;
        const uint32_t* s1 = in + 1 * plane + r * groups_per_row;
        const uint32_t* s2 = in + 2 * plane + r * groups_per_row;
        const uint32_t* s3 = in + 3 * plane + r * groups_per_row;
        for (int64_t g = 0; g < groups_per_row; ++g) {
            dst[4 * g + 0] = s0[g];
            dst[4 * g + 1] = s1[g];
            dst[4 * g + 2] = s2[g];
            dst[4 * g + 3] = s3[g];
        }
    }
}

// --- semi-planar chroma (de)interleave (nv12) --------------------------

void uv_deinterleave(const uint8_t* in, uint8_t* u, uint8_t* v, int64_t n) {
    for (int64_t i = 0; i < n; ++i) {
        u[i] = in[2 * i];
        v[i] = in[2 * i + 1];
    }
}

void uv_interleave(const uint8_t* u, const uint8_t* v, uint8_t* out, int64_t n) {
    for (int64_t i = 0; i < n; ++i) {
        out[2 * i] = u[i];
        out[2 * i + 1] = v[i];
    }
}

// --- PCM conversions (macadamConsumer.ts:135-158 equivalents) ----------

void pcm_f32_planar_to_s32_interleaved(const float* in, int32_t* out,
                                       int64_t channels, int64_t samples) {
    for (int64_t s = 0; s < samples; ++s) {
        for (int64_t c = 0; c < channels; ++c) {
            float v = in[c * samples + s];
            if (v > 1.0f) v = 1.0f;
            if (v < -1.0f) v = -1.0f;
            double scaled = (double)v * 2147483647.0;
            out[s * channels + c] = (int32_t)scaled;
        }
    }
}

void pcm_s32_interleaved_to_f32_planar(const int32_t* in, float* out,
                                       int64_t channels, int64_t samples) {
    const double inv = 1.0 / 2147483648.0;
    for (int64_t s = 0; s < samples; ++s) {
        for (int64_t c = 0; c < channels; ++c) {
            out[c * samples + s] = (float)(in[s * channels + c] * inv);
        }
    }
}

// --- SPSC staging ring --------------------------------------------------
// Fixed-slot ring for decode->device staging: the decode thread writes
// frame N+1 while the dispatch thread uploads frame N (the reference's
// queue.load overlap, SURVEY.md §2.7 P1).

struct Ring {
    uint8_t* data;
    int64_t slot_bytes;
    int64_t slots;
    std::atomic<int64_t> head;  // next write
    std::atomic<int64_t> tail;  // next read
};

void* ring_create(int64_t slot_bytes, int64_t slots) {
    Ring* r = new Ring();
    r->data = new uint8_t[slot_bytes * slots];
    r->slot_bytes = slot_bytes;
    r->slots = slots;
    r->head.store(0);
    r->tail.store(0);
    return r;
}

void ring_destroy(void* rp) {
    Ring* r = (Ring*)rp;
    delete[] r->data;
    delete r;
}

// returns slot pointer for writing, or null when full
uint8_t* ring_acquire_write(void* rp) {
    Ring* r = (Ring*)rp;
    int64_t h = r->head.load(std::memory_order_relaxed);
    if (h - r->tail.load(std::memory_order_acquire) >= r->slots) return nullptr;
    return r->data + (h % r->slots) * r->slot_bytes;
}

void ring_commit_write(void* rp) {
    Ring* r = (Ring*)rp;
    r->head.fetch_add(1, std::memory_order_release);
}

// returns slot pointer for reading, or null when empty
uint8_t* ring_acquire_read(void* rp) {
    Ring* r = (Ring*)rp;
    int64_t t = r->tail.load(std::memory_order_relaxed);
    if (r->head.load(std::memory_order_acquire) - t <= 0) return nullptr;
    return r->data + (t % r->slots) * r->slot_bytes;
}

void ring_commit_read(void* rp) {
    Ring* r = (Ring*)rp;
    r->tail.fetch_add(1, std::memory_order_release);
}

int64_t ring_size(void* rp) {
    Ring* r = (Ring*)rp;
    return r->head.load() - r->tail.load();
}

}  // extern "C"
