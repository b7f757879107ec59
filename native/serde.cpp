// Host-side native kernels for the block wire format.
//
// TPU-native equivalent of the reference's Rust serde/compression hot path
// (/root/reference/native-engine/datafusion-ext-commons/src/io/
// batch_serde.rs:30-66,273-307 byte-plane transposition;
// io/ipc_compression.rs zstd/lz4 block framing): the device data plane is
// XLA collectives, but host-boundary block bytes (DCN broadcast staging,
// host-RAM overflow tier, block caches) go through this library.
//
// Build: g++ -O3 -march=native -shared -fPIC serde.cpp -o libauronserde.so -lzstd

#include <cstdint>
#include <cstring>
#include <zstd.h>

extern "C" {

// Byte-plane transposition ("byte stream split"): [n x width] row-major
// bytes -> width planes of n bytes. Dramatically improves compression of
// fixed-width integer/decimal columns (same trick as batch_serde.rs:30-66).
void auron_transpose_bytes(const uint8_t* src, int64_t n, int32_t width,
                           uint8_t* dst) {
    for (int32_t w = 0; w < width; ++w) {
        uint8_t* out = dst + (int64_t)w * n;
        const uint8_t* in = src + w;
        for (int64_t i = 0; i < n; ++i) {
            out[i] = in[i * width];
        }
    }
}

void auron_untranspose_bytes(const uint8_t* src, int64_t n, int32_t width,
                             uint8_t* dst) {
    for (int32_t w = 0; w < width; ++w) {
        const uint8_t* in = src + (int64_t)w * n;
        uint8_t* out = dst + w;
        for (int64_t i = 0; i < n; ++i) {
            out[i * width] = in[i];
        }
    }
}

// Validity bitmaps: bool[n] <-> bit-packed (batch_serde.rs:193-215 analog).
void auron_pack_bits(const uint8_t* bools, int64_t n, uint8_t* bits) {
    int64_t nbytes = (n + 7) / 8;
    memset(bits, 0, nbytes);
    for (int64_t i = 0; i < n; ++i) {
        bits[i >> 3] |= (bools[i] != 0) << (i & 7);
    }
}

void auron_unpack_bits(const uint8_t* bits, int64_t n, uint8_t* bools) {
    for (int64_t i = 0; i < n; ++i) {
        bools[i] = (bits[i >> 3] >> (i & 7)) & 1;
    }
}

// zstd block codec.
int64_t auron_zstd_bound(int64_t src_size) {
    return (int64_t)ZSTD_compressBound((size_t)src_size);
}

int64_t auron_zstd_compress(const uint8_t* src, int64_t src_size,
                            uint8_t* dst, int64_t dst_cap, int32_t level) {
    size_t r = ZSTD_compress(dst, (size_t)dst_cap, src, (size_t)src_size,
                             level);
    if (ZSTD_isError(r)) return -1;
    return (int64_t)r;
}

int64_t auron_zstd_decompress(const uint8_t* src, int64_t src_size,
                              uint8_t* dst, int64_t dst_cap) {
    size_t r = ZSTD_decompress(dst, (size_t)dst_cap, src, (size_t)src_size);
    if (ZSTD_isError(r)) return -1;
    return (int64_t)r;
}

// Selection compaction on host rows (selection.rs take_batch analog) — used
// by the host staging tier to compact before compressing.
int64_t auron_compact_indices(const uint8_t* mask, int64_t n, int32_t* out) {
    int64_t k = 0;
    for (int64_t i = 0; i < n; ++i) {
        if (mask[i]) out[k++] = (int32_t)i;
    }
    return k;
}

}  // extern "C"
