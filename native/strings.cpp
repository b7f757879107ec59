// Host-side native string kernels for the scan/ingest boundary.
//
// TPU-native equivalent of the reference's Rust string-ingest hot path:
// dictionary encoding at scan time is THE string strategy on TPU (the
// device only ever sees int32 codes + murmur3 word planes, SURVEY §7.4.5),
// so the per-row host work — hashing every string, building the code
// column, packing dictionary bytes into hash planes — must be native, not
// a Python loop. Callers hand in arrow-layout buffers (int32 offsets +
// contiguous UTF-8 data), which pyarrow produces from object arrays
// without Python iteration.
//
// Build: g++ -O3 -march=native -shared -fPIC strings.cpp -o libauronstrings.so

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// FNV-1a over a byte span (dictionary build only — NOT the Spark-visible
// hash; murmur3 parity lives in ops/hashing.py on device).
static inline uint64_t fnv1a(const uint8_t* p, int64_t n) {
    uint64_t h = 1469598103934665603ull;
    for (int64_t i = 0; i < n; ++i) {
        h ^= p[i];
        h *= 1099511628211ull;
    }
    return h;
}

// Dictionary-encode n strings given arrow buffers. Writes per-row
// first-seen codes into `codes` and the first-occurrence row index of each
// distinct value into `first_idx`. Returns the number of distinct values.
// `first_idx` must have room for n entries (worst case all distinct).
int64_t auron_dict_encode(const int32_t* offsets, const uint8_t* data,
                          int64_t n, int32_t* codes, int64_t* first_idx) {
    if (n <= 0) return 0;
    // open addressing, power-of-two capacity >= 2n
    int64_t cap = 16;
    while (cap < 2 * n) cap <<= 1;
    std::vector<int64_t> slots(cap, -1);  // -> dict id
    std::vector<int64_t> slot_row(cap, -1);
    int64_t n_dict = 0;
    const int64_t mask = cap - 1;
    for (int64_t i = 0; i < n; ++i) {
        const uint8_t* s = data + offsets[i];
        const int64_t len = offsets[i + 1] - offsets[i];
        uint64_t h = fnv1a(s, len);
        int64_t j = (int64_t)(h & (uint64_t)mask);
        for (;;) {
            int64_t id = slots[j];
            if (id < 0) {
                slots[j] = n_dict;
                slot_row[j] = i;
                first_idx[n_dict] = i;
                codes[i] = (int32_t)n_dict;
                ++n_dict;
                break;
            }
            const int64_t r = slot_row[j];
            const int64_t rlen = offsets[r + 1] - offsets[r];
            if (rlen == len &&
                std::memcmp(data + offsets[r], s, (size_t)len) == 0) {
                codes[i] = (int32_t)id;
                break;
            }
            j = (j + 1) & mask;
        }
    }
    return n_dict;
}

// Remap codes through a permutation table (sorted-dictionary fixup).
void auron_remap_codes(int32_t* codes, int64_t n, const int32_t* remap) {
    for (int64_t i = 0; i < n; ++i) codes[i] = remap[codes[i]];
}

// Pack n dictionary entries into little-endian u32 word planes + lengths
// for the device-side murmur3 (ops/hashing.py dictionary_byte_planes).
// words: [n x max_words] u32 zero-padded; lens: [n] int32.
void auron_byte_planes(const int32_t* offsets, const uint8_t* data,
                       int64_t n, int32_t max_words,
                       uint32_t* words, int32_t* lens) {
    for (int64_t i = 0; i < n; ++i) {
        const uint8_t* s = data + offsets[i];
        const int64_t len = offsets[i + 1] - offsets[i];
        lens[i] = (int32_t)len;
        uint32_t* out = words + i * max_words;
        int64_t full = len / 4;
        for (int64_t w = 0; w < full; ++w) {
            uint32_t v;
            std::memcpy(&v, s + w * 4, 4);  // LE hosts
            out[w] = v;
        }
        int64_t rem = len - full * 4;
        if (rem > 0 && full < max_words) {
            uint32_t v = 0;
            std::memcpy(&v, s + full * 4, (size_t)rem);
            out[full] = v;
        }
    }
}

}  // extern "C"
