// CSR lookup-table build, native host implementation.
//
// Same semantics as gblastn_tpu/lut/builder.py::build_lookup_table
// (reference behavior: BlastLookupIndexQueryExactMatches,
// /root/reference/c++/src/algo/blast/core/blast_lookup.c:84, unified
// CSR layout instead of the reference's three table kinds): within
// every unmasked location of length >= word_size, every start whose
// w-mer is ambiguity-free is indexed; positions ascend within a word.
//
// Layout strategy: one rolling pass collects (code, start) pairs, then
// an LSD radix sort (12-bit digits, 4096 buckets -- the bucket tables
// stay cache-resident) orders them by code; a final sequential walk
// emits positions/pos_words and the dense 4^w+1 prefix table. This
// avoids the two random-access passes over a 4^w-sized count/cursor
// table (64 MB at w=12) that a direct counting sort needs.
//
// C API (ctypes):
//   gblastn_lut_build(buf, n, locs, n_locs, word_size, w,
//                     offsets[4^w+1], positions[pos_cap],
//                     pos_words[pos_cap], pos_cap,
//                     out[2] = {n_positions, max_chain}) -> 0 ok,
//                     -1 = pos_cap too small (out[0] = needed).
// pos_words[i] is the word code of positions[i] (codes ascend across
// the output; positions ascend within a code because the radix sort is
// stable and the collection pass scans ascending).

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int kRadixBits = 12;
constexpr int kRadix = 1 << kRadixBits;

struct Pair {
    int32_t code;
    int32_t pos;
};

// Stable LSD counting pass on one 12-bit digit.
void radix_pass(const Pair* src, Pair* dst, int64_t n, int shift) {
    int32_t counts[kRadix];
    std::memset(counts, 0, sizeof(counts));
    for (int64_t i = 0; i < n; ++i)
        ++counts[(src[i].code >> shift) & (kRadix - 1)];
    int32_t sum = 0;
    for (int d = 0; d < kRadix; ++d) {
        int32_t c = counts[d];
        counts[d] = sum;
        sum += c;
    }
    for (int64_t i = 0; i < n; ++i)
        dst[counts[(src[i].code >> shift) & (kRadix - 1)]++] = src[i];
}

}  // namespace

extern "C" int gblastn_lut_build(
    const uint8_t* buf, int64_t n, const int64_t* locs, int64_t n_locs,
    int64_t word_size, int64_t w, int32_t* offsets, int32_t* positions,
    int32_t* pos_words, int64_t pos_cap, int64_t* out) {
    const int64_t table_size = (int64_t)1 << (2 * w);
    const uint32_t mask = (uint32_t)(table_size - 1);

    // pass 1: rolling scan, collect (code, start) pairs
    std::vector<Pair> pairs;
    pairs.reserve((size_t)(n > 0 ? n : 1));
    for (int64_t li = 0; li < n_locs; ++li) {
        int64_t a = locs[2 * li], b = locs[2 * li + 1];
        if (word_size > b - a + 1) continue;
        int64_t lim = b - w + 1;
        uint32_t code = 0;
        int64_t bad = 0;  // positions until the last ambiguity leaves
        for (int64_t p = a; p <= b; ++p) {
            uint8_t c = buf[p];
            code = ((code << 2) | (c & 3)) & mask;
            bad = (c < 4) ? (bad > 0 ? bad - 1 : 0) : w;
            int64_t start = p - w + 1;
            if (start >= a && start <= lim && bad == 0)
                pairs.push_back({(int32_t)code, (int32_t)start});
        }
    }
    const int64_t n_positions = (int64_t)pairs.size();
    out[0] = n_positions;
    if (n_positions > pos_cap) return -1;

    // LSD radix sort by code (stable => positions ascend within code)
    const int code_bits = (int)(2 * w);
    std::vector<Pair> scratch(pairs.size());
    Pair* src = pairs.data();
    Pair* dst = scratch.data();
    for (int shift = 0; shift < code_bits; shift += kRadixBits) {
        radix_pass(src, dst, n_positions, shift);
        Pair* t = src;
        src = dst;
        dst = t;
    }

    // emit CSR: sorted pairs -> positions/pos_words + dense prefix table
    int32_t max_chain = 0;
    int64_t prev_code = -1;
    int64_t run = 0;
    offsets[0] = 0;
    for (int64_t i = 0; i < n_positions; ++i) {
        int32_t code = src[i].code;
        if (code != prev_code) {
            if (run > max_chain) max_chain = (int32_t)run;
            // close out every table slot in (prev_code, code]
            for (int64_t x = prev_code + 1; x <= code; ++x)
                offsets[x] = (int32_t)i;
            prev_code = code;
            run = 0;
        }
        positions[i] = src[i].pos;
        pos_words[i] = code;
        ++run;
    }
    if (run > max_chain) max_chain = (int32_t)run;
    for (int64_t x = prev_code + 1; x <= table_size; ++x)
        offsets[x] = (int32_t)n_positions;
    out[1] = max_chain;
    return 0;
}
