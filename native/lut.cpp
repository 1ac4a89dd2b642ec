// CSR lookup-table build, native host implementation.
//
// Same semantics as gblastn_tpu/lut/builder.py::build_lookup_table
// (reference behavior: BlastLookupIndexQueryExactMatches,
// /root/reference/c++/src/algo/blast/core/blast_lookup.c:84, unified
// CSR layout instead of the reference's three table kinds): within
// every unmasked location of length >= word_size, every start whose
// w-mer is ambiguity-free is indexed; positions ascend within a word.
//
// C API (ctypes):
//   gblastn_lut_build(buf, n, locs, n_locs, word_size, w,
//                     offsets[4^w+1], positions[pos_cap], pos_cap,
//                     out[2] = {n_positions, max_chain}) -> 0 ok,
//                     -1 = pos_cap too small (out[0] = needed).

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" int gblastn_lut_build(
    const uint8_t* buf, int64_t n, const int64_t* locs, int64_t n_locs,
    int64_t word_size, int64_t w, int32_t* offsets, int32_t* positions,
    int64_t pos_cap, int64_t* out) {
    const int64_t table_size = (int64_t)1 << (2 * w);
    const uint32_t mask = (uint32_t)(table_size - 1);

    std::vector<int32_t> counts((size_t)table_size, 0);
    std::vector<int64_t> starts;  // valid (code, pos) stream per pass
    // pass 1: count
    int64_t n_positions = 0;
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
            if (start >= a && start <= lim && bad == 0) {
                ++counts[code];
                ++n_positions;
            }
        }
    }
    out[0] = n_positions;
    if (n_positions > pos_cap) return -1;

    // prefix sums
    offsets[0] = 0;
    int32_t max_chain = 0;
    for (int64_t x = 0; x < table_size; ++x) {
        offsets[x + 1] = offsets[x] + counts[x];
        if (counts[x] > max_chain) max_chain = counts[x];
    }
    // pass 2: scatter (ascending positions -> ascending within bucket)
    std::vector<int32_t> cursor(offsets, offsets + table_size);
    for (int64_t li = 0; li < n_locs; ++li) {
        int64_t a = locs[2 * li], b = locs[2 * li + 1];
        if (word_size > b - a + 1) continue;
        int64_t lim = b - w + 1;
        uint32_t code = 0;
        int64_t bad = 0;
        for (int64_t p = a; p <= b; ++p) {
            uint8_t c = buf[p];
            code = ((code << 2) | (c & 3)) & mask;
            bad = (c < 4) ? (bad > 0 ? bad - 1 : 0) : w;
            int64_t start = p - w + 1;
            if (start >= a && start <= lim && bad == 0)
                positions[cursor[code]++] = (int32_t)start;
        }
    }
    out[1] = max_chain;
    return 0;
}
