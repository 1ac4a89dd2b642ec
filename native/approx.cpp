// Approximate nucleotide ungapped scoring, batched over seeds.
//
// Native twin of gblastn_tpu/engine/approx.py (the reference's
// s_NuclUngappedExtend approximate pass, na_ungapped.c:263): scores the
// bidirectional extension four bases at a time off the packed subject
// via a 256-entry XOR table, deciding whether the reference would have
// escalated the seed to exact rescoring.  The Python loop dominates
// dense-seed batches (tens of thousands of cutoff-passing seeds per
// 500-query batch); this runs the identical pointer walk in C++.
// Parity with the Python implementation is asserted in
// tests/test_native.py.
#include <cstdint>

extern "C" int64_t gblastn_approx_ungapped(
    const uint8_t* query, int64_t concat_end,
    const uint8_t* packed,
    const int32_t* table,          // int32[256]
    int64_t n,
    const int64_t* sub_start, const int64_t* sub_end,
    const int64_t* q_off, const int64_t* s_off,
    const int32_t* ctx,
    const int32_t* x_dropoffs,     // per-context raw X-drop
    const int64_t* reduced,        // per-context reduced cutoff
    const uint8_t* need,           // bool[n] seeds to evaluate
    uint8_t* demote,               // out bool[n]
    int64_t* a_score, int64_t* a_q, int64_t* a_s, int64_t* a_r)
{
    for (int64_t i = 0; i < n; ++i) {
        if (!need[i]) continue;
        const int c = ctx[i];
        const int64_t x_drop = x_dropoffs[c];
        const int64_t ss = sub_start[i], se = sub_end[i];
        // reference coords: relative to query->sequence = buffer - 1
        const int64_t q_ref = q_off[i] - 1;
        const int64_t s_loc = s_off[i] - ss;
        const int64_t adj = (4 - (s_loc & 3)) & 3;
        const int64_t q_ext = q_ref + adj;
        const int64_t s_ext = s_loc + adj;
        const int64_t sub_byte0 = ss >> 2;   // pad-aligned subjects

        int64_t score = 0, sum = 0;
        int64_t new_q = q_ext;
        const int64_t n_left = (q_ext < s_ext ? q_ext : s_ext) >> 2;
        const int64_t qb = q_ext + 1;        // buffer index of q_ext
        int64_t sb = sub_byte0 + (s_ext >> 2);
        for (int64_t k = 0; k < n_left; ++k) {
            const int s_byte = packed[sb - 1 - k];
            const int64_t base = qb - 4 * (k + 1);
            const int q_byte =
                ((query[base] << 6) | (query[base + 1] << 4) |
                 (query[base + 2] << 2) | query[base + 3]) & 0xFF;
            sum += table[q_byte ^ s_byte];
            if (sum > 0) {
                new_q = q_ext - 4 * (k + 1);
                score += sum;
                sum = 0;
            }
            if (sum < -x_drop) break;
        }
        const int64_t q_start = new_q;
        const int64_t s_start = s_ext - (q_ext - q_start);

        const int64_t qlen_ref = concat_end - 1;
        const int64_t slen = se - ss;
        sum = 0;
        new_q = q_ext;
        const int64_t nr_q = qlen_ref - q_ext, nr_s = slen - s_ext;
        const int64_t n_right = (nr_q < nr_s ? nr_q : nr_s) >> 2;
        sb = sub_byte0 + (s_ext >> 2);
        for (int64_t k = 0; k < n_right; ++k) {
            const int s_byte = packed[sb + k];
            const int64_t base = qb + 4 * k;
            const int q_byte =
                ((query[base] << 6) | (query[base + 1] << 4) |
                 (query[base + 2] << 2) | query[base + 3]) & 0xFF;
            sum += table[q_byte ^ s_byte];
            if (sum > 0) {
                new_q = q_ext + 4 * k + 3;
                score += sum;
                sum = 0;
            }
            if (sum < -x_drop) break;
        }
        a_score[i] = score;
        a_q[i] = q_start + 1;        // back to buffer coords
        a_s[i] = s_start + ss;       // back to global coords
        a_r[i] = new_q + 1;
        demote[i] = score < reduced[c] ? 1 : 0;
    }
    return 0;
}
