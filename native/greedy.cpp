// Native greedy gapped aligner (Zhang et al. 2000) — host hot path.
//
// Exact C++ counterpart of gblastn_tpu/gapped/greedy.py (which itself
// mirrors the reference semantics of
// /root/reference/c++/src/algo/blast/core/greedy_align.c — see the
// Python module for the semantic derivation and citations; this file is
// an independent implementation of the same recurrence, kept
// operation-for-operation equivalent to the Python oracle and verified
// against it by tests/test_native.py).
//
// Built as a shared library, driven through ctypes
// (gblastn_tpu/native/__init__.py).

#include <cstdint>
#include <cstring>
#include <cmath>
#include <vector>
#include <algorithm>

namespace {

constexpr int64_t GREEDY_MAX_COST = 10000;
constexpr int64_t GREEDY_MAX_COST_FRACTION = 2;
constexpr int64_t K_INVALID = -2;
constexpr int64_t K_INVALID_DIAG = 100000000;

constexpr int32_t OP_DEL = 0;  // gap in seq1/query (consumes seq2)
constexpr int32_t OP_SUB = 3;
constexpr int32_t OP_INS = 6;  // gap in seq2/subject (consumes seq1)

// run of matches starting at (i1, i2); out-of-range -> 0 (sentinel)
inline int64_t first_mismatch(const uint8_t* s1, int64_t len1,
                              const uint8_t* s2, int64_t len2,
                              int64_t i1, int64_t i2, bool reverse) {
    if (i1 >= len1 || i2 >= len2 || i1 < 0 || i2 < 0) return 0;
    int64_t n = 0;
    if (reverse) {
        const int64_t m = std::min(len1 - i1, len2 - i2);
        const uint8_t* a = s1 + len1 - 1 - i1;
        const uint8_t* b = s2 + len2 - 1 - i2;
        while (n < m && *a < 4 && *a == *b) { ++n; --a; --b; }
    } else {
        const int64_t m = std::min(len1 - i1, len2 - i2);
        const uint8_t* a = s1 + i1;
        const uint8_t* b = s2 + i2;
        while (n < m && *a < 4 && *a == *b) { ++n; ++a; ++b; }
    }
    return n;
}

// distance-indexed rows of per-diagonal offsets with explicit bases
struct Rows {
    int width;
    int keep;  // 0 = keep all (traceback)
    std::vector<std::vector<int64_t>> rows;
    std::vector<int64_t> bases;

    Rows(int w, int k) : width(w), keep(k) {}

    void alloc(int64_t d, int64_t lo, int64_t hi) {
        if ((int64_t)rows.size() <= d) {
            rows.resize(d + 1);
            bases.resize(d + 1, 0);
        }
        int64_t n = std::max<int64_t>(hi - lo + 1, 0);
        rows[d].assign((size_t)(n * width), K_INVALID);
        bases[d] = lo;
        if (keep && d - keep >= 0) {
            rows[d - keep].clear();
            rows[d - keep].shrink_to_fit();
        }
    }

    inline int64_t get(int64_t d, int64_t k, int slot = 0) const {
        if (d < 0 || d >= (int64_t)rows.size()) return K_INVALID;
        const auto& r = rows[d];
        int64_t i = k - bases[d];
        if (i < 0 || i * width + slot >= (int64_t)r.size()) return K_INVALID;
        return r[(size_t)(i * width + slot)];
    }

    inline void set(int64_t d, int64_t k, int64_t v, int slot = 0) {
        auto& r = rows[d];
        int64_t i = k - bases[d];
        if (i < 0 || i * width + slot >= (int64_t)r.size()) {
            // conservative growth (Python _Rows.set fallback)
            int64_t lo = std::min(bases[d], k - 2);
            int64_t old_n = (int64_t)r.size() / width;
            int64_t hi = std::max(bases[d] + old_n, k + 3);
            std::vector<int64_t> nr((size_t)((hi - lo) * width), K_INVALID);
            int64_t off = bases[d] - lo;
            std::copy(r.begin(), r.end(), nr.begin() + (size_t)(off * width));
            r.swap(nr);
            bases[d] = lo;
            i = k - lo;
        }
        r[(size_t)(i * width + slot)] = v;
    }
};

struct Out {
    int64_t score_or_dist;
    int64_t s1_align_len;
    int64_t s2_align_len;
    int64_t seed_q, seed_s, seed_len;
    int64_t n_ops;   // -1 on op-buffer overflow
};

struct OpsBuf {
    int32_t* types;
    int32_t* nums;
    int64_t cap;
    int64_t n = 0;
    bool overflow = false;

    void add(int32_t op, int64_t num) {
        if (num == 0) return;
        if (n > 0 && types[n - 1] == op) {
            nums[n - 1] += (int32_t)num;
            return;
        }
        if (n >= cap) { overflow = true; return; }
        types[n] = op;
        nums[n] = (int32_t)num;
        ++n;
    }
};

int64_t gcd64(int64_t a, int64_t b) { while (b) { int64_t t = a % b; a = b; b = t; } return a; }

void greedy_nonaffine(const uint8_t* s1, int64_t len1,
                      const uint8_t* s2, int64_t len2,
                      bool reverse, int64_t xdrop,
                      int64_t match_cost, int64_t mismatch_cost,
                      bool do_tb, OpsBuf* ops, Out* out) {
    int64_t best_dist = 0, best_diag = 0;
    const int64_t max_dist = std::min<int64_t>(
        GREEDY_MAX_COST, len2 / GREEDY_MAX_COST_FRACTION + 1);
    const int64_t diag_origin = max_dist + 2;
    const int64_t xdrop_offset =
        (xdrop + match_cost / 2) / (match_cost + mismatch_cost) + 1;

    int64_t index = first_mismatch(s1, len1, s2, len2, 0, 0, reverse);
    int64_t s1_align = index, s2_align = index;
    int64_t seq1_index = index;
    out->seed_q = 0; out->seed_s = 0; out->seed_len = index;
    int64_t longest_run = index;

    if (index == len1 || index == len2) {
        if (do_tb && ops) ops->add(OP_SUB, index);
        out->score_or_dist = 0;
        out->s1_align_len = index;
        out->s2_align_len = index;
        return;
    }

    std::vector<int64_t> max_score((size_t)(max_dist + xdrop_offset + 2), 0);
    const int64_t ms = xdrop_offset;

    Rows rows(1, do_tb ? 0 : 3);
    rows.alloc(0, diag_origin - 3, diag_origin + 3);
    rows.set(0, diag_origin, seq1_index);
    max_score[(size_t)ms] = seq1_index * match_cost;
    int64_t diag_lower = diag_origin - 1;
    int64_t diag_upper = diag_origin + 1;
    bool end1 = false, end2 = false;

    for (int64_t d = 1; d <= max_dist; ++d) {
        int64_t curr_extent = 0, curr_s2 = 0, curr_diag = 0;
        const int64_t tl = diag_lower, tu = diag_upper;
        rows.set(d - 1, diag_lower - 1, K_INVALID);
        rows.set(d - 1, diag_lower, K_INVALID);
        rows.set(d - 1, diag_upper, K_INVALID);
        rows.set(d - 1, diag_upper + 1, K_INVALID);

        int64_t xs = max_score[(size_t)(ms + d - xdrop_offset)] +
                     (match_cost + mismatch_cost) * d - xdrop;
        xs = (int64_t)std::ceil((double)xs / (double)(match_cost / 2));

        rows.alloc(d, tl - 2, tu + 2);

        for (int64_t k = tl; k <= tu; ++k) {
            int64_t s2i = std::max(rows.get(d - 1, k + 1),
                                   rows.get(d - 1, k)) + 1;
            s2i = std::max(s2i, rows.get(d - 1, k - 1));
            int64_t s1i = s2i + k - diag_origin;

            if (s2i < 0 || s1i + s2i < xs) {
                if (k == diag_lower) ++diag_lower;
                else rows.set(d, k, K_INVALID);
                continue;
            }
            diag_upper = k;

            int64_t run = first_mismatch(s1, len1, s2, len2, s1i, s2i,
                                         reverse);
            if (run > longest_run) {
                out->seed_q = s1i; out->seed_s = s2i;
                out->seed_len = longest_run = run;
            }
            s1i += run; s2i += run;
            rows.set(d, k, s2i);

            if (s1i + s2i > curr_extent) {
                curr_extent = s1i + s2i;
                curr_s2 = s2i;
                curr_diag = k;
            }
            if (s2i == len2) { diag_lower = k + 1; end2 = true; }
            if (s1i == len1) { diag_upper = k - 1; end1 = true; }
        }

        int64_t curr_score = curr_extent * (match_cost / 2) -
                             d * (match_cost + mismatch_cost);
        if (curr_score > max_score[(size_t)(ms + d - 1)]) {
            max_score[(size_t)(ms + d)] = curr_score;
            best_dist = d;
            best_diag = curr_diag;
            s2_align = curr_s2;
            s1_align = curr_s2 + best_diag - diag_origin;
        } else {
            max_score[(size_t)(ms + d)] = max_score[(size_t)(ms + d - 1)];
        }

        if (diag_lower > diag_upper) break;
        if (!end2) --diag_lower;
        if (!end1) ++diag_upper;
    }

    out->score_or_dist = best_dist;
    out->s1_align_len = s1_align;
    out->s2_align_len = s2_align;
    if (!do_tb || !ops) return;

    int64_t d = best_dist;
    int64_t s2i = s2_align;
    int64_t diag = best_diag;
    while (d > 0) {
        const int64_t ul = rows.get(d - 1, diag - 1);
        const int64_t um = rows.get(d - 1, diag);
        const int64_t ur = rows.get(d - 1, diag + 1);
        int64_t new_s2, new_diag;
        if (ul > std::max(um, ur)) { new_s2 = ul; new_diag = diag - 1; }
        else if (um > ur)          { new_s2 = um; new_diag = diag; }
        else                       { new_s2 = ur; new_diag = diag + 1; }

        if (new_diag == diag) {
            if (s2i - new_s2 > 0) ops->add(OP_SUB, s2i - new_s2);
        } else if (new_diag < diag) {
            if (s2i - new_s2 > 0) ops->add(OP_SUB, s2i - new_s2);
            ops->add(OP_INS, 1);
        } else {
            if (s2i - new_s2 - 1 > 0) ops->add(OP_SUB, s2i - new_s2 - 1);
            ops->add(OP_DEL, 1);
        }
        --d;
        diag = new_diag;
        s2i = new_s2;
    }
    ops->add(OP_SUB, rows.get(0, diag_origin));
}

void greedy_affine(const uint8_t* s1, int64_t len1,
                   const uint8_t* s2, int64_t len2,
                   bool reverse, int64_t xdrop,
                   int64_t match, int64_t mismatch,
                   int64_t gap_open, int64_t gap_extend,
                   bool do_tb, OpsBuf* ops, Out* out) {
    if (match % 2 == 1) {
        match *= 2; mismatch *= 2; xdrop *= 2;
        gap_open *= 2; gap_extend *= 2;
    }
    if (gap_open == 0 && gap_extend == 0) {
        greedy_nonaffine(s1, len1, s2, len2, reverse, xdrop, match,
                         mismatch, do_tb, ops, out);
        return;
    }

    int64_t best_dist = 0, best_diag = 0;
    const int64_t match_half = match / 2;
    int64_t op_cost = match + mismatch;
    int64_t g_open = gap_open;
    int64_t g_extend = gap_extend + match_half;
    // BLAST_Gdb3: gcd over {op_cost, g_open, g_extend} (g_open may be 0)
    int64_t common = g_open == 0
        ? gcd64(op_cost, g_extend)
        : gcd64(op_cost, gcd64(g_open, g_extend));
    if (common > 1) { op_cost /= common; g_open /= common; g_extend /= common; }

    const int64_t gap_open_extend = g_open + g_extend;
    const int64_t max_penalty = std::max(op_cost, gap_open_extend);

    const int64_t max_dist = std::min<int64_t>(
        GREEDY_MAX_COST, len2 / GREEDY_MAX_COST_FRACTION + 1);
    const int64_t scaled_max_dist = max_dist * g_extend;
    const int64_t diag_origin = max_dist + 2;
    const int64_t xdrop_offset = (xdrop + match_half) / common + 1;

    int64_t index = first_mismatch(s1, len1, s2, len2, 0, 0, reverse);
    int64_t s1_align = index, s2_align = index;
    int64_t seq1_index = index;
    out->seed_q = 0; out->seed_s = 0; out->seed_len = index;
    int64_t longest_run = index;

    if (index == len1 || index == len2) {
        if (do_tb && ops) ops->add(OP_SUB, index);
        out->score_or_dist = index * match;
        out->s1_align_len = index;
        out->s2_align_len = index;
        return;
    }

    std::vector<int64_t> max_score(
        (size_t)(scaled_max_dist + xdrop_offset + 2), 0);
    const int64_t ms = xdrop_offset;

    const int64_t nbounds = scaled_max_dist + 1 + max_penalty + 2;
    std::vector<int64_t> dlo((size_t)nbounds, K_INVALID_DIAG);
    std::vector<int64_t> dup((size_t)nbounds, -K_INVALID_DIAG);
    const int64_t db = max_penalty;

    const int M = 0, I = 1, D = 2;
    Rows rows(3, do_tb ? 0 : (int)(max_penalty + 2));
    rows.alloc(0, diag_origin - 3, diag_origin + 3);
    rows.set(0, diag_origin, seq1_index, M);
    rows.set(0, diag_origin, K_INVALID, I);
    rows.set(0, diag_origin, K_INVALID, D);
    max_score[(size_t)ms] = seq1_index * match;
    dlo[(size_t)(db + 0)] = diag_origin;
    dup[(size_t)(db + 0)] = diag_origin;

    int64_t curr_dl = diag_origin - 1;
    int64_t curr_du = diag_origin + 1;
    int64_t end1_diag = 0, end2_diag = 0;
    int64_t num_nonempty = 1;
    int64_t d = 1;

    auto in_b = [&](int64_t dd, int64_t k) {
        return dlo[(size_t)(db + dd)] <= k && k <= dup[(size_t)(db + dd)];
    };

    while (d <= scaled_max_dist) {
        int64_t curr_extent = 0, curr_s2 = 0, curr_diag = 0;
        const int64_t tl = curr_dl, tu = curr_du;

        int64_t xs = max_score[(size_t)(ms + d - xdrop_offset)] +
                     common * d - xdrop;
        xs = (int64_t)std::ceil((double)xs / (double)match_half);
        if (xs < 0) xs = 0;

        rows.alloc(d, tl - 2, tu + 2);

        for (int64_t k = tl; k <= tu; ++k) {
            int64_t s2i = K_INVALID;
            if (in_b(d - gap_open_extend, k + 1))
                s2i = rows.get(d - gap_open_extend, k + 1, M);
            if (in_b(d - g_extend, k + 1) &&
                s2i < rows.get(d - g_extend, k + 1, D))
                s2i = rows.get(d - g_extend, k + 1, D);
            rows.set(d, k, s2i == K_INVALID ? K_INVALID : s2i + 1, D);

            s2i = K_INVALID;
            if (in_b(d - gap_open_extend, k - 1))
                s2i = rows.get(d - gap_open_extend, k - 1, M);
            if (in_b(d - g_extend, k - 1) &&
                s2i < rows.get(d - g_extend, k - 1, I))
                s2i = rows.get(d - g_extend, k - 1, I);
            rows.set(d, k, s2i, I);

            s2i = std::max(rows.get(d, k, I), rows.get(d, k, D));
            if (in_b(d - op_cost, k))
                s2i = std::max(s2i, rows.get(d - op_cost, k, M) + 1);

            int64_t s1i = s2i + k - diag_origin;

            if (s2i < 0 || s1i + s2i < xs) {
                if (k == curr_dl) ++curr_dl;
                else rows.set(d, k, K_INVALID, M);
                continue;
            }
            curr_du = k;

            int64_t run = first_mismatch(s1, len1, s2, len2, s1i, s2i,
                                         reverse);
            if (run > longest_run) {
                out->seed_q = s1i; out->seed_s = s2i;
                out->seed_len = longest_run = run;
            }
            s1i += run; s2i += run;
            rows.set(d, k, s2i, M);

            if (s1i + s2i > curr_extent) {
                curr_extent = s1i + s2i;
                curr_s2 = s2i;
                curr_diag = k;
            }
            if (s1i == len1) { curr_du = k; end1_diag = k - 1; }
            if (s2i == len2) { curr_dl = k; end2_diag = k + 1; }
        }

        int64_t curr_score = curr_extent * match_half - d * common;
        if (curr_score > max_score[(size_t)(ms + d - 1)]) {
            max_score[(size_t)(ms + d)] = curr_score;
            best_dist = d;
            best_diag = curr_diag;
            s2_align = curr_s2;
            s1_align = curr_s2 + best_diag - diag_origin;
        } else {
            max_score[(size_t)(ms + d)] = max_score[(size_t)(ms + d - 1)];
        }

        if (curr_dl <= curr_du) {
            ++num_nonempty;
            dlo[(size_t)(db + d)] = curr_dl;
            dup[(size_t)(db + d)] = curr_du;
        } else {
            dlo[(size_t)(db + d)] = K_INVALID_DIAG;
            dup[(size_t)(db + d)] = -K_INVALID_DIAG;
        }
        if (dlo[(size_t)(db + d - max_penalty)] <=
            dup[(size_t)(db + d - max_penalty)])
            --num_nonempty;
        if (num_nonempty == 0) break;

        ++d;
        curr_dl = std::min(dlo[(size_t)(db + d - gap_open_extend)],
                           dlo[(size_t)(db + d - g_extend)]) - 1;
        curr_dl = std::min(curr_dl, dlo[(size_t)(db + d - op_cost)]);
        if (end2_diag > 0) curr_dl = std::max(curr_dl, end2_diag);
        curr_du = std::max(dup[(size_t)(db + d - gap_open_extend)],
                           dup[(size_t)(db + d - g_extend)]) + 1;
        curr_du = std::max(curr_du, dup[(size_t)(db + d - op_cost)]);
        if (end1_diag > 0) curr_du = std::min(curr_du, end1_diag);
    }

    out->score_or_dist = max_score[(size_t)(ms + best_dist)];
    out->s1_align_len = s1_align;
    out->s2_align_len = s2_align;
    if (!do_tb || !ops) return;

    // affine traceback
    d = best_dist;
    int64_t s2i = s2_align;
    int64_t diag = best_diag;
    int32_t state = OP_SUB;

    auto bound_ok = [&](int64_t dd, int64_t k) {
        return db + dd >= 0 && db + dd < nbounds &&
               dlo[(size_t)(db + dd)] <= k && k <= dup[(size_t)(db + dd)];
    };

    const int Mi = 0, Ii = 1, Di = 2;
    while (d > 0) {
        if (state == OP_SUB) {
            bool advanced = false;
            int64_t new_s2 = K_INVALID;
            int32_t nxt = OP_SUB;
            if (bound_ok(d - op_cost, diag)) {
                new_s2 = rows.get(d - op_cost, diag, Mi);
                if (new_s2 >= std::max(rows.get(d, diag, Ii),
                                       rows.get(d, diag, Di))) {
                    d -= op_cost;
                    nxt = OP_SUB;
                    advanced = true;
                }
            }
            if (!advanced) {
                if (rows.get(d, diag, Ii) > rows.get(d, diag, Di)) {
                    new_s2 = rows.get(d, diag, Ii);
                    nxt = OP_INS;
                } else {
                    new_s2 = rows.get(d, diag, Di);
                    nxt = OP_DEL;
                }
            }
            ops->add(OP_SUB, s2i - new_s2);
            s2i = new_s2;
            state = nxt;
        } else if (state == OP_INS) {
            ops->add(OP_INS, 1);
            int64_t new_diag = diag - 1;
            int64_t new_s2 = K_INVALID;
            if (bound_ok(d - g_extend, new_diag))
                new_s2 = rows.get(d - g_extend, new_diag, Ii);
            if (bound_ok(d - gap_open_extend, new_diag) &&
                new_s2 < rows.get(d - gap_open_extend, new_diag, Mi)) {
                d -= gap_open_extend;
                state = OP_SUB;
            } else {
                d -= g_extend;
                state = OP_INS;
            }
            --diag;
        } else {
            ops->add(OP_DEL, 1);
            int64_t new_diag = diag + 1;
            int64_t new_s2 = K_INVALID;
            if (bound_ok(d - g_extend, new_diag))
                new_s2 = rows.get(d - g_extend, new_diag, Di);
            if (bound_ok(d - gap_open_extend, new_diag) &&
                new_s2 < rows.get(d - gap_open_extend, new_diag, Mi)) {
                d -= gap_open_extend;
                state = OP_SUB;
            } else {
                d -= g_extend;
                state = OP_DEL;
            }
            ++diag;
            --s2i;
        }
    }
    ops->add(OP_SUB, rows.get(0, diag_origin, Mi));
}

}  // namespace

extern "C" {

// score-only or traceback greedy extension; returns 0 on success,
// 1 if the ops buffer overflowed (caller retries with a larger buffer)
int gblastn_greedy_align(
    const uint8_t* s1, int64_t len1,
    const uint8_t* s2, int64_t len2,
    int reverse, int64_t xdrop,
    int64_t match, int64_t mismatch,
    int64_t gap_open, int64_t gap_extend,
    int do_traceback,
    int32_t* op_types, int32_t* op_nums, int64_t max_ops,
    int64_t* out_vals /* [score, s1_len, s2_len, seed_q, seed_s,
                          seed_len, n_ops] */) {
    Out out{};
    OpsBuf ops{op_types, op_nums, max_ops};
    greedy_affine(s1, len1, s2, len2, reverse != 0, xdrop, match, mismatch,
                  gap_open, gap_extend, do_traceback != 0,
                  do_traceback ? &ops : nullptr, &out);
    out_vals[0] = out.score_or_dist;
    out_vals[1] = out.s1_align_len;
    out_vals[2] = out.s2_align_len;
    out_vals[3] = out.seed_q;
    out_vals[4] = out.seed_s;
    out_vals[5] = out.seed_len;
    out_vals[6] = ops.n;
    return ops.overflow ? 1 : 0;
}

// Fused greedy gapped TRACEBACK extension: both directions + prelim-
// block combination (Blast_PrelimEditBlockToGapEditScript,
// blast_gapalign.c:2455) + gap normalization (s_ReduceGaps, :2547) in
// one call -- the native twin of gapped/greedy.py
// greedy_gapped_alignment(do_traceback=True).
//
// out = [score, q_start, q_end, s_start, s_end, n_ops]; returns 0 ok,
// 1 = ops buffer overflow (retry with a larger buffer).
int gblastn_greedy_gapped_traceback(
    const uint8_t* q, int64_t q_len,
    const uint8_t* s, int64_t s_len,
    int64_t xdrop, int64_t reward, int64_t penalty /* negative */,
    int64_t gap_open, int64_t gap_extend,
    int64_t q_off, int64_t s_off,
    int32_t* op_types, int32_t* op_nums, int64_t max_ops,
    int64_t* out_vals) {
    const int64_t mismatch = -penalty;
    std::vector<int32_t> ft(max_ops), fn(max_ops), rt(max_ops),
        rn(max_ops);
    Out fwd{}, rev{};
    OpsBuf fops{ft.data(), fn.data(), max_ops};
    OpsBuf rops{rt.data(), rn.data(), max_ops};
    greedy_affine(q + q_off, q_len - q_off, s + s_off, s_len - s_off,
                  false, xdrop, reward, mismatch, gap_open, gap_extend,
                  true, &fops, &fwd);
    greedy_affine(q, q_off, s, s_off,
                  true, xdrop, reward, mismatch, gap_open, gap_extend,
                  true, &rops, &rev);
    if (fops.overflow || rops.overflow) return 1;

    int64_t score = fwd.score_or_dist + rev.score_or_dist;
    const int64_t q_ext_r = fwd.s1_align_len, s_ext_r = fwd.s2_align_len;
    const int64_t q_ext_l = rev.s1_align_len, s_ext_l = rev.s2_align_len;
    if (gap_open == 0 && gap_extend == 0) {
        score = (q_ext_r + s_ext_r + q_ext_l + s_ext_l) * reward / 2 -
                score * (reward - penalty);
    } else if (reward % 2 == 1) {
        score /= 2;
    }

    // combine: rev block in order, fwd block reversed, junction merge
    OpsBuf esp{op_types, op_nums, max_ops};
    for (int64_t i = 0; i < rops.n; ++i) esp.add(rt[i], rn[i]);
    for (int64_t i = fops.n - 1; i >= 0; --i) esp.add(ft[i], fn[i]);
    if (esp.overflow) return 1;

    // s_ReduceGaps (blast_gapalign.c:2547) over the combined script
    const int64_t n0 = esp.n;
    int32_t* ot = op_types;
    int32_t* on = op_nums;
    {
        int64_t qi = q_off - q_ext_l;
        int64_t si = s_off - s_ext_l;
        for (int64_t i = 0; i < n0; ++i) {
            const int32_t op = ot[i];
            if (op == OP_SUB) {
                qi += on[i];
                si += on[i];
                continue;
            }
            if (i > 1 && ot[i] != ot[i - 2] && on[i - 2] > 0) {
                const int64_t d = (int64_t)on[i] + on[i - 1] + on[i - 2];
                if (d == 3) {
                    on[i - 2] = 0;
                    on[i - 1] = 2;
                    on[i] = 0;
                    if (op == OP_INS) ++qi; else ++si;
                } else if (d < 12) {
                    int64_t nm1 = 0, nm2 = 0;
                    const int32_t dd =
                        on[i] < on[i - 2] ? on[i] : on[i - 2];
                    qi -= on[i - 1];
                    si -= on[i - 1];
                    int64_t q1 = qi, s1 = si;
                    if (op == OP_INS) si -= dd; else qi -= dd;
                    for (int32_t k = 0; k < on[i - 1]; ++k) {
                        if (q[q1] == s[s1]) ++nm1;
                        if (q[qi] == s[si]) ++nm2;
                        ++q1; ++s1; ++qi; ++si;
                    }
                    for (int32_t k = 0; k < dd; ++k) {
                        if (q[qi] == s[si]) ++nm2;
                        ++qi; ++si;
                    }
                    if (nm2 >= nm1 - dd) {
                        on[i - 2] -= dd;
                        on[i - 1] += dd;
                        on[i] -= dd;
                    } else {
                        qi = q1;
                        si = s1;
                    }
                }
            }
            if (ot[i] == OP_INS) qi += on[i]; else si += on[i];
        }
    }
    // rebuild: drop zero-num ops, merging the op after a dropped one
    // into the previous kept op (blast_gapalign.c:2607)
    int64_t w = 0;
    for (int64_t i = 0; i < n0; ++i) {
        if (on[i] > 0) {
            ot[w] = ot[i];
            on[w] = on[i];
            ++w;
        } else {
            ++i;
            if (i < n0 && w > 0) on[w - 1] += on[i];
        }
    }

    out_vals[0] = score;
    out_vals[1] = q_off - q_ext_l;
    out_vals[2] = q_off + q_ext_r;
    out_vals[3] = s_off - s_ext_l;
    out_vals[4] = s_off + s_ext_r;
    out_vals[5] = w;
    return 0;
}

}  // extern "C"
