// Native X-drop banded affine DP (semi-gapped) aligner — blastn task
// host hot path.
//
// Exact C++ counterpart of gblastn_tpu/gapped/dynprog.py
// semi_gapped_align (which mirrors the reference Blast_SemiGappedAlign /
// ALIGN_EX semantics — see the Python module for derivation and
// citations). Kept operation-for-operation equivalent to the Python
// oracle; verified by tests/test_native.py fuzz comparison.

#include <cstdint>
#include <vector>
#include <algorithm>

namespace {

constexpr int64_t MININT = -(int64_t(1) << 30);  // INT4_MIN/2

constexpr int32_t OP_DEL = 0;
constexpr int32_t OP_SUB = 3;
constexpr int32_t OP_INS = 6;
constexpr uint8_t SCRIPT_OP_MASK = 0x07;
constexpr uint8_t SCRIPT_EXTEND_GAP_A = 0x10;
constexpr uint8_t SCRIPT_EXTEND_GAP_B = 0x40;

struct OpsBuf {
    int32_t* types;
    int32_t* nums;
    int64_t cap;
    int64_t n = 0;
    bool overflow = false;

    void add1(int32_t op) {
        if (n > 0 && types[n - 1] == op) {
            ++nums[n - 1];
            return;
        }
        if (n >= cap) { overflow = true; return; }
        types[n] = op;
        nums[n] = 1;
        ++n;
    }

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

}  // namespace

extern "C" {

// Returns 0 on success, 1 on ops-buffer overflow.
// out_vals = [best_score, a_offset, b_offset, n_ops]
int gblastn_semi_gapped_align(
    const uint8_t* A, int64_t a_avail,   // A[a_index] valid for 0..a_avail-1
    const uint8_t* B, int64_t b_avail,
    int64_t M, int64_t N,
    const int32_t* matrix,               // [16*16] row-major BLASTNA
    int64_t gap_open, int64_t gap_extend,
    int64_t x_dropoff,
    int reverse_sequence,
    int score_only,
    int32_t* op_types, int32_t* op_nums, int64_t max_ops,
    int64_t* out_vals) {
    const int64_t gap_open_extend = gap_open + gap_extend;
    if (x_dropoff < gap_open_extend) x_dropoff = gap_open_extend;
    int64_t a_offset = 0, b_offset = 0;
    OpsBuf ops{op_types, op_nums, max_ops};

    if (N <= 0 || M <= 0) {
        out_vals[0] = 0; out_vals[1] = 0; out_vals[2] = 0; out_vals[3] = 0;
        return 0;
    }

    std::vector<int64_t> best((size_t)(N + 2), 0);
    std::vector<int64_t> best_gap((size_t)(N + 2), 0);

    // traceback rows: row a covers b indices from tb_start[a]
    std::vector<std::vector<uint8_t>> tb_rows;
    std::vector<int64_t> tb_starts;
    const bool tb = !score_only;

    int64_t score = -gap_open_extend;
    best[0] = 0;
    best_gap[0] = -gap_open_extend;
    std::vector<uint8_t> row0((size_t)(N + 2), 0);
    int64_t i = 1;
    while (i <= N) {
        if (score < -x_dropoff) break;
        best[(size_t)i] = score;
        best_gap[(size_t)i] = score - gap_open_extend;
        score -= gap_extend;
        row0[(size_t)i] = (uint8_t)OP_DEL;  // SCRIPT_GAP_IN_A
        ++i;
    }
    int64_t b_size = i;
    if (tb) {
        tb_rows.push_back(std::move(row0));
        tb_starts.push_back(0);
    }

    int64_t best_score = 0;
    int64_t first_b_index = 0;

    int64_t a_index = 1;
    for (; a_index <= M; ++a_index) {
        int64_t a_pos = reverse_sequence ? (M - a_index) : a_index;
        const int32_t* matrix_row =
            (a_pos >= 0 && a_pos < a_avail) ? matrix + 16 * A[a_pos]
                                            : nullptr;

        std::vector<uint8_t>* row = nullptr;
        int64_t row_start = first_b_index;
        if (tb) {
            tb_rows.emplace_back(
                (size_t)std::max<int64_t>(b_size - first_b_index + 2, 2), 0);
            tb_starts.push_back(first_b_index);
            row = &tb_rows.back();
        }

        score = MININT;
        int64_t score_gap_row = MININT;
        int64_t last_b_index = first_b_index;

        for (int64_t b_index = first_b_index; b_index < b_size; ++b_index) {
            int64_t bi = reverse_sequence ? (N - 1 - b_index) : (b_index + 1);
            int64_t msc;
            if (bi >= 0 && bi < b_avail && matrix_row)
                msc = matrix_row[B[bi]];
            else
                msc = MININT;
            int64_t score_gap_col = best_gap[(size_t)b_index];
            int64_t next_score = best[(size_t)b_index] + msc;

            uint8_t script = (uint8_t)OP_SUB;
            if (score < score_gap_col) {
                script = (uint8_t)OP_INS;  // SCRIPT_GAP_IN_B
                score = score_gap_col;
            }
            if (score < score_gap_row) {
                script = (uint8_t)OP_DEL;  // SCRIPT_GAP_IN_A
                score = score_gap_row;
            }

            if (best_score - score > x_dropoff) {
                if (first_b_index == b_index) ++first_b_index;
                else best[(size_t)b_index] = MININT;
            } else {
                last_b_index = b_index;
                if (score > best_score) {
                    best_score = score;
                    a_offset = a_index;
                    b_offset = b_index;
                }
                score_gap_row -= gap_extend;
                score_gap_col -= gap_extend;
                if (score_gap_col < score - gap_open_extend) {
                    best_gap[(size_t)b_index] = score - gap_open_extend;
                } else {
                    best_gap[(size_t)b_index] = score_gap_col;
                    script += SCRIPT_EXTEND_GAP_B;
                }
                if (score_gap_row < score - gap_open_extend)
                    score_gap_row = score - gap_open_extend;
                else
                    script += SCRIPT_EXTEND_GAP_A;
                best[(size_t)b_index] = score;
            }

            score = next_score;
            if (row) {
                size_t idx = (size_t)(b_index - row_start);
                if (idx >= row->size()) row->resize(idx + 16, 0);
                (*row)[idx] = script;
            }
        }

        if (first_b_index == b_size) break;

        if (last_b_index < b_size - 1) {
            b_size = last_b_index + 1;
        } else {
            while (score_gap_row >= best_score - x_dropoff && b_size <= N) {
                if ((size_t)(b_size + 2) >= best.size()) {
                    best.resize(best.size() + (size_t)(N + 2), 0);
                    best_gap.resize(best_gap.size() + (size_t)(N + 2), 0);
                }
                best[(size_t)b_size] = score_gap_row;
                best_gap[(size_t)b_size] = score_gap_row - gap_open_extend;
                score_gap_row -= gap_extend;
                if (row) {
                    size_t idx = (size_t)(b_size - row_start);
                    if (idx >= row->size()) row->resize(idx + 16, 0);
                    (*row)[idx] = (uint8_t)OP_DEL;
                }
                ++b_size;
            }
        }

        if (b_size <= N) {
            best[(size_t)b_size] = MININT;
            best_gap[(size_t)b_size] = MININT;
            ++b_size;
        }
    }

    if (tb) {
        // ALIGN_EX traceback walk
        int64_t a = a_offset, b = b_offset;
        uint8_t script = (uint8_t)OP_SUB;
        while (a > 0 || b > 0) {
            uint8_t next_script =
                tb_rows[(size_t)a][(size_t)(b - tb_starts[(size_t)a])];
            if (script == (uint8_t)OP_DEL) {
                script = next_script & SCRIPT_OP_MASK;
                if (next_script & SCRIPT_EXTEND_GAP_A)
                    script = (uint8_t)OP_DEL;
            } else if (script == (uint8_t)OP_INS) {
                script = next_script & SCRIPT_OP_MASK;
                if (next_script & SCRIPT_EXTEND_GAP_B)
                    script = (uint8_t)OP_INS;
            } else {
                script = next_script & SCRIPT_OP_MASK;
            }
            if (script == (uint8_t)OP_DEL) --b;
            else if (script == (uint8_t)OP_INS) --a;
            else { --a; --b; }
            ops.add1((int32_t)script);
        }
    }

    out_vals[0] = best_score;
    out_vals[1] = a_offset;
    out_vals[2] = b_offset;
    out_vals[3] = ops.n;
    return ops.overflow ? 1 : 0;
}

// Fused DP gapped TRACEBACK extension: left (inclusive) + right
// (exclusive) semi-gapped passes + prelim-block combination in one
// call -- the native twin of gapped/dynprog.py
// gapped_alignment_with_traceback (BLAST_GappedAlignmentWithTraceback,
// blast_gapalign.c:3994).
//
// out = [score, q_start, q_end, s_start, s_end, n_ops]; returns 0 ok,
// 1 = ops buffer overflow.
int gblastn_dp_gapped_traceback(
    const uint8_t* q, int64_t q_len,
    const uint8_t* s, int64_t s_len,
    const int32_t* matrix,
    int64_t gap_open, int64_t gap_extend, int64_t x_dropoff,
    int64_t q_start, int64_t s_start,
    int32_t* op_types, int32_t* op_nums, int64_t max_ops,
    int64_t* out_vals) {
    std::vector<int32_t> lt(max_ops), ln(max_ops), rt(max_ops),
        rn(max_ops);
    int64_t lv[4] = {0, 0, 0, 0}, rv[4] = {0, 0, 0, 0};
    if (gblastn_semi_gapped_align(
            q, q_len, s, s_len, q_start + 1, s_start + 1, matrix,
            gap_open, gap_extend, x_dropoff, 1, 0,
            lt.data(), ln.data(), max_ops, lv) != 0)
        return 1;
    const int64_t query_start = q_start - lv[1] + 1;
    const int64_t subject_start = s_start - lv[2] + 1;

    int64_t query_stop, subject_stop, score_right = 0;
    int64_t n_fwd = 0;
    if (q_start < q_len && s_start < s_len) {
        if (gblastn_semi_gapped_align(
                q + q_start, q_len - q_start, s + s_start,
                s_len - s_start, q_len - q_start - 1,
                s_len - s_start - 1, matrix,
                gap_open, gap_extend, x_dropoff, 0, 0,
                rt.data(), rn.data(), max_ops, rv) != 0)
            return 1;
        score_right = rv[0];
        query_stop = q_start + rv[1] + 1;
        subject_stop = s_start + rv[2] + 1;
        n_fwd = rv[3];
    } else {
        query_stop = q_start - 1;
        subject_stop = s_start - 1;
    }

    OpsBuf esp{op_types, op_nums, max_ops};
    for (int64_t i = 0; i < lv[3]; ++i) esp.add(lt[i], ln[i]);
    for (int64_t i = n_fwd - 1; i >= 0; --i) esp.add(rt[i], rn[i]);
    if (esp.overflow) return 1;

    out_vals[0] = lv[0] + score_right;
    out_vals[1] = query_start;
    out_vals[2] = query_stop;
    out_vals[3] = subject_start;
    out_vals[4] = subject_stop;
    out_vals[5] = esp.n;
    return 0;
}

}  // extern "C"

