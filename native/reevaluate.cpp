// Gapped HSP re-evaluation against the true (ambiguity-restored)
// subject: native port of traceback/stage.py::
// reevaluate_with_ambiguities_gapped (itself a reimplementation of
// Blast_HSPReevaluateWithAmbiguitiesGapped, reference
// /root/reference/c++/src/algo/blast/core/blast_hits.c:350-510 and
// s_UpdateReevaluatedHSP blast_hits.c:311). The per-base rescoring
// walk dominates the traceback stage in Python.
//
// C API (ctypes):
//   gblastn_reevaluate_gapped(q, qlen, s, slen, matrix16x16,
//       q_off, s_off, cutoff, reward, penalty, gap_open, gap_extend,
//       ops, nums, n_ops, out[8]) -> new n_ops (or -1 = delete HSP)
//   ops/nums are rewritten in place with the kept section;
//   out = {score, q_off, q_end, s_off, s_end}.

#include <cstdint>
#include <vector>

namespace {
constexpr int OP_DEL = 0;  // gap in query, consumes subject
constexpr int OP_SUB = 3;
}  // namespace

extern "C" int64_t gblastn_reevaluate_gapped(
    const uint8_t* q, int64_t qlen, const uint8_t* s, int64_t slen,
    const int32_t* matrix,  // [16][16] row-major, indexed [q & 15][s]
    int64_t q_off0, int64_t s_off0, int64_t cutoff_score,
    int64_t reward, int64_t penalty, int64_t gap_open,
    int64_t gap_extend, int8_t* ops, int64_t* nums, int64_t n_ops,
    int64_t* out) {
    if (n_ops <= 0) return -1;

    int64_t factor, g_open, g_extend;
    if (gap_open == 0 && gap_extend == 0) {
        factor = (reward % 2 == 1) ? 2 : 1;
        g_open = 0;
        g_extend = (reward - 2 * penalty) * factor / 2;
    } else {
        factor = 1;
        g_open = gap_open;
        g_extend = gap_extend;
    }

    std::vector<int8_t> eop(ops, ops + n_ops);
    std::vector<int64_t> enum_(nums, nums + n_ops);

    int64_t qi = q_off0, si = s_off0;
    int64_t score = 0, sum = 0;
    int64_t best_q_start = qi, best_q_end = qi;
    int64_t best_s_start = si, best_s_end = si;
    int64_t current_q_start = qi, current_s_start = si;
    int64_t best_start_esp_index = 0, best_end_esp_index = 0;
    int64_t current_start_esp_index = 0;
    int64_t best_end_esp_num = -1;

    for (int64_t index = 0; index < (int64_t)eop.size(); ++index) {
        int op = eop[index];
        int64_t num = enum_[index];
        int64_t op_index = 0;
        while (op_index < num) {
            if (op == OP_SUB) {
                sum += factor * (int64_t)matrix[(q[qi] & 0x0F) * 16 + s[si]];
                ++qi;
                ++si;
                ++op_index;
            } else if (op == OP_DEL) {
                sum -= g_open + g_extend * num;
                si += num;
                op_index += num;
            } else {  // OP_INS
                sum -= g_open + g_extend * num;
                qi += num;
                op_index += num;
            }

            if (sum < 0) {
                if (op_index < num) {
                    enum_[index] -= op_index;
                    num = enum_[index];
                    current_start_esp_index = index;
                    op_index = 0;
                } else {
                    current_start_esp_index = index + 1;
                }
                sum = 0;
                current_q_start = qi;
                current_s_start = si;
                if (score < cutoff_score) {
                    best_q_start = qi;
                    best_s_start = si;
                    score = 0;
                    best_start_esp_index = current_start_esp_index;
                    best_end_esp_index = current_start_esp_index;
                }
            } else if (sum > score) {
                score = sum;
                best_q_start = current_q_start;
                best_s_start = current_s_start;
                best_q_end = qi;
                best_s_end = si;
                best_start_esp_index = current_start_esp_index;
                best_end_esp_index = index;
                best_end_esp_num = op_index;
            }
        }
    }

    score /= factor;

    if (best_start_esp_index < (int64_t)eop.size() &&
        best_end_esp_index < (int64_t)eop.size()) {
        int64_t qp = best_q_start, sp = best_s_start, ext = 0;
        while (qp > 0 && sp > 0 && q[qp - 1] == s[sp - 1] &&
               q[qp - 1] < 4) {
            --qp;
            --sp;
            ++ext;
        }
        best_q_start -= ext;
        best_s_start -= ext;
        enum_[best_start_esp_index] += ext;
        if (best_end_esp_index == best_start_esp_index)
            best_end_esp_num += ext;
        score += ext * reward;

        qp = best_q_end;
        sp = best_s_end;
        ext = 0;
        while (qp < qlen && sp < slen && q[qp] < 4 && q[qp] == s[sp]) {
            ++qp;
            ++sp;
            ++ext;
        }
        best_q_end += ext;
        best_s_end += ext;
        enum_[best_end_esp_index] += ext;
        best_end_esp_num += ext;
        score += ext * reward;
    }

    if (score < cutoff_score) {
        out[0] = score;
        return -1;
    }

    int64_t m = 0;
    for (int64_t i = best_start_esp_index; i <= best_end_esp_index &&
         i < (int64_t)eop.size(); ++i, ++m) {
        ops[m] = eop[i];
        nums[m] = enum_[i];
    }
    if (m > 0) nums[m - 1] = best_end_esp_num;

    out[0] = score;
    out[1] = best_q_start;
    out[2] = best_q_end;
    out[3] = best_s_start;
    out[4] = best_s_end;
    return m;
}
