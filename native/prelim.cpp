// Preliminary gapped-extension walk over one subject, native host
// implementation.
//
// Mirrors gblastn_tpu/engine/gapped.py::get_gapped_score_one_subject
// operation-for-operation (reference: BLAST_GetGappedScore,
// /root/reference/c++/src/algo/blast/core/blast_gapalign.c:3233):
// walk candidates in score order, skip ones whose ungapped box is
// contained in an already-saved HSP (midpoint interval tree, the
// blast_itree.c analog), extend greedy (score-only) or DP, save HSPs
// that reach the per-context cutoff together with the aligner's
// best-start-point estimate.
//
// The per-candidate aligners are the existing extern "C" entry points
// in greedy.cpp / dynprog.cpp; this file only adds the walk, which
// previously ran as a Python loop with two ctypes calls per candidate.

#include <cstdint>
#include <cstdlib>
#include <vector>

extern "C" int gblastn_greedy_align(
    const uint8_t* s1, int64_t len1,
    const uint8_t* s2, int64_t len2,
    int reverse, int64_t xdrop,
    int64_t match, int64_t mismatch,
    int64_t gap_open, int64_t gap_extend,
    int do_traceback,
    int32_t* op_types, int32_t* op_nums, int64_t max_ops,
    int64_t* out_vals);

extern "C" int gblastn_semi_gapped_align(
    const uint8_t* A, int64_t a_avail,
    const uint8_t* B, int64_t b_avail,
    int64_t M, int64_t N,
    const int32_t* matrix,
    int64_t gap_open, int64_t gap_extend,
    int64_t x_dropoff,
    int reverse_sequence,
    int score_only,
    int32_t* op_types, int32_t* op_nums, int64_t max_ops,
    int64_t* out_vals);

namespace {

struct SavedBox {
    int64_t q0, q1, s0, s1, score;
};

// ContainmentIndex analog (gblastn_tpu/hits.py:250): flat scan per
// context until 32 saved HSPs, then a midpoint interval tree keyed on
// the query range.
class CtxContainment {
  public:
    CtxContainment(int64_t sep, int64_t span)
        : sep_(sep), span_(span < 2 ? 2 : span) {}

    bool contains(int64_t q0, int64_t q1, int64_t s0, int64_t s1,
                  int64_t score) const {
        if (tree_root_ < 0) {
            for (const SavedBox& t : flat_)
                if (check(t, q0, q1, s0, s1, score)) return true;
            return false;
        }
        int node = tree_root_;
        while (node >= 0) {
            const Node& nd = nodes_[(size_t)node];
            for (const SavedBox& t : nd.items)
                if (check(t, q0, q1, s0, s1, score)) return true;
            if (q1 < nd.mid)
                node = nd.left;
            else if (q0 > nd.mid)
                node = nd.right;
            else
                return false;
        }
        return false;
    }

    void add(const SavedBox& h) {
        if (tree_root_ >= 0) {
            insert(tree_root_, h);
            return;
        }
        flat_.push_back(h);
        if (flat_.size() > kTreeThreshold) {
            tree_root_ = new_node(0, span_);
            for (const SavedBox& t : flat_) insert(tree_root_, t);
            flat_.clear();
        }
    }

  private:
    static constexpr size_t kTreeThreshold = 32;

    struct Node {
        int64_t lo, hi, mid;
        std::vector<SavedBox> items;
        int left = -1, right = -1;
    };

    bool check(const SavedBox& t, int64_t q0, int64_t q1, int64_t s0,
               int64_t s1, int64_t score) const {
        if (score > t.score) return false;
        if (!(t.q0 <= q0 && q0 <= t.q1 && t.s0 <= s0 && s0 <= t.s1 &&
              t.q0 <= q1 && q1 <= t.q1 && t.s0 <= s1 && s1 <= t.s1))
            return false;
        if (sep_ == 0) return true;
        return llabs((t.q0 - t.s0) - (q0 - s0)) < sep_ ||
               llabs((t.q1 - t.s1) - (q1 - s1)) < sep_;
    }

    int new_node(int64_t lo, int64_t hi) {
        nodes_.push_back(Node{lo, hi, (lo + hi) / 2, {}, -1, -1});
        return (int)nodes_.size() - 1;
    }

    void insert(int node, const SavedBox& h) {
        while (true) {
            Node& nd = nodes_[(size_t)node];
            if (h.q1 < nd.mid) {
                if (nd.left < 0) {
                    int64_t lo = nd.lo, mid = nd.mid;
                    int child = new_node(lo, mid);  // may realloc nodes_
                    nodes_[(size_t)node].left = child;
                    node = child;
                } else {
                    node = nd.left;
                }
            } else if (h.q0 > nd.mid) {
                if (nd.right < 0) {
                    int64_t mid = nd.mid, hi = nd.hi;
                    int child = new_node(mid, hi);
                    nodes_[(size_t)node].right = child;
                    node = child;
                } else {
                    node = nd.right;
                }
            } else {
                nd.items.push_back(h);
                return;
            }
        }
    }

    int64_t sep_;
    int64_t span_;
    std::vector<SavedBox> flat_;
    std::vector<Node> nodes_;
    int tree_root_ = -1;
};

struct ExtResult {
    int64_t q_start, q_end, s_start, s_end, score;
    int64_t q_seed_start, s_seed_start;
};

// BLAST_GreedyGappedAlignment (blast_gapalign.c:2620) score-only:
// fwd+rev greedy halves, score-scale conversion, best-start-point box
// estimation -- the exact logic of gapped/greedy.py:824 (score path).
bool greedy_gapped_score(const uint8_t* query, int64_t q_len,
                         const uint8_t* subject, int64_t s_len,
                         int64_t x_drop, int64_t reward, int64_t penalty,
                         int64_t gap_open, int64_t gap_extend,
                         int64_t q_off, int64_t s_off, ExtResult* res) {
    const int64_t mismatch = -penalty;
    int64_t fwd[7], rev[7];
    if (gblastn_greedy_align(query + q_off, q_len - q_off,
                             subject + s_off, s_len - s_off,
                             0, x_drop, reward, mismatch, gap_open,
                             gap_extend, 0, nullptr, nullptr, 0, fwd) != 0)
        return false;
    if (gblastn_greedy_align(query, q_off, subject, s_off,
                             1, x_drop, reward, mismatch, gap_open,
                             gap_extend, 0, nullptr, nullptr, 0, rev) != 0)
        return false;

    int64_t score = fwd[0] + rev[0];
    const int64_t q_ext_r = fwd[1], s_ext_r = fwd[2];
    const int64_t q_ext_l = rev[1], s_ext_l = rev[2];

    if (gap_open == 0 && gap_extend == 0) {
        // non-affine: distance -> score
        score = (q_ext_r + s_ext_r + q_ext_l + s_ext_l) * reward / 2 -
                score * (reward - penalty);
    } else if (reward % 2 == 1) {
        score /= 2;
    }

    // best start point estimation (blast_gapalign.c:2698)
    const int64_t q_box_l = q_off - q_ext_l;
    const int64_t s_box_l = s_off - s_ext_l;
    const int64_t q_box_r = q_off + q_ext_r;
    const int64_t s_box_r = s_off + s_ext_r;
    int64_t q_seed_start_l = q_off - rev[3];
    int64_t s_seed_start_l = s_off - rev[4];
    int64_t q_seed_start_r = q_off + fwd[3];
    int64_t s_seed_start_r = s_off + fwd[4];
    int64_t valid_seed_len_l = 0, valid_seed_len_r = 0;
    if (q_seed_start_r < q_box_r && s_seed_start_r < s_box_r) {
        int64_t v = q_box_r - q_seed_start_r;
        if (s_box_r - s_seed_start_r < v) v = s_box_r - s_seed_start_r;
        if (fwd[5] < v) v = fwd[5];
        valid_seed_len_r = v / 2;
    } else {
        q_seed_start_r = q_off;
        s_seed_start_r = s_off;
    }
    if (q_seed_start_l > q_box_l && s_seed_start_l > s_box_l) {
        int64_t v = q_seed_start_l - q_box_l;
        if (s_seed_start_l - s_box_l < v) v = s_seed_start_l - s_box_l;
        if (rev[5] < v) v = rev[5];
        valid_seed_len_l = v / 2;
    } else {
        q_seed_start_l = q_off;
        s_seed_start_l = s_off;
    }
    if (valid_seed_len_r > valid_seed_len_l) {
        res->q_seed_start = q_seed_start_r + valid_seed_len_r;
        res->s_seed_start = s_seed_start_r + valid_seed_len_r;
    } else {
        res->q_seed_start = q_seed_start_l - valid_seed_len_l;
        res->s_seed_start = s_seed_start_l - valid_seed_len_l;
    }

    res->q_start = q_box_l;
    res->q_end = q_box_r;
    res->s_start = s_box_l;
    res->s_end = s_box_r;
    res->score = score;
    return true;
}

// s_BlastDynProgNtGappedAlignment (blast_gapalign.c:2762) score-only:
// the exact logic of gapped/dynprog.py:309.
void dp_gapped_score(const uint8_t* query, int64_t q_len,
                     const uint8_t* subject, int64_t s_len,
                     const int32_t* matrix, int64_t gap_open,
                     int64_t gap_extend, int64_t x_drop,
                     int64_t q_off, int64_t s_off, ExtResult* res) {
    constexpr int64_t kCompression = 4;
    int64_t adj = kCompression - (s_off % kCompression);
    int64_t q_length = q_off + adj;
    int64_t s_length = s_off + adj;
    if (q_length > q_len || s_length > s_len) {
        q_length -= kCompression;
        s_length -= kCompression;
    }

    int64_t left[4], right[4] = {0, 0, 0, 0};
    gblastn_semi_gapped_align(subject, s_len, query, q_len,
                              s_length, q_length, matrix,
                              gap_open, gap_extend, x_drop,
                              1, 1, nullptr, nullptr, 0, left);
    int64_t q_start = q_length - left[2];
    int64_t s_start = s_length - left[1];

    int64_t q_stop = q_length, s_stop = s_length;
    if (q_length < q_len && s_length < s_len) {
        gblastn_semi_gapped_align(subject + s_length - 1,
                                  s_len - (s_length - 1),
                                  query + q_length - 1,
                                  q_len - (q_length - 1),
                                  s_len - s_length, q_len - q_length,
                                  matrix, gap_open, gap_extend, x_drop,
                                  0, 1, nullptr, nullptr, 0, right);
        q_stop = right[2] + q_length;
        s_stop = right[1] + s_length;
    }

    res->q_start = q_start;
    res->q_end = q_stop;
    res->s_start = s_start;
    res->s_end = s_stop;
    res->score = left[0] + right[0];
    res->q_seed_start = q_off;
    res->s_seed_start = s_off;
}

}  // namespace

extern "C" int64_t gblastn_gapped_prelim_walk(
    const uint8_t* qbuf, int64_t qbuf_len,
    const uint8_t* subject2, int64_t s_len,
    int64_t n,                       // candidates, already in walk order
    const int32_t* ctx,              // context id per candidate
    const int64_t* uq_start,         // ungapped start, buffer coords
    const int64_t* us_start,         // ungapped start, subject-local
    const int64_t* length,           // ungapped length
    const int64_t* score,            // ungapped score
    const int64_t* q_off,            // seed offset, buffer coords (DP)
    const int64_t* s_off,            // seed offset, subject-local (DP)
    const uint8_t* reject,           // device-filter verdicts, may be NULL
    const int64_t* ctx_offsets,      // [n_ctx] context start in qbuf
    const int64_t* ctx_len,          // [n_ctx]
    const int64_t* cutoff,           // [n_ctx] per-context cutoff score
    int method,                      // 0 = greedy, 1 = DP
    int64_t reward, int64_t penalty, // penalty negative
    int64_t gap_open, int64_t gap_extend, int64_t gap_x_dropoff,
    int64_t min_diag_separation,
    const int32_t* matrix,           // [16*16] BLASTNA (DP); NULL greedy
    int64_t* o_q_off, int64_t* o_q_end,
    int64_t* o_s_off, int64_t* o_s_end,
    int64_t* o_score, int32_t* o_ctx,
    int64_t* o_qg, int64_t* o_sg,    // gapped (seed) start estimates
    int64_t* out_n_ext) {
    std::vector<CtxContainment*> indexes;  // lazily built per context id
    int64_t n_saved = 0;
    int64_t n_ext = 0;

    auto index_for = [&](int32_t c) -> CtxContainment& {
        if ((size_t)c >= indexes.size()) indexes.resize((size_t)c + 1, nullptr);
        if (!indexes[(size_t)c])
            indexes[(size_t)c] =
                new CtxContainment(min_diag_separation, qbuf_len + 1);
        return *indexes[(size_t)c];
    };

    for (int64_t i = 0; i < n; ++i) {
        const int32_t c = ctx[i];
        const int64_t q0 = ctx_offsets[c];
        const int64_t q_ctx_len = ctx_len[c];
        const int64_t uq = uq_start[i] - q0;   // context-local
        const int64_t us = us_start[i];
        const int64_t len = length[i];

        CtxContainment& index = index_for(c);
        if (index.contains(uq, uq + len, us, us + len, score[i]))
            continue;

        ++n_ext;
        if (reject && reject[i]) continue;

        ExtResult res;
        const uint8_t* query = qbuf + q0;
        if (method == 0) {
            int64_t qo = uq + len / 2;
            int64_t so = us + len / 2;
            if (!greedy_gapped_score(query, q_ctx_len, subject2, s_len,
                                     gap_x_dropoff, reward, penalty,
                                     gap_open, gap_extend, qo, so, &res)) {
                // signal the caller to redo this walk in Python
                for (auto* p : indexes) delete p;
                return -1;
            }
        } else {
            int64_t qo = q_off[i] - q0;
            int64_t so = s_off[i];
            if (us + len >= so + 8) {
                qo += 3;
                so += 3;
            }
            dp_gapped_score(query, q_ctx_len, subject2, s_len, matrix,
                            gap_open, gap_extend, gap_x_dropoff, qo, so,
                            &res);
        }

        if (res.score >= cutoff[c]) {
            o_q_off[n_saved] = res.q_start;
            o_q_end[n_saved] = res.q_end;
            o_s_off[n_saved] = res.s_start;
            o_s_end[n_saved] = res.s_end;
            o_score[n_saved] = res.score;
            o_ctx[n_saved] = c;
            o_qg[n_saved] = res.q_seed_start;
            o_sg[n_saved] = res.s_seed_start;
            ++n_saved;
            index.add(SavedBox{res.q_start, res.q_end, res.s_start,
                               res.s_end, res.score});
        }
    }
    for (auto* p : indexes) delete p;
    *out_n_ext = n_ext;
    return n_saved;
}
