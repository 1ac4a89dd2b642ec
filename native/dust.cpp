// Symmetric DUST low-complexity masker, native host implementation.
//
// Operation-for-operation port of gblastn_tpu/masking/dust.py (itself a
// reimplementation of CSymDustMasker, reference
// /root/reference/c++/src/algo/dustmask/symdust.cpp). The per-window
// state machine is inherently sequential, so it runs as native host
// code alongside the aligners.
//
// Exported C API (ctypes):
//   gblastn_dust_mask(seq2, n, level, window, linker, out, cap) -> int
//     seq2: uint8[n] 2-bit codes; out: int64[2*cap] inclusive pairs.
//     Returns the number of intervals (truncated at cap).

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int TRIPLET_MASK = 0x3F;

struct Perfect {
    int64_t first, second, score, len;
};

struct Triplets {
    int64_t start = 0, stop = 0;
    int max_size;
    int low_k;
    int64_t L = 0;
    std::vector<Perfect>* P;   // [0] = newest (insert at front)
    const int64_t* thresholds;
    // ring buffer, [0] = newest triplet
    int buf[64];
    int head = 0, count = 0;
    int c_w[64], c_v[64];
    int64_t r_w = 0, r_v = 0;
    int num_diff = 0;

    Triplets(int window, int low_k_, std::vector<Perfect>* P_,
             const int64_t* th)
        : max_size(window - 2), low_k(low_k_), P(P_), thresholds(th) {
        std::memset(c_w, 0, sizeof(c_w));
        std::memset(c_v, 0, sizeof(c_v));
    }

    int at(int i) const { return buf[(head + i) & 63]; }
    void push_front(int t) {
        head = (head + 63) & 63;
        buf[head] = t;
        ++count;
    }
    int pop_back() {
        int t = buf[(head + count - 1) & 63];
        --count;
        return t;
    }

    int add(int* counts, int t) { return counts[t]++; }
    int rem(int* counts, int t) { return --counts[t]; }

    bool shift_high(int t) {
        int s = pop_back();
        r_w -= rem(c_w, s);
        if (c_w[s] == 0) --num_diff;
        ++start;

        push_front(t);
        if (c_w[t] == 0) ++num_diff;
        r_w += add(c_w, t);
        ++stop;

        if (num_diff <= 1) {
            P->insert(P->begin(), {start, stop + 1, 0, 0});
            return false;
        }
        return true;
    }

    bool shift_window(int t) {
        if (count >= max_size) {
            if (num_diff <= 1) return shift_high(t);
            int s = pop_back();
            r_w -= rem(c_w, s);
            if (c_w[s] == 0) --num_diff;
            if (L == start) {
                ++L;
                r_v -= rem(c_v, s);
            }
            ++start;
        }

        push_front(t);
        if (c_w[t] == 0) ++num_diff;
        r_w += add(c_w, t);
        r_v += add(c_v, t);

        if (c_v[t] > low_k) {
            int off = count - (int)(L - start) - 1;
            for (;;) {
                int s = at(off);
                r_v -= rem(c_v, s);
                ++L;
                --off;
                if (s == t) break;
            }
        }

        ++stop;

        if (count >= max_size && num_diff <= 1) {
            P->clear();
            P->insert(P->begin(), {start, stop + 1, 0, 0});
            return false;
        }
        return true;
    }

    bool needs_processing() const {
        int64_t cnt = stop - L;
        return cnt < count && 10 * r_w > thresholds[cnt];
    }

    void find_perfect() {
        int64_t cnt = stop - L;
        int counts[64];
        std::memcpy(counts, c_v, sizeof(counts));
        int64_t score = r_v;
        size_t p_idx = 0;
        int64_t max_perfect_score = 0, max_len = 0;
        int64_t pos = L - 1;
        for (int i = (int)cnt; i < count; ++i, ++cnt, --pos) {
            int t = at(i);
            int c = counts[t];
            score += add(counts, t);
            if (c > 0 && score * 10 > thresholds[cnt]) {
                while (p_idx < P->size() && pos <= (*P)[p_idx].first) {
                    int64_t pscore = (*P)[p_idx].score;
                    int64_t plen = (*P)[p_idx].len;
                    if (max_perfect_score == 0 ||
                        max_len * pscore > max_perfect_score * plen) {
                        max_perfect_score = pscore;
                        max_len = plen;
                    }
                    ++p_idx;
                }
                if (max_perfect_score == 0 ||
                    score * max_len >= max_perfect_score * cnt) {
                    max_perfect_score = score;
                    max_len = cnt;
                    P->insert(P->begin() + p_idx,
                              {pos, stop + 1, max_perfect_score, cnt});
                }
            }
        }
    }
};

struct Interval {
    int64_t a, b;
};

void save_masked_regions(std::vector<Interval>& res,
                         std::vector<Perfect>& P, int64_t wstart,
                         int64_t start, int linker) {
    if (P.empty()) return;
    int64_t first = P.back().first, second = P.back().second;
    if (first < wstart) {
        int64_t b0 = first + start, b1 = second + start;
        if (!res.empty() && res.back().b + linker >= b0) {
            int64_t s = res.back().b;
            res.back().b = s > b1 ? s : b1;
        } else {
            res.push_back({b0, b1});
        }
        while (!P.empty() && P.back().first < wstart) P.pop_back();
    }
}

}  // namespace

extern "C" int64_t gblastn_dust_mask(const uint8_t* seq2, int64_t n,
                                     int level, int window, int linker,
                                     int64_t* out, int64_t cap) {
    if (n == 0) return 0;
    int low_k = level / 5;
    int64_t thresholds[64];
    thresholds[0] = 1;
    for (int i = 1; i < window - 2; ++i) thresholds[i] = (int64_t)i * level;

    std::vector<Interval> res;
    int64_t start = 0;
    int64_t stop = n - 1;

    while (stop > 2 + start) {
        std::vector<Perfect> P;
        Triplets w(window, low_k, &P, thresholds);

        int t = ((int)seq2[start] << 2) + (int)seq2[start + 1];
        int64_t pos = start + w.stop + 2;

        bool done = false;
        while (!done && pos <= stop) {
            save_masked_regions(res, P, w.start, start, linker);
            t = ((t << 2) & TRIPLET_MASK) + (seq2[pos] & 0x3);
            ++pos;
            if (w.shift_window(t)) {
                if (w.needs_processing()) w.find_perfect();
            } else {
                while (pos <= stop) {
                    save_masked_regions(res, P, w.start, start, linker);
                    t = ((t << 2) & TRIPLET_MASK) + (seq2[pos] & 0x3);
                    if (w.shift_window(t)) {
                        done = true;
                        break;
                    }
                    ++pos;
                }
            }
        }

        int64_t wstart = w.start;
        while (!P.empty()) {
            save_masked_regions(res, P, wstart, start, linker);
            ++wstart;
        }

        if (w.start > 0)
            start += w.start;
        else
            break;
    }

    int64_t m = (int64_t)res.size();
    int64_t keep = m < cap ? m : cap;
    for (int64_t i = 0; i < keep; ++i) {
        out[2 * i] = res[i].a;
        out[2 * i + 1] = res[i].b;
    }
    return m;
}
