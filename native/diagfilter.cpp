// Per-diagonal seed admission replay (host hot path).
//
// Native twin of engine/seeding.py one_hit_diag_filter /
// two_hit_diag_filter, which reproduce the accept/reject semantics of
// the reference's s_BlastnDiagTableExtendInitialHit
// (/root/reference/c++/src/algo/blast/core/na_ungapped.c:612-755).
// The replay is inherently sequential per diagonal (diagonal state:
// explored right end + hit_saved flag), so it runs as one tight scalar
// loop over seeds pre-sorted by (oid, diag, s_off); the Python twin is
// the test oracle (GBLASTN_TPU_NO_NATIVE=1).

#include <algorithm>
#include <cstdint>
#include <new>
#include <numeric>

// Replay key order: stable lexsort by (oid, diag, s_off, q_off) --
// the exact order np.lexsort((q_off, s_off, diag, oid)) produces
// (the final index tiebreak reproduces numpy's stability).  The
// 4-key numpy lexsort costs ~0.3 s at ~1M seeds (dense blastn
// word-11 batches); one comparator sort over precomputed masked
// diagonals is ~3x cheaper.
extern "C" int64_t gblastn_diag_order(
    const int32_t* q_off, const int32_t* s_off, const int32_t* oid,
    int64_t n, int64_t diag_mask, int64_t* order)
{
    // nothrow: a bad_alloc must not cross the extern "C" boundary into
    // ctypes; nonzero return lets the Python caller fall back to lexsort
    int64_t* diag = new (std::nothrow) int64_t[n];
    if (diag == nullptr) return -1;
    for (int64_t i = 0; i < n; ++i) {
        int64_t d = (int64_t)s_off[i] - (int64_t)q_off[i];
        diag[i] = diag_mask ? (d & diag_mask) : d;
    }
    std::iota(order, order + n, (int64_t)0);
    std::sort(order, order + n, [&](int64_t a, int64_t b) {
        if (oid[a] != oid[b]) return oid[a] < oid[b];
        if (diag[a] != diag[b]) return diag[a] < diag[b];
        if (s_off[a] != s_off[b]) return s_off[a] < s_off[b];
        if (q_off[a] != q_off[b]) return q_off[a] < q_off[b];
        return a < b;
    });
    delete[] diag;
    return 0;
}

// diag_mask: 0 = exact diagonals (the eDiagHash container); nonzero =
// the eDiagArray pow2 mask, which ALIASES diagonals in the same
// congruence class (blast_extend.c:57; engaged for concatenated query
// length <= 8000, blast_parameters.c:174).
extern "C" int64_t gblastn_diag_filter(
    const int32_t* q_off, const int32_t* s_off, const int32_t* oid,
    const int64_t* order, int64_t n,
    int64_t word_size, int64_t window, int64_t diag_mask,
    const int32_t* ung_s_start, const int32_t* ung_length,
    const int32_t* ung_score, const int32_t* cutoff,
    const int32_t* right_run,   // used only when window > 0
    uint8_t* saved)             // out: bool[n], pre-zeroed by caller
{
    int64_t n_saved = 0;
    bool have_key = false;
    int32_t last_oid = 0;
    int64_t last_diag = 0;
    int64_t last_hit = 0;
    int flag = 0;
    for (int64_t k = 0; k < n; ++k) {
        const int64_t i = order[k];
        int64_t diag = (int64_t)s_off[i] - (int64_t)q_off[i];
        if (diag_mask) diag &= diag_mask;
        if (!have_key || oid[i] != last_oid || diag != last_diag) {
            have_key = true;
            last_oid = oid[i];
            last_diag = diag;
            // virgin diagonals carry last_hit = -window
            // (s_BlastDiagClear, blast_extend.c:108; equivalently
            // diag_table->offset starts at window_size), so the first
            // hit ALWAYS takes the first-hit branch even with
            // s_end <= window
            last_hit = -window;
            flag = 0;
        }
        const int64_t s = s_off[i];
        if (s < last_hit)
            continue;
        if (window == 0) {
            // one-hit path (na_ungapped.c:612, window_size == 0)
            if (ung_score[i] >= cutoff[i]) {
                saved[i] = 1;
                ++n_saved;
                last_hit = (int64_t)ung_s_start[i] + ung_length[i];
            } else {
                last_hit = s + word_size;
            }
        } else {
            // two-hit path (na_ungapped.c:612-755, scan_range 0)
            int64_t s_end = s + word_size;
            int hit_ready;
            if (flag || s_end > last_hit + window) {
                const int64_t ext = right_run[i];
                s_end += ext;
                hit_ready = ext >= word_size;
            } else {
                hit_ready = 1;
            }
            if (hit_ready) {
                if (ung_score[i] >= cutoff[i]) {
                    saved[i] = 1;
                    ++n_saved;
                    s_end = (int64_t)ung_s_start[i] + ung_length[i];
                } else {
                    hit_ready = 0;
                }
            }
            last_hit = s_end;
            flag = hit_ready;
        }
    }
    return n_saved;
}
