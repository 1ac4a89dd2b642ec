/* Drive the reference's culling / best-hit HSP writers directly on
 * synthetic HSPs, so the Python ports (gblastn_tpu.hspfilters) can be
 * fuzz-compared bit-for-bit without shaping an end-to-end search.
 *
 * Usage: oracle_culltest {cull LIMIT | besthit OVERHANG SCORE_EDGE} QLEN
 * stdin:  one "begin end score evalue" per line (query coords,
 *         context 0, one subject per line group separated by "oid N")
 * stdout: surviving "begin end score" lines (any order).
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include <algo/blast/core/blast_def.h>
#include <algo/blast/core/blast_program.h>
#include <algo/blast/core/blast_options.h>
#include <algo/blast/core/blast_query_info.h>
#include <algo/blast/core/blast_hits.h>
#include <algo/blast/core/blast_hspstream.h>
#include <algo/blast/core/hspfilter_culling.h>
#include <algo/blast/core/hspfilter_besthit.h>

int main(int argc, char** argv) {
    if (argc < 3) { fprintf(stderr, "usage\n"); return 2; }
    int is_cull = !strcmp(argv[1], "cull");
    Int4 limit = 0;
    double overhang = 0, score_edge = 0;
    Int4 qlen;
    if (is_cull) {
        limit = atoi(argv[2]);
        qlen = atoi(argv[3]);
    } else {
        overhang = atof(argv[2]);
        score_edge = atof(argv[3]);
        qlen = atoi(argv[4]);
    }

    BlastQueryInfo* qinfo = BlastQueryInfoNew(eBlastTypeBlastn, 1);
    /* one plus-strand context covering [0, qlen) */
    qinfo->first_context = 0;
    qinfo->last_context = 0;
    qinfo->num_queries = 1;
    qinfo->contexts[0].query_offset = 0;
    qinfo->contexts[0].query_length = qlen;
    qinfo->contexts[0].is_valid = TRUE;
    qinfo->contexts[0].frame = 1;
    qinfo->contexts[0].query_index = 0;

    BlastHitSavingOptions* hit_opts = NULL;
    BlastHitSavingOptionsNew(eBlastTypeBlastn, &hit_opts, TRUE);
    hit_opts->hitlist_size = 5000;

    BlastHSPWriterInfo* winfo = NULL;
    if (is_cull) {
        BlastHSPCullingOptions copts;
        copts.max_hits = limit;
        winfo = BlastHSPCullingInfoNew(BlastHSPCullingParamsNew(
            hit_opts, &copts, 0, TRUE));
    } else {
        BlastHSPBestHitOptions bopts;
        bopts.overhang = overhang;
        bopts.score_edge = score_edge;
        winfo = BlastHSPBestHitInfoNew(BlastHSPBestHitParamsNew(
            hit_opts, &bopts, 0, TRUE));
    }
    BlastHSPWriter* writer = BlastHSPWriterNew(&winfo, qinfo);
    BlastHSPResults* results = Blast_HSPResultsNew(1);
    (*writer->InitFnPtr)(writer->data, results);

    /* read HSPs; "oid N" lines start a new subject's list */
    Int4 cur_oid = 0;
    BlastHSPList* lst = Blast_HSPListNew(0);
    lst->oid = 0;
    char line[256];
    while (fgets(line, sizeof line, stdin)) {
        Int4 b, e, s;
        double ev;
        Int4 oid;
        if (sscanf(line, "oid %d", &oid) == 1) {
            if (lst->hspcnt)
                (*writer->RunFnPtr)(writer->data, lst);
            else
                Blast_HSPListFree(lst);
            lst = Blast_HSPListNew(0);
            lst->oid = oid;
            cur_oid = oid;
            continue;
        }
        if (sscanf(line, "%d %d %d %lf", &b, &e, &s, &ev) != 4)
            continue;
        BlastHSP* h = Blast_HSPNew();
        h->query.offset = b;
        h->query.end = e;
        h->query.frame = 1;
        h->subject.offset = b;
        h->subject.end = e;
        h->subject.frame = 1;
        h->score = s;
        h->evalue = ev;
        h->context = 0;
        Blast_HSPListSaveHSP(lst, h);
    }
    if (lst->hspcnt)
        (*writer->RunFnPtr)(writer->data, lst);
    else
        Blast_HSPListFree(lst);

    (*writer->FinalFnPtr)(writer->data, results);

    {
        int qi, si, k;
        for (qi = 0; qi < results->num_queries; qi++) {
            BlastHitList* hl = results->hitlist_array[qi];
            if (!hl) continue;
            for (si = 0; si < hl->hsplist_count; si++) {
                BlastHSPList* l = hl->hsplist_array[si];
                for (k = 0; k < l->hspcnt; k++) {
                    BlastHSP* h = l->hsp_array[k];
                    if (h)
                        printf("%d %d %d %d\n", (int) l->oid,
                               (int) h->query.offset,
                               (int) h->query.end, (int) h->score);
                }
            }
        }
    }
    return 0;
}
