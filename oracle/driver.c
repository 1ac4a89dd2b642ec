/* driver.c — NCBI-BLAST 2.2.28 parity-oracle driver for gblastn_tpu.
 *
 * Compiles against the UNMODIFIED reference C core
 * (/root/reference/c++/src/algo/blast/core — pure C, its only external
 * dependency is corelib/ncbitype.h which we satisfy with shim/ncbiconf.h)
 * and runs a complete nucleotide search (megablast / blastn task) on
 * FASTA inputs, printing the final traceback HSPs and stage diagnostics.
 *
 * This file is ORIGINAL code: it re-implements, in plain C, the setup
 * choreography that the reference performs in its C++ api layer, so the
 * genuine reference engine (lookup build, scanning, extension, traceback,
 * statistics — all compiled from the reference tree) produces the answers.
 * Mirrored logic and where it lives in the reference:
 *   - query context layout / sentinel packing:
 *       src/algo/blast/api/blast_setup_cxx.cpp:69  (s_QueryInfo_SetContext)
 *       src/algo/blast/api/blast_setup_cxx.cpp:SetupQueries_OMF
 *   - subject block construction (blastna + packed ncbi2na):
 *       src/algo/blast/api/blast_setup_cxx.cpp:707 (SetupSubjects_OMF)
 *       src/algo/blast/api/blast_setup_cxx.cpp:1100 (CompressNcbi2na)
 *   - in-memory BlastSeqSrc:
 *       src/algo/blast/api/seqsrc_multiseq.cpp (function-for-function),
 *       with real total-length/num-seqs statistics as a database source
 *       would report (src/algo/blast/api/seqsrc_seqdb.cpp)
 *   - task defaults:
 *       src/algo/blast/api/blast_nucl_options.cpp:58-162
 *   - search driver:
 *       src/algo/blast/api/setup_factory.cpp:122,187,270 +
 *       src/algo/blast/core/blast_engine.c:1462 (Blast_RunFullSearch)
 *
 * Output (tab-separated, one record per line):
 *   QUERY <index> <id> <length>
 *   SUBJ  <oid> <id> <length>
 *   HSP   <query_index> <context> <oid> <q_off> <q_end> <s_off> <s_end>
 *         <score> <num_ident> <bit_score %.17g> <evalue %.17g> <ops>
 *   DIAG  <lookup_hits> <init_extends> <good_init_extends>
 *         <gapped_extensions> <good_gapped_extensions>
 *   CUTOFF <x_drop_ungapped> <x_drop_gap> <x_drop_gap_final> <ungapped_cutoff> <cutoff_score>
 * where <ops> is the GapEditScript as comma-separated op:num pairs
 * (op codes: eGapAlignDel=0 / eGapAlignSub=3 / eGapAlignIns=6).
 */

#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <ctype.h>

#include <algo/blast/core/blast_def.h>
#include <algo/blast/core/blast_program.h>
#include <algo/blast/core/blast_options.h>
#include <algo/blast/core/blast_encoding.h>
#include <algo/blast/core/blast_query_info.h>
#include <algo/blast/core/blast_util.h>
#include <algo/blast/core/blast_setup.h>
#include <algo/blast/core/blast_filter.h>
#include <algo/blast/core/lookup_wrap.h>
#include <algo/blast/core/blast_seqsrc.h>
#include <algo/blast/core/blast_seqsrc_impl.h>
#include <algo/blast/core/blast_hits.h>
#include <algo/blast/core/blast_hspstream.h>
#include <algo/blast/core/hspfilter_collector.h>
#include <algo/blast/core/hspfilter_culling.h>
#include <algo/blast/core/hspfilter_besthit.h>
#include <algo/blast/core/blast_diagnostics.h>
#include <algo/blast/core/blast_engine.h>
#include <algo/blast/core/gapinfo.h>

/* ------------------------------------------------------------------ */
/* FASTA reading                                                       */
/* ------------------------------------------------------------------ */

typedef struct FastaSeq {
    char* id;        /* first word of the defline */
    Uint1* iupac;    /* uppercased residue letters */
    Int4 length;
} FastaSeq;

typedef struct FastaSet {
    FastaSeq* seqs;
    Int4 count;
} FastaSet;

static void die(const char* msg) {
    fprintf(stderr, "oracle: %s\n", msg);
    exit(2);
}

static FastaSet read_fasta(const char* path) {
    FILE* f = fopen(path, "rb");
    if (!f) { fprintf(stderr, "oracle: cannot open %s\n", path); exit(2); }
    FastaSet set; set.seqs = NULL; set.count = 0;
    Int4 cap = 0;
    char line[1 << 16];
    Uint1* buf = NULL; size_t blen = 0, bcap = 0;
    char* cur_id = NULL;

    while (fgets(line, sizeof line, f)) {
        if (line[0] == '>') {
            if (cur_id) {
                if (set.count == cap) {
                    cap = cap ? cap * 2 : 16;
                    set.seqs = (FastaSeq*) realloc(set.seqs, cap * sizeof(FastaSeq));
                }
                set.seqs[set.count].id = cur_id;
                set.seqs[set.count].iupac = buf;
                set.seqs[set.count].length = (Int4) blen;
                set.count++;
                buf = NULL; blen = bcap = 0;
            }
            char* p = line + 1;
            while (*p && isspace((unsigned char)*p)) p++;
            char* e = p;
            while (*e && !isspace((unsigned char)*e)) e++;
            cur_id = (char*) malloc(e - p + 1);
            memcpy(cur_id, p, e - p);
            cur_id[e - p] = 0;
        } else {
            for (char* p = line; *p; ++p) {
                if (isspace((unsigned char)*p)) continue;
                if (blen == bcap) {
                    bcap = bcap ? bcap * 2 : 4096;
                    buf = (Uint1*) realloc(buf, bcap);
                }
                buf[blen++] = (Uint1) toupper((unsigned char)*p);
            }
        }
    }
    if (cur_id) {
        if (set.count == cap) {
            cap = cap ? cap + 1 : 1;
            set.seqs = (FastaSeq*) realloc(set.seqs, cap * sizeof(FastaSeq));
        }
        set.seqs[set.count].id = cur_id;
        set.seqs[set.count].iupac = buf;
        set.seqs[set.count].length = (Int4) blen;
        set.count++;
    }
    fclose(f);
    if (set.count == 0) die("empty FASTA");
    return set;
}

/* ------------------------------------------------------------------ */
/* Encoding helpers                                                    */
/* ------------------------------------------------------------------ */

/* ncbi4na complement: A=1,C=2,G=4,T=8 — complement is the 4-bit
 * reversal (A<->T, C<->G), ambiguity codes follow automatically. */
static Uint1 s_Complement4na(Uint1 v) {
    return (Uint1) (((v & 1) << 3) | ((v & 2) << 1) | ((v & 4) >> 1) | ((v & 8) >> 3));
}

static Uint1 s_Iupac4na(Uint1 c) {
    Uint1 v = IUPACNA_TO_NCBI4NA[c];
    if (v == 0xff) {
        /* treat unknown residues (incl. '-') as N, as makeblastdb does
         * for stray characters */
        v = 15;
    }
    return v;
}

/* blastna for one strand of a sequence */
static void s_FillBlastna(const FastaSeq* fs, int minus, Uint1* out) {
    Int4 i;
    for (i = 0; i < fs->length; i++) {
        Uint1 v = s_Iupac4na(fs->iupac[minus ? fs->length - 1 - i : i]);
        if (minus) v = s_Complement4na(v);
        out[i] = NCBI4NA_TO_BLASTNA[v];
    }
}

/* Packed ncbi2na of the plus strand, with the reference's base-count
 * trailer in the final byte (blast_setup_cxx.cpp:1100 CompressNcbi2na).
 * The reference RANDOMIZES ambiguous residues when compressing
 * (CSeqVector ncbi2na coding), then corrects HSP scores by re-evaluating
 * against the uncompressed sequence — so packed values at ambiguity
 * positions are not part of the parity contract. We pick each
 * ambiguity's lowest constituent base, deterministically. */
static Uint1* s_Pack2na(const FastaSeq* fs) {
    static const Uint1 k4naTo2na[16] = {
        /* -  */ 0, /* A */ 0, /* C */ 1, /* M */ 0, /* G */ 2, /* R */ 0,
        /* S  */ 1, /* V */ 0, /* T */ 3, /* W */ 0, /* Y */ 1, /* H */ 0,
        /* K  */ 2, /* D */ 0, /* B */ 1, /* N */ 0
    };
    Int4 nbytes = fs->length / 4 + 1;
    Uint1* out = (Uint1*) calloc(nbytes, 1);
    Int4 i;
    for (i = 0; i < fs->length; i++) {
        Uint1 b2 = k4naTo2na[s_Iupac4na(fs->iupac[i])];
        out[i / 4] |= (Uint1) (b2 << (6 - 2 * (i % 4)));
    }
    out[nbytes - 1] |= (Uint1) (fs->length % 4);
    return out;
}

/* ------------------------------------------------------------------ */
/* Query setup (mirrors SetupQueryInfo_OMF / SetupQueries_OMF)         */
/* ------------------------------------------------------------------ */

static void s_SetContext(BlastQueryInfo* qinfo, Uint4 index, Uint4 length) {
    /* blast_setup_cxx.cpp:69 s_QueryInfo_SetContext */
    if (index) {
        Uint4 prev_loc = qinfo->contexts[index - 1].query_offset;
        Uint4 prev_len = qinfo->contexts[index - 1].query_length;
        Uint4 shift = prev_len ? prev_len + 1 : 0;
        qinfo->contexts[index].query_offset = prev_loc + shift;
    } else {
        qinfo->contexts[0].query_offset = 0;
    }
    qinfo->contexts[index].query_length = length;
    if (length == 0)
        qinfo->contexts[index].is_valid = FALSE;
}

static void s_SetupQueries(const FastaSet* queries, Int4 strand,
                           BlastQueryInfo** qinfo_out,
                           BLAST_SequenceBlk** qblk_out) {
    Int4 i;
    BlastQueryInfo* qinfo = BlastQueryInfoNew(eBlastTypeBlastn, queries->count);
    Uint4 max_length = 0;
    for (i = 0; i < queries->count; i++) {
        Uint4 len = (Uint4) queries->seqs[i].length;
        /* strand restriction: the excluded strand's context gets length
         * 0 and is_valid FALSE (SetupQueryInfo_OMF for eNa_strand_plus/
         * minus, blast_setup_cxx.cpp) */
        s_SetContext(qinfo, 2 * i, (strand & 1) ? len : 0);
        s_SetContext(qinfo, 2 * i + 1, (strand & 2) ? len : 0);
        if (len > max_length) max_length = len;
    }
    qinfo->max_length = max_length;

    int buflen = QueryInfo_GetSeqBufLen(qinfo);
    Uint1* buf = (Uint1*) calloc(buflen + 1, 1);
    const Uint1 kSentinel = 15; /* blastna sentinel (eBlastEncodingNucleotide) */
    buf[0] = kSentinel;
    for (i = 0; i < 2 * queries->count; i++) {
        Uint4 len = qinfo->contexts[i].query_length;
        if (len == 0) continue;
        const FastaSeq* fs = &queries->seqs[i / 2];
        Int4 off = qinfo->contexts[i].query_offset;
        /* buffer layout: query_offset indexes into (buf+1); each context is
         * preceded and followed by a sentinel byte (SetupQueries_OMF) */
        buf[off] = kSentinel;
        s_FillBlastna(fs, i & 1, buf + off + 1);
        buf[off + (Int4) len + 1] = kSentinel;
    }
    BLAST_SequenceBlk* qblk = NULL;
    if (BlastSeqBlkNew(&qblk) < 0) die("query seq blk");
    BlastSeqBlkSetSequence(qblk, buf, buflen - 2);
    qblk->lcase_mask = NULL;
    qblk->lcase_mask_allocated = FALSE;
    *qinfo_out = qinfo;
    *qblk_out = qblk;
}

/* ------------------------------------------------------------------ */
/* Subject setup + BlastSeqSrc over in-memory sequence blocks          */
/* (mirrors seqsrc_multiseq.cpp with database-style statistics)        */
/* ------------------------------------------------------------------ */

typedef struct OracleDb {
    BLAST_SequenceBlk** blocks;
    Int4 count;
    Int4 max_len;
    Int8 total_len;
} OracleDb;

static OracleDb* s_OracleDbNew(const FastaSet* subjects) {
    OracleDb* db = (OracleDb*) calloc(1, sizeof(OracleDb));
    db->count = subjects->count;
    db->blocks = (BLAST_SequenceBlk**) calloc(db->count, sizeof(void*));
    Int4 i;
    for (i = 0; i < db->count; i++) {
        const FastaSeq* fs = &subjects->seqs[i];
        BLAST_SequenceBlk* blk = NULL;
        if (BlastSeqBlkNew(&blk) < 0) die("subject seq blk");
        /* blastna with sentinels (traceback encoding) */
        Uint1* una = (Uint1*) malloc(fs->length + 2);
        una[0] = 15;
        s_FillBlastna(fs, 0, una + 1);
        una[fs->length + 1] = 15;
        BlastSeqBlkSetSequence(blk, una, fs->length);
        /* packed ncbi2na (scanning encoding) */
        BlastSeqBlkSetCompressedSequence(blk, s_Pack2na(fs));
        blk->num_seq_ranges = 0;
        blk->lcase_mask = NULL;
        blk->lcase_mask_allocated = FALSE;
        db->blocks[i] = blk;
        if (fs->length > db->max_len) db->max_len = fs->length;
        db->total_len += fs->length;
    }
    return db;
}

static Int4 s_OracleGetMaxLen(void* h, void* x) { (void)x; return ((OracleDb*)h)->max_len; }
static Int4 s_OracleGetNumSeqs(void* h, void* x) { (void)x; return ((OracleDb*)h)->count; }
static Int4 s_OracleGetNumSeqsStats(void* h, void* x) { (void)h; (void)x; return 0; }
static Int8 s_OracleGetTotLen(void* h, void* x) { (void)x; return ((OracleDb*)h)->total_len; }
static Int8 s_OracleGetTotLenStats(void* h, void* x) { (void)h; (void)x; return 0; }
static Int4 s_OracleGetAvgLen(void* h, void* x) {
    OracleDb* db = (OracleDb*) h; (void)x;
    return db->count ? (Int4)(db->total_len / db->count) : 0;
}
static Int4 s_OracleGetMinLen(void* h, void* x) {
    OracleDb* db = (OracleDb*) h; (void)x;
    Int4 m = INT4_MAX, i;
    for (i = 0; i < db->count; i++)
        if (db->blocks[i]->length < m) m = db->blocks[i]->length;
    return m;
}
static const char* s_OracleGetName(void* h, void* x) { (void)h; (void)x; return "oracle_db"; }
static Boolean s_OracleGetIsProt(void* h, void* x) { (void)h; (void)x; return FALSE; }

static Int2 s_OracleGetSequence(void* h, BlastSeqSrcGetSeqArg* args) {
    OracleDb* db = (OracleDb*) h;
    if (!args) return BLAST_SEQSRC_ERROR;
    if (args->oid >= db->count) return BLAST_SEQSRC_EOF;
    BlastSequenceBlkCopy(&args->seq, db->blocks[args->oid]);
    /* seqsrc_multiseq.cpp:s_MultiSeqGetSequence — pick the encoding view */
    if (args->encoding == eBlastEncodingNucleotide)
        args->seq->sequence = args->seq->sequence_start + 1;
    else if (args->encoding == eBlastEncodingNcbi4na)
        args->seq->sequence = args->seq->sequence_start;
    args->seq->oid = args->oid;
    return BLAST_SEQSRC_SUCCESS;
}

static void s_OracleReleaseSequence(void* h, BlastSeqSrcGetSeqArg* args) {
    (void)h;
    if (args->seq->sequence_start_allocated)
        sfree(args->seq->sequence_start);
}

static Int4 s_OracleGetSeqLen(void* h, void* oid_ptr) {
    OracleDb* db = (OracleDb*) h;
    return db->blocks[*(Int4*)oid_ptr]->length;
}

static Int2 s_OracleGetNextChunk(void* h, BlastSeqSrcIterator* itr) {
    OracleDb* db = (OracleDb*) h;
    if (itr->current_pos == UINT4_MAX) itr->current_pos = 0;
    if (itr->current_pos >= (Uint4) db->count) return BLAST_SEQSRC_EOF;
    return BLAST_SEQSRC_SUCCESS;
}

static Int4 s_OracleIteratorNext(void* h, BlastSeqSrcIterator* itr) {
    if (s_OracleGetNextChunk(h, itr) == BLAST_SEQSRC_EOF)
        return BLAST_SEQSRC_EOF;
    return (Int4) itr->current_pos++;
}

static void s_OracleResetChunkIter(void* h) { (void)h; }

static BlastSeqSrc* s_OracleSrcFree(BlastSeqSrc* src) {
    /* blocks are owned by main(); nothing to free here */
    return src ? NULL : NULL;
}

static BlastSeqSrc* s_OracleSrcNew(BlastSeqSrc* retval, void* args) {
    _BlastSeqSrcImpl_SetDeleteFnPtr(retval, &s_OracleSrcFree);
    _BlastSeqSrcImpl_SetDataStructure(retval, args);
    _BlastSeqSrcImpl_SetGetNumSeqs(retval, &s_OracleGetNumSeqs);
    _BlastSeqSrcImpl_SetGetNumSeqsStats(retval, &s_OracleGetNumSeqsStats);
    _BlastSeqSrcImpl_SetGetMaxSeqLen(retval, &s_OracleGetMaxLen);
    _BlastSeqSrcImpl_SetGetMinSeqLen(retval, &s_OracleGetMinLen);
    _BlastSeqSrcImpl_SetGetAvgSeqLen(retval, &s_OracleGetAvgLen);
    _BlastSeqSrcImpl_SetGetTotLen(retval, &s_OracleGetTotLen);
    _BlastSeqSrcImpl_SetGetTotLenStats(retval, &s_OracleGetTotLenStats);
    _BlastSeqSrcImpl_SetGetName(retval, &s_OracleGetName);
    _BlastSeqSrcImpl_SetGetIsProt(retval, &s_OracleGetIsProt);
    _BlastSeqSrcImpl_SetGetSequence(retval, &s_OracleGetSequence);
    _BlastSeqSrcImpl_SetGetSeqLen(retval, &s_OracleGetSeqLen);
    _BlastSeqSrcImpl_SetIterNext(retval, &s_OracleIteratorNext);
    _BlastSeqSrcImpl_SetResetChunkIterator(retval, &s_OracleResetChunkIter);
    _BlastSeqSrcImpl_SetReleaseSequence(retval, &s_OracleReleaseSequence);
    return retval;
}

/* ------------------------------------------------------------------ */
/* main                                                                */
/* ------------------------------------------------------------------ */

typedef struct Args {
    const char* query;
    const char* subject;
    const char* task;        /* "megablast" or "blastn" */
    double evalue;
    Int4 word_size;          /* 0 = task default */
    Int4 reward, penalty;    /* 0 = task default */
    Int4 gapopen, gapextend; /* INT4_MAX = task default */
    Int4 window_size;        /* -1 = task default */
    Int4 hitlist_size;
    int dust;                /* 1 = on (default), 0 = off */
    int mask_at_hash;        /* soft masking for seeding only (default 1) */
    int ungapped;            /* 1 = ungapped search */
    int no_greedy;           /* 1 = force DP extension (megablast) */
    Int4 min_raw_gapped_score;  /* 0 = derive from evalue */
    Int4 scan_range;         /* off-diagonal probe range (two-hit) */
    double perc_identity;    /* 0 = off */
    Int8 searchsp;           /* 0 = none */
    double xdrop_ungap, xdrop_gap, xdrop_gap_final; /* <0 = default */
    Int4 min_diag_separation; /* -1 = task default */
    Int4 template_length;    /* 0 = contiguous */
    Int4 template_type;      /* 0 coding, 1 optimal, 2 both */
    Int4 strand;             /* eNa_strand: 1 plus, 2 minus, 3 both */
    const char* qmask;       /* query mask intervals file (see below) */
    Int4 culling_limit;      /* 0 = off (collector writer) */
    double best_hit_overhang;    /* 0 = off */
    double best_hit_score_edge;
} Args;

static Args parse_args(int argc, char** argv) {
    Args a;
    memset(&a, 0, sizeof a);
    a.task = "megablast";
    a.evalue = 10.0;
    a.gapopen = INT4_MAX; a.gapextend = INT4_MAX;
    a.window_size = -1;
    a.hitlist_size = 500;
    a.dust = 1;
    a.mask_at_hash = 1;
    a.xdrop_ungap = -1; a.xdrop_gap = -1; a.xdrop_gap_final = -1;
    a.min_diag_separation = -1;
    a.strand = 3;
    int i;
    for (i = 1; i < argc; i++) {
        const char* k = argv[i];
        const char* v = (i + 1 < argc) ? argv[i + 1] : NULL;
        if (!strcmp(k, "-query")) { a.query = v; i++; }
        else if (!strcmp(k, "-subject")) { a.subject = v; i++; }
        else if (!strcmp(k, "-task")) { a.task = v; i++; }
        else if (!strcmp(k, "-evalue")) { a.evalue = atof(v); i++; }
        else if (!strcmp(k, "-word_size")) { a.word_size = atoi(v); i++; }
        else if (!strcmp(k, "-reward")) { a.reward = atoi(v); i++; }
        else if (!strcmp(k, "-penalty")) { a.penalty = atoi(v); i++; }
        else if (!strcmp(k, "-gapopen")) { a.gapopen = atoi(v); i++; }
        else if (!strcmp(k, "-gapextend")) { a.gapextend = atoi(v); i++; }
        else if (!strcmp(k, "-window_size")) { a.window_size = atoi(v); i++; }
        else if (!strcmp(k, "-hitlist_size")) { a.hitlist_size = atoi(v); i++; }
        else if (!strcmp(k, "-dust")) { a.dust = !strcmp(v, "yes"); i++; }
        else if (!strcmp(k, "-soft_masking")) { a.mask_at_hash = !strcmp(v, "true"); i++; }
        else if (!strcmp(k, "-ungapped")) { a.ungapped = 1; }
        else if (!strcmp(k, "-no_greedy")) { a.no_greedy = 1; }
        else if (!strcmp(k, "-min_raw_gapped_score")) { a.min_raw_gapped_score = atoi(v); i++; }
        else if (!strcmp(k, "-scan_range")) { a.scan_range = atoi(v); i++; }
        else if (!strcmp(k, "-perc_identity")) { a.perc_identity = atof(v); i++; }
        else if (!strcmp(k, "-searchsp")) { a.searchsp = atoll(v); i++; }
        else if (!strcmp(k, "-xdrop_ungap")) { a.xdrop_ungap = atof(v); i++; }
        else if (!strcmp(k, "-xdrop_gap")) { a.xdrop_gap = atof(v); i++; }
        else if (!strcmp(k, "-xdrop_gap_final")) { a.xdrop_gap_final = atof(v); i++; }
        else if (!strcmp(k, "-min_diag_separation")) { a.min_diag_separation = atoi(v); i++; }
        else if (!strcmp(k, "-culling_limit")) { a.culling_limit = atoi(v); i++; }
        else if (!strcmp(k, "-best_hit_overhang")) { a.best_hit_overhang = atof(v); i++; }
        else if (!strcmp(k, "-best_hit_score_edge")) { a.best_hit_score_edge = atof(v); i++; }
        else if (!strcmp(k, "-template_length")) { a.template_length = atoi(v); i++; }
        else if (!strcmp(k, "-template_type")) {
            a.template_type = !strcmp(v, "optimal") ? 1 :
                              !strcmp(v, "coding_and_optimal") ? 2 : 0;
            i++;
        }
        else if (!strcmp(k, "-strand")) {
            a.strand = !strcmp(v, "plus") ? 1 :
                       !strcmp(v, "minus") ? 2 : 3;
            i++;
        }
        else if (!strcmp(k, "-qmask")) { a.qmask = v; i++; }
        else { fprintf(stderr, "oracle: unknown arg %s\n", k); exit(2); }
    }
    if (!a.query || !a.subject) die("-query and -subject are required");
    return a;
}

int main(int argc, char** argv) {
    Args a = parse_args(argc, argv);
    int is_dc = !strcmp(a.task, "dc-megablast");
    if (is_dc && a.template_length == 0)
        a.template_length = 18;   /* CDiscNucleotideOptionsHandle */
    int is_megablast = !strcmp(a.task, "megablast") || is_dc;
    const EBlastProgramType kProgram = eBlastTypeBlastn;

    /* task defaults: blast_nucl_options.cpp:58-162 */
    Int4 word_size = a.word_size ? a.word_size : (is_megablast && !is_dc ? 28 : 11);
    Int4 reward = a.reward ? a.reward : (is_megablast && !is_dc ? 1 : 2);
    Int4 penalty = a.penalty ? a.penalty : (is_megablast && !is_dc ? -2 : -3);
    Int4 gapopen = (a.gapopen != INT4_MAX) ? a.gapopen : (is_megablast && !is_dc ? 0 : 5);
    Int4 gapextend = (a.gapextend != INT4_MAX) ? a.gapextend : (is_megablast && !is_dc ? 0 : 2);
    Int4 window_size = (a.window_size >= 0) ? a.window_size : (is_dc ? 40 : 0);
    /* greedy for plain megablast regardless of gap costs -- the CLI's
     * CMegaBlastOptionsHandle sets eGreedyScoreOnly/eGreedyTbck
     * (blast_nucl_options.cpp:155 SetMBGappedExtensionDefaults) and no
     * flag but -no_greedy changes it (blast_args.cpp:605); non-zero
     * costs run the AFFINE greedy (BLAST_AffineGreedyAlign).
     * dc-megablast is DP (disc_nucl_options.cpp:77) */
    int greedy = is_megablast && !is_dc && !a.no_greedy;
    double xdrop_ungap = (a.xdrop_ungap >= 0) ? a.xdrop_ungap : 20;   /* BLAST_UNGAPPED_X_DROPOFF_NUCL */
    double xdrop_gap = (a.xdrop_gap >= 0) ? a.xdrop_gap : (greedy ? 25 : 30);
    double xdrop_gap_final = (a.xdrop_gap_final >= 0) ? a.xdrop_gap_final : 100;
    Int4 min_diag_separation =
        (a.min_diag_separation >= 0) ? a.min_diag_separation
                                     : (is_megablast ? 6 : 50);

    FastaSet queries = read_fasta(a.query);
    FastaSet subjects = read_fasta(a.subject);

    /* --- options --------------------------------------------------- */
    LookupTableOptions* lut_opts = NULL;
    QuerySetUpOptions* query_opts = NULL;
    BlastInitialWordOptions* word_opts = NULL;
    BlastExtensionOptions* ext_opts = NULL;
    BlastHitSavingOptions* hit_opts = NULL;
    BlastScoringOptions* score_opts = NULL;
    BlastEffectiveLengthsOptions* eff_opts = NULL;
    PSIBlastOptions* psi_opts = NULL;
    BlastDatabaseOptions* db_opts = NULL;
    if (BLAST_InitDefaultOptions(kProgram, &lut_opts, &query_opts, &word_opts,
                                 &ext_opts, &hit_opts, &score_opts, &eff_opts,
                                 &psi_opts, &db_opts) != 0)
        die("BLAST_InitDefaultOptions failed");

    BLAST_FillLookupTableOptions(lut_opts, kProgram,
                                 is_megablast ? TRUE : FALSE,
                                 0 /* threshold */, word_size);
    if (is_dc) {
        /* CDiscNucleotideOptionsHandle::SetMBLookupTableDefaults */
        lut_opts->mb_template_length = (Uint1) a.template_length;
        lut_opts->mb_template_type = (Uint1) a.template_type;
    }
    BLAST_FillScoringOptions(score_opts, kProgram, greedy ? TRUE : FALSE,
                             penalty, reward, NULL, gapopen, gapextend);
    score_opts->gapped_calculation = a.ungapped ? FALSE : TRUE;
    BLAST_FillInitialWordOptions(word_opts, kProgram, window_size, xdrop_ungap);
    if (a.scan_range) word_opts->scan_range = a.scan_range;
    BLAST_FillExtensionOptions(ext_opts, kProgram, greedy ? 1 : 0,
                               xdrop_gap, xdrop_gap_final);
    BLAST_FillHitSavingOptions(hit_opts, a.evalue, a.hitlist_size,
                               score_opts->gapped_calculation,
                               a.culling_limit, min_diag_separation);
    if (a.min_raw_gapped_score)
        hit_opts->cutoff_score = a.min_raw_gapped_score;
    if (a.perc_identity > 0)
        hit_opts->percent_identity = a.perc_identity;
    query_opts->strand_option = a.strand;
    if (a.dust) {
        SBlastFilterOptionsNew(&query_opts->filtering_options, eDust);
        query_opts->filtering_options->mask_at_hash =
            a.mask_at_hash ? TRUE : FALSE;
    }
    if (a.searchsp > 0) {
        Int8 sp = a.searchsp;
        BLAST_FillEffectiveLengthsOptions(eff_opts, 0, 0, &sp, 1);
    }

    /* --- query setup ------------------------------------------------ */
    BlastQueryInfo* qinfo = NULL;
    BLAST_SequenceBlk* qblk = NULL;
    s_SetupQueries(&queries, a.strand, &qinfo, &qblk);

    /* Query masking locations (the reference computes dust in its C++
     * api layer — dust_filter.cpp:Blast_FindDustFilterLoc — and injects
     * the locations into the engine via the query block's mask array,
     * blast_setup_cxx.cpp:s_AddMask; the C core's own BlastSetUp_Filter
     * only implements SEG). The harness passes the dust intervals in a
     * file of "query_index start end" lines (0-based half-open,
     * plus-strand coordinates; both strands' contexts receive the same
     * plus-strand list, as s_AddMask does for eNa_strand_both). */
    if (a.qmask) {
        FILE* mf = fopen(a.qmask, "r");
        if (!mf) die("cannot open -qmask file");
        BlastMaskLoc* ml = BlastMaskLocNew(queries.count * 2);
        int qi_in; long s_in, e_in;
        while (fscanf(mf, "%d %ld %ld", &qi_in, &s_in, &e_in) == 3) {
            if (qi_in < 0 || qi_in >= queries.count) die("bad -qmask query index");
            /* BlastSeqLoc intervals are inclusive [left, right] */
            BlastSeqLocNew(&ml->seqloc_array[2 * qi_in], (Int4) s_in, (Int4) e_in - 1);
            BlastSeqLocNew(&ml->seqloc_array[2 * qi_in + 1], (Int4) s_in, (Int4) e_in - 1);
        }
        fclose(mf);
        qblk->lcase_mask = ml;
        qblk->lcase_mask_allocated = TRUE;
    }

    /* --- score block + filtering (setup_factory.cpp:CreateScoreBlock) */
    BlastSeqLoc* lookup_segments = NULL;
    BlastMaskLoc* mask_loc = NULL;
    BlastScoreBlk* sbp = NULL;
    Blast_Message* msg = NULL;
    if (BLAST_MainSetUp(kProgram, query_opts, score_opts, qblk, qinfo, 1.0,
                        &lookup_segments, &mask_loc, &sbp, &msg, NULL) != 0) {
        fprintf(stderr, "oracle: BLAST_MainSetUp failed: %s\n",
                msg && msg->message ? msg->message : "?");
        return 2;
    }

    /* --- lookup table (setup_factory.cpp:CreateLookupTable) ---------- */
    LookupTableWrap* lookup_wrap = NULL;
    if (LookupTableWrapInit(qblk, lut_opts, query_opts, lookup_segments, sbp,
                            &lookup_wrap, NULL, &msg) != 0) {
        fprintf(stderr, "oracle: LookupTableWrapInit failed: %s\n",
                msg && msg->message ? msg->message : "?");
        return 2;
    }

    /* --- subjects + seqsrc ------------------------------------------ */
    OracleDb* db = s_OracleDbNew(&subjects);
    BlastSeqSrcNewInfo src_info;
    src_info.constructor = &s_OracleSrcNew;
    src_info.ctor_argument = db;
    BlastSeqSrc* seq_src = BlastSeqSrcNew(&src_info);
    if (!seq_src) die("BlastSeqSrcNew failed");

    /* --- HSP stream: collector, culling, or best-hit writer ----------
     * (the writer selection of CSetupFactory::CreateHspStream via
     * hsp_filt_opt, setup_factory.cpp:270) */
    BlastHSPWriterInfo* winfo = NULL;
    if (a.culling_limit > 0) {
        BlastHSPCullingOptions copts;
        copts.max_hits = a.culling_limit;
        BlastHSPCullingParams* cull_params = BlastHSPCullingParamsNew(
            hit_opts, &copts, ext_opts->compositionBasedStats,
            score_opts->gapped_calculation);
        winfo = BlastHSPCullingInfoNew(cull_params);
    } else if (a.best_hit_overhang > 0) {
        BlastHSPBestHitOptions bopts;
        bopts.overhang = a.best_hit_overhang;
        bopts.score_edge = a.best_hit_score_edge;
        BlastHSPBestHitParams* bh_params = BlastHSPBestHitParamsNew(
            hit_opts, &bopts, ext_opts->compositionBasedStats,
            score_opts->gapped_calculation);
        winfo = BlastHSPBestHitInfoNew(bh_params);
    } else {
        BlastHSPCollectorParams* cparams = BlastHSPCollectorParamsNew(
            hit_opts, ext_opts->compositionBasedStats,
            score_opts->gapped_calculation);
        winfo = BlastHSPCollectorInfoNew(cparams);
    }
    BlastHSPWriter* writer = BlastHSPWriterNew(&winfo, qinfo);
    BlastHSPStream* hsp_stream =
        BlastHSPStreamNew(kProgram, ext_opts, TRUE, qinfo->num_queries, writer);

    BlastDiagnostics* diagnostics = Blast_DiagnosticsInit();
    BlastHSPResults* results = NULL;

    /* Optional per-context cutoff dump: replicate the engine's own
     * parameter construction (BLAST_PreliminarySearchEngine,
     * blast_engine.c:1147) without disturbing the search. */
    if (getenv("GBLASTN_ORACLE_DUMP_CUTOFFS")) {
        BlastExtensionParameters* xp = NULL;
        BlastHitSavingParameters* hp = NULL;
        BlastInitialWordParameters* wp = NULL;
        BlastEffectiveLengthsParameters* ep = NULL;
        /* effective lengths first (BLAST_GapAlignSetUp order) */
        BlastEffectiveLengthsParametersNew(
            eff_opts, BlastSeqSrcGetTotLen(seq_src),
            BlastSeqSrcGetNumSeqs(seq_src), &ep);
        BLAST_CalcEffLengths(kProgram, score_opts, ep, sbp, qinfo, NULL);
        BlastExtensionParametersNew(kProgram, ext_opts, sbp, qinfo, &xp);
        BlastHitSavingParametersNew(kProgram, hit_opts, sbp, qinfo,
                                    (Int4) BlastSeqSrcGetAvgSeqLen(seq_src),
                                    &hp);
        BlastInitialWordParametersNew(kProgram, word_opts, hp,
                                      lookup_wrap, sbp, qinfo,
                                      BlastSeqSrcGetAvgSeqLen(seq_src),
                                      &wp);
        Int4 c;
        for (c = qinfo->first_context; c <= qinfo->last_context; c++) {
            printf("CTXCUT\t%d\t%d\t%d\t%d\t%d\n", (int) c,
                   (int) wp->cutoffs[c].cutoff_score,
                   (int) wp->cutoffs[c].x_dropoff,
                   (int) wp->cutoffs[c].reduced_nucl_cutoff_score,
                   (int) hp->cutoffs[c].cutoff_score);
        }
        wp = BlastInitialWordParametersFree(wp);
        hp = BlastHitSavingParametersFree(hp);
        xp = BlastExtensionParametersFree(xp);
        ep = BlastEffectiveLengthsParametersFree(ep);
    }

    Int4 status = Blast_RunFullSearch(
        kProgram, qblk, qinfo, seq_src, sbp, score_opts, lookup_wrap,
        word_opts, ext_opts, hit_opts, eff_opts, psi_opts, db_opts,
        hsp_stream, NULL, diagnostics, &results, NULL, NULL);
    if (status != 0) {
        fprintf(stderr, "oracle: Blast_RunFullSearch failed: %d\n", (int)status);
        return 2;
    }

    /* --- output ------------------------------------------------------ */
    Int4 qi, si, hi;
    for (qi = 0; qi < queries.count; qi++)
        printf("QUERY\t%d\t%s\t%d\n", (int)qi, queries.seqs[qi].id,
               (int)queries.seqs[qi].length);
    for (si = 0; si < subjects.count; si++)
        printf("SUBJ\t%d\t%s\t%d\n", (int)si, subjects.seqs[si].id,
               (int)subjects.seqs[si].length);

    if (results) {
        for (qi = 0; qi < results->num_queries; qi++) {
            BlastHitList* hitlist = results->hitlist_array[qi];
            if (!hitlist) continue;
            for (si = 0; si < hitlist->hsplist_count; si++) {
                BlastHSPList* hsplist = hitlist->hsplist_array[si];
                if (!hsplist) continue;
                Blast_HSPListGetBitScores(
                    hsplist, score_opts->gapped_calculation, sbp);
                for (hi = 0; hi < hsplist->hspcnt; hi++) {
                    BlastHSP* hsp = hsplist->hsp_array[hi];
                    printf("HSP\t%d\t%d\t%d\t%d\t%d\t%d\t%d\t%d\t%d\t%.17g\t%.17g\t",
                           (int)qi, (int)hsp->context, (int)hsplist->oid,
                           (int)hsp->query.offset, (int)hsp->query.end,
                           (int)hsp->subject.offset, (int)hsp->subject.end,
                           (int)hsp->score, (int)hsp->num_ident,
                           hsp->bit_score, hsp->evalue);
                    if (hsp->gap_info) {
                        Int4 k;
                        for (k = 0; k < hsp->gap_info->size; k++)
                            printf("%s%d:%d", k ? "," : "",
                                   (int)hsp->gap_info->op_type[k],
                                   (int)hsp->gap_info->num[k]);
                    } else {
                        printf("-");
                    }
                    /* reference-computed tabular field values: alignment
                     * length / gaps / gap opens (Blast_HSPCalcLengthAndGaps,
                     * blast_hits.c) and 1-based strand-adjusted endpoints
                     * (Blast_HSPGetAdjustedOffsets) -- consumed by
                     * tests/test_format_bytes.py for -outfmt 6 byte parity */
                    {
                        Int4 aln_len = 0, gaps = 0, gap_opens = 0;
                        Int4 qs1 = 0, qe1 = 0, ss1 = 0, se1 = 0;
                        Blast_HSPCalcLengthAndGaps(hsp, &aln_len, &gaps,
                                                   &gap_opens);
                        Blast_HSPGetAdjustedOffsets(
                            kProgram, hsp,
                            (Int4) qinfo->contexts[hsp->context].query_length,
                            (Int4) subjects.seqs[hsplist->oid].length,
                            &qs1, &qe1, &ss1, &se1);
                        printf("\t%d\t%d\t%d\t%d\t%d\t%d\t%d",
                               (int)aln_len, (int)gaps, (int)gap_opens,
                               (int)qs1, (int)qe1, (int)ss1, (int)se1);
                    }
                    printf("\n");
                }
            }
        }
    }

    if (diagnostics && diagnostics->ungapped_stat && diagnostics->gapped_stat) {
        printf("DIAG\t%lld\t%d\t%d\t%d\t%d\n",
               (long long) diagnostics->ungapped_stat->lookup_hits,
               (int) diagnostics->ungapped_stat->init_extends,
               (int) diagnostics->ungapped_stat->good_init_extends,
               (int) diagnostics->gapped_stat->extensions,
               (int) diagnostics->gapped_stat->good_extensions);
    }
    if (diagnostics && diagnostics->cutoffs) {
        printf("CUTOFF\t%d\t%d\t%d\t%d\t%d\n",
               (int) diagnostics->cutoffs->x_drop_ungapped,
               (int) diagnostics->cutoffs->x_drop_gap,
               (int) diagnostics->cutoffs->x_drop_gap_final,
               (int) diagnostics->cutoffs->ungapped_cutoff,
               (int) diagnostics->cutoffs->cutoff_score);
    }
    fflush(stdout);
    return 0;
}
