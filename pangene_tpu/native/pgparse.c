/* Native PAF ingest for pangene_tpu.
 *
 * Streams a gzip miniprot PAF file into struct-of-arrays buffers consumed
 * by the Python layer through ctypes. Replicates the reference parser's
 * record-level semantics (read.c:107-242) including side effects of dropped
 * records (per-file name interning order, rank counting, contig
 * registration) and the long-double expl() score adjustment (read.c:216).
 *
 * This file is an original implementation (hash map, line reader and CIGAR
 * walk written fresh); behavior contracts are cited against the reference.
 */
#include <assert.h>
#include <math.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <zlib.h>
#ifdef PG_HAVE_LIBDEFLATE
#include <libdeflate.h>
#endif

/* ---------------- growable buffers ---------------- */

typedef struct { char *p; size_t n, cap; } buf_t;

static void buf_reserve(buf_t *b, size_t extra, size_t elem)
{
    if ((b->n + extra) * elem > b->cap) {
        size_t need = (b->n + extra) * elem;
        size_t cap = b->cap ? b->cap : 4096;
        while (cap < need) cap <<= 1;
        b->p = (char *)realloc(b->p, cap);
        b->cap = cap;
    }
}

#define PUSH(b, type, val) do { \
        buf_reserve(&(b), 1, sizeof(type)); \
        ((type *)(b).p)[(b).n++] = (val); \
    } while (0)

/* ---------------- string intern (per-file, insertion-ordered ids) -------- */

typedef struct {
    uint32_t *slots;      /* index+1 into order arrays, 0 = empty */
    uint32_t n_slots;
    uint32_t n;           /* number of interned strings */
    buf_t blob;           /* all names, NUL separated */
    buf_t offs;           /* int64 offset of each name in blob */
    buf_t lens;           /* int32 length */
    buf_t aux;            /* int32 per-name counter (rank) / value */
} intern_t;

static uint64_t str_hash(const char *s, int len)
{
    uint64_t h = 1469598103934665603ull;
    int i;
    for (i = 0; i < len; ++i) h = (h ^ (unsigned char)s[i]) * 1099511628211ull;
    return h;
}

static void intern_init(intern_t *t)
{
    memset(t, 0, sizeof(*t));
    t->n_slots = 1024;
    t->slots = (uint32_t *)calloc(t->n_slots, 4);
}

static void intern_free(intern_t *t)
{
    free(t->slots);
    free(t->blob.p); free(t->offs.p); free(t->lens.p); free(t->aux.p);
}

static void intern_rehash(intern_t *t)
{
    uint32_t new_n = t->n_slots << 1, i;
    uint32_t *ns = (uint32_t *)calloc(new_n, 4);
    for (i = 0; i < t->n_slots; ++i) {
        uint32_t id1 = t->slots[i];
        if (id1) {
            const char *s = t->blob.p + ((int64_t *)t->offs.p)[id1 - 1];
            int len = ((int32_t *)t->lens.p)[id1 - 1];
            uint64_t h = str_hash(s, len);
            uint32_t j = h & (new_n - 1);
            while (ns[j]) j = (j + 1) & (new_n - 1);
            ns[j] = id1;
        }
    }
    free(t->slots);
    t->slots = ns;
    t->n_slots = new_n;
}

/* returns id (0-based, insertion order); *absent set to 1 if new */
static uint32_t intern_put(intern_t *t, const char *s, int len, int *absent)
{
    uint64_t h = str_hash(s, len);
    uint32_t j = h & (t->n_slots - 1);
    if (t->n * 4 >= t->n_slots * 3) { intern_rehash(t); j = h & (t->n_slots - 1); }
    while (t->slots[j]) {
        uint32_t id = t->slots[j] - 1;
        const char *q = t->blob.p + ((int64_t *)t->offs.p)[id];
        if (((int32_t *)t->lens.p)[id] == len && memcmp(q, s, len) == 0) {
            *absent = 0;
            return id;
        }
        j = (j + 1) & (t->n_slots - 1);
    }
    *absent = 1;
    PUSH(t->offs, int64_t, (int64_t)t->blob.n);
    PUSH(t->lens, int32_t, len);
    PUSH(t->aux, int32_t, 0);
    buf_reserve(&t->blob, len + 1, 1);
    memcpy(t->blob.p + t->blob.n, s, len);
    t->blob.p[t->blob.n + len] = 0;
    t->blob.n += len + 1;
    t->slots[j] = ++t->n;
    return t->n - 1;
}

/* ---------------- cross-file intern session ----------------
 *
 * Interns protein and gene names GLOBALLY across all input files so hit
 * tables carry final global ids straight out of the parser (the reference
 * does the same with its d_gene/d_prot dicts, read.c:151-170). Rank is
 * still counted per file (read.c:170-171) via an epoch-tagged counter. */

typedef struct {
    intern_t prot;       /* global protein names */
    intern_t gene;       /* global gene names */
    buf_t prot_gid;      /* int32 global gene id per protein */
    buf_t rank_cnt;      /* int32 per protein: occurrences this file - 1 */
    buf_t rank_epoch;    /* int32 per protein: file epoch of rank_cnt */
    int32_t epoch;
    char delim;
} pg_sess_t;

pg_sess_t *pg_sess_new(char delim)
{
    pg_sess_t *s = (pg_sess_t *)calloc(1, sizeof(pg_sess_t));
    intern_init(&s->prot);
    intern_init(&s->gene);
    s->delim = delim;
    return s;
}

void pg_sess_free(pg_sess_t *s)
{
    if (!s) return;
    intern_free(&s->prot);
    intern_free(&s->gene);
    free(s->prot_gid.p); free(s->rank_cnt.p); free(s->rank_epoch.p);
    free(s);
}

int64_t pg_sess_n_prot(pg_sess_t *s) { return s->prot.n; }
int64_t pg_sess_n_gene(pg_sess_t *s) { return s->gene.n; }

const char *pg_sess_name_blob(pg_sess_t *s, int32_t which,
                              int64_t *blob_len, int64_t *n)
{
    intern_t *t = which ? &s->prot : &s->gene;
    *blob_len = (int64_t)t->blob.n;
    *n = (int64_t)t->n;
    return t->blob.p;
}

const int64_t *pg_sess_name_offs(pg_sess_t *s, int32_t which)
{
    intern_t *t = which ? &s->prot : &s->gene;
    return (const int64_t *)t->offs.p;
}

const int32_t *pg_sess_prot_gid_arr(pg_sess_t *s)
{
    return (const int32_t *)s->prot_gid.p;
}

/* ---------------- output record arrays ---------------- */

typedef struct {
    /* per input record (all records, side-effect stream) */
    buf_t r_name;    /* int32 protein name id (per-file, or global w/ sess) */
    buf_t r_qlen;    /* int32, -1 if field 1 missing */
    buf_t r_cid;     /* int32, -1 if field 5 not reached */
    buf_t r_ctglen;  /* int64, -1 if field 6 not reached */
    buf_t r_kept;    /* int8 */
    /* per kept hit */
    buf_t h_name;    /* int32 protein name id (per-file, or global w/ sess) */
    buf_t h_qs, h_qe, h_mlen, h_blen, h_rank, h_score_ori, h_score_adj;
    buf_t h_lof, h_n_exon, h_off_exon, h_cid, h_rev; /* int32 */
    buf_t h_cs, h_ce, h_cm;                          /* int64 */
    buf_t e_os, e_oe;                                /* int32 exon pool */
    intern_t prot;   /* per-file protein names (legacy, sess == NULL) */
    intern_t ctg;    /* per-file contig names */
    pg_sess_t *sess; /* optional cross-file intern session */
    int64_t n_records;
    char errmsg[256];
} parse_out_t;

/* ---------------- PAF line parsing ---------------- */

/* inline decimal parse (locale-free, no errno): the reference's strtol
 * usage is the parse hot path at ~30 calls/record incl. CIGAR ops */
static inline int64_t fast_atoll(const char *p, char **end)
{
    int64_t v = 0;
    int neg = 0;
    if (*p == '-') { neg = 1; ++p; }
    else if (*p == '+') ++p;
    while (*p >= '0' && *p <= '9') v = v * 10 + (*p++ - '0');
    if (end) *end = (char *)p;
    return neg ? -v : v;
}

static int parse_cigar_exons(parse_out_t *o, const char *cg, int rev,
                             int64_t span, int32_t *n_exon_out,
                             int32_t *n_fs_out)
{
    /* exon boundaries relative to cs (read.c:47-90 semantics):
     * N/U/V introns split exons with U/V 1-2bp offsets; M/X/=/D advance
     * 3*l; F/G advance l and count as frameshift. The exon scratch grows
     * dynamically like the reference's arrays (no fixed cap). */
    enum { TMP0 = 4096 };
    static int32_t *tmp_os = 0, *tmp_oe = 0;
    static int32_t tmp_cap = 0;
    int32_t n = 1, n_fs = 0;
    int64_t x = 0;
    const char *p = cg;
    if (!tmp_os) {
        tmp_cap = TMP0;
        tmp_os = (int32_t *)malloc(tmp_cap * 4);
        tmp_oe = (int32_t *)malloc(tmp_cap * 4);
    }
    tmp_os[0] = 0; tmp_oe[0] = 0;
    while (*p && *p != '\t') {
        char *r;
        long l = (long)fast_atoll(p, &r);
        char op = *r;
        if (op == 'N' || op == 'U' || op == 'V') {
            int64_t st, en;
            if (op == 'N') st = x, en = x + l;
            else if (op == 'U') st = x + 1, en = x + l - 2;
            else st = x + 2, en = x + l - 1;
            if (n >= tmp_cap) {
                tmp_cap <<= 1;
                tmp_os = (int32_t *)realloc(tmp_os, (size_t)tmp_cap * 4);
                tmp_oe = (int32_t *)realloc(tmp_oe, (size_t)tmp_cap * 4);
            }
            tmp_oe[n - 1] = (int32_t)st;
            tmp_os[n] = (int32_t)en;
            tmp_oe[n] = (int32_t)en;
            ++n;
            x += l;
        } else if (op == 'M' || op == 'X' || op == '=' || op == 'D') {
            x += l * 3;
        } else if (op == 'F' || op == 'G') {
            x += l;
            ++n_fs;
        }
        p = r + 1;
    }
    tmp_oe[n - 1] = (int32_t)x;
    if (x != span) return -1; /* reference asserts x == ce - cs (read.c:75) */
    if (!rev) {
        int i;
        for (i = 0; i < n; ++i) {
            PUSH(o->e_os, int32_t, tmp_os[i]);
            PUSH(o->e_oe, int32_t, tmp_oe[i]);
        }
    } else {
        int i;
        for (i = n - 1; i >= 0; --i) {
            PUSH(o->e_os, int32_t, (int32_t)(x - tmp_oe[i]));
            PUSH(o->e_oe, int32_t, (int32_t)(x - tmp_os[i]));
        }
    }
    *n_exon_out = n;
    *n_fs_out = n_fs;
    return 0;
}

static int64_t cal_cm(const int32_t *os, const int32_t *oe, int32_t n,
                      int64_t cs)
{
    /* CDS midpoint (reference pg_hit_cal_cm, hit.c:14-27) */
    int64_t len = 0, half;
    int32_t i;
    for (i = 0; i < n; ++i) len += oe[i] - os[i];
    half = len >> 1;
    for (i = 0, len = 0; i < n; ++i) {
        int64_t l = oe[i] - os[i];
        if (len <= half && half < len + l)
            return cs + os[i] + (half - len);
        len += l;
    }
    return -1;
}

static int process_line(parse_out_t *o, char *line, int len, char delim,
                        double min_ratio, double min_iden, double coef)
{
    /* field-by-field state machine mirroring read.c:128-235 */
    char *fields[1024];   /* miniprot emits ~8 tags; generous headroom */
    int n_fields = 0, i;
    char *p = line, *start = line;
    (void)delim;
    ++o->n_records;
    for (p = line; ; ++p) {
        if (*p == '\t' || p == line + len) {
            if (n_fields < 1024) fields[n_fields++] = start;
            if (p == line + len) break;
            *p = 0;
            start = p + 1;
        }
    }
    line[len] = 0;

    /* field 0: query name -> intern + per-file rank count */
    {
        int absent;
        int flen = (n_fields > 1) ? (int)(fields[1] - fields[0] - 1)
                                  : (int)(line + len - fields[0]);
        uint32_t nid;
        int32_t rank;
        if (o->sess) {
            pg_sess_t *S = o->sess;
            nid = intern_put(&S->prot, fields[0], flen, &absent);
            if (absent) {
                const char *q = (const char *)memchr(fields[0], S->delim,
                                                     flen);
                int glen = q ? (int)(q - fields[0]) : flen;
                int gabs;
                uint32_t gid = intern_put(&S->gene, fields[0], glen, &gabs);
                PUSH(S->prot_gid, int32_t, (int32_t)gid);
                PUSH(S->rank_cnt, int32_t, 0);
                PUSH(S->rank_epoch, int32_t, S->epoch);
                rank = 0;
            } else if (((int32_t *)S->rank_epoch.p)[nid] != S->epoch) {
                ((int32_t *)S->rank_epoch.p)[nid] = S->epoch;
                ((int32_t *)S->rank_cnt.p)[nid] = 0;
                rank = 0;
            } else {
                rank = ++((int32_t *)S->rank_cnt.p)[nid];
            }
        } else {
            nid = intern_put(&o->prot, fields[0], flen, &absent);
            rank = absent ? 0 : ((int32_t *)o->prot.aux.p)[nid] + 1;
            ((int32_t *)o->prot.aux.p)[nid] = rank;
        }
        PUSH(o->r_name, int32_t, (int32_t)nid);
        PUSH(o->r_qlen, int32_t, -1);
        PUSH(o->r_cid, int32_t, -1);
        PUSH(o->r_ctglen, int64_t, -1);
        PUSH(o->r_kept, int8_t, 0);
        if (n_fields < 2) return 0;
        int32_t qlen = (int32_t)fast_atoll(fields[1], 0);
        ((int32_t *)o->r_qlen.p)[o->r_qlen.n - 1] = qlen;
        if (n_fields < 11) return 0;
        int32_t qs = (int32_t)fast_atoll(fields[2], 0);
        int32_t qe = (int32_t)fast_atoll(fields[3], 0);
        if (qe - qs < qlen * min_ratio) return 0;   /* read.c:182 */
        int rev;
        if (fields[4][0] == '+') rev = 0;
        else if (fields[4][0] == '-') rev = 1;
        else return 0;
        int clen = (int)strlen(fields[5]);
        uint32_t cid = intern_put(&o->ctg, fields[5], clen, &absent);
        ((int32_t *)o->r_cid.p)[o->r_cid.n - 1] = (int32_t)cid;
        int64_t ctg_len = fast_atoll(fields[6], 0);
        ((int64_t *)o->r_ctglen.p)[o->r_ctglen.n - 1] = ctg_len;
        int64_t cs = fast_atoll(fields[7], 0);
        int64_t ce = fast_atoll(fields[8], 0);
        int32_t mlen = (int32_t)fast_atoll(fields[9], 0);
        int32_t blen = (int32_t)fast_atoll(fields[10], 0);
        if (mlen < blen * min_iden) return 0;       /* read.c:209 */
        int32_t score_ori = 0, score_adj = 0, n_fs_tag = -1, n_stop_tag = -1;
        int32_t n_exon = -1, cig_fs = 0;
        int64_t off_exon = (int64_t)o->e_os.n;
        for (i = 12; i < n_fields; ++i) {
            const char *f = fields[i];
            if (strncmp(f, "ms:i:", 5) == 0) {
                double div = 1.0 - (double)mlen / blen;
                double uncov = 1.0 - (double)(qe - qs) / qlen;
                score_ori = (int32_t)fast_atoll(f + 5, 0);
                score_adj = (int32_t)(score_ori *
                                      expl(-coef * (div + uncov)) + .499);
            } else if (strncmp(f, "fs:i:", 5) == 0) {
                n_fs_tag = (int32_t)fast_atoll(f + 5, 0);
            } else if (strncmp(f, "st:i:", 5) == 0) {
                n_stop_tag = (int32_t)fast_atoll(f + 5, 0);
            } else if (strncmp(f, "cg:Z:", 5) == 0) {
                int rc = parse_cigar_exons(o, f + 5, rev, ce - cs,
                                           &n_exon, &cig_fs);
                if (rc == -1) {
                    snprintf(o->errmsg, sizeof(o->errmsg),
                             "CIGAR span mismatch at record %lld",
                             (long long)o->n_records);
                    return -1;
                }
                if (rc == -2) {
                    snprintf(o->errmsg, sizeof(o->errmsg),
                             "too many exons at record %lld",
                             (long long)o->n_records);
                    return -1;
                }
            }
        }
        if (n_exon < 1) return 0;                   /* read.c:229 */
        int32_t lof_tags = (n_fs_tag > 0 ? n_fs_tag : 0)
                         + (n_stop_tag > 0 ? n_stop_tag : 0);
        int32_t lof = cig_fs > lof_tags ? cig_fs : lof_tags;
        ((int8_t *)o->r_kept.p)[o->r_kept.n - 1] = 1;
        PUSH(o->h_name, int32_t, (int32_t)nid);
        PUSH(o->h_qs, int32_t, qs);
        PUSH(o->h_qe, int32_t, qe);
        PUSH(o->h_mlen, int32_t, mlen);
        PUSH(o->h_blen, int32_t, blen);
        PUSH(o->h_rank, int32_t, rank);
        PUSH(o->h_score_ori, int32_t, score_ori);
        PUSH(o->h_score_adj, int32_t, score_adj);
        PUSH(o->h_lof, int32_t, lof);
        PUSH(o->h_n_exon, int32_t, n_exon);
        PUSH(o->h_off_exon, int32_t, (int32_t)off_exon);
        PUSH(o->h_cid, int32_t, (int32_t)cid);
        PUSH(o->h_rev, int32_t, rev);
        PUSH(o->h_cs, int64_t, cs);
        PUSH(o->h_ce, int64_t, ce);
        PUSH(o->h_cm, int64_t,
             cal_cm((int32_t *)o->e_os.p + off_exon,
                    (int32_t *)o->e_oe.p + off_exon, n_exon, cs));
    }
    return 0;
}

/* ---------------- public API ---------------- */

parse_out_t *pg_parse_paf_sess(pg_sess_t *sess, const char *fn, char delim,
                               double min_ratio, double min_iden,
                               double coef);

parse_out_t *pg_parse_paf(const char *fn, char delim, double min_ratio,
                          double min_iden, double coef)
{
    return pg_parse_paf_sess(0, fn, delim, min_ratio, min_iden, coef);
}

#ifdef PG_HAVE_LIBDEFLATE
/* Whole-file read with one spare byte for in-place NUL termination.
 * Returns 0 (-> zlib streaming fallback) on error or files > 1.5 GB. */
static char *pg_read_file(const char *fn, size_t *len)
{
    FILE *f = fopen(fn, "rb");
    long sz;
    char *p;
    if (f == 0) return 0;
    if (fseek(f, 0, SEEK_END) != 0 || (sz = ftell(f)) < 0 ||
        fseek(f, 0, SEEK_SET) != 0 || sz > (3L << 29)) {
        fclose(f);
        return 0;
    }
    p = (char *)malloc((size_t)sz + 1);
    if (p == 0) { fclose(f); return 0; }
    if (sz > 0 && fread(p, 1, (size_t)sz, f) != (size_t)sz) {
        free(p);
        fclose(f);
        return 0;
    }
    fclose(f);
    *len = (size_t)sz;
    return p;
}

/* Inflate every gzip member with libdeflate (measured ~2x zlib's inflate,
 * which was ~40% of the C parse wall). Multi-member (bgzf-style) files
 * loop on actual_in_nbytes; the ISIZE trailer of the last member seeds the
 * output capacity. Returns a malloc'd buffer with one spare byte, or 0 on
 * any decode error (caller falls back to the exact zlib streaming path). */
static char *pg_inflate_all(const char *cd, size_t clen, size_t *olen)
{
    struct libdeflate_decompressor *dec = libdeflate_alloc_decompressor();
    size_t cap, used = 0, inpos = 0;
    uint32_t isize = 0;
    char *out;
    if (dec == 0) return 0;
    if (clen >= 4)
        isize = (uint32_t)(unsigned char)cd[clen - 4]
              | ((uint32_t)(unsigned char)cd[clen - 3] << 8)
              | ((uint32_t)(unsigned char)cd[clen - 2] << 16)
              | ((uint32_t)(unsigned char)cd[clen - 1] << 24);
    cap = isize > clen * 4 ? isize : clen * 4 + 64;
    if (cap < (1u << 20)) cap = 1u << 20;
    out = (char *)malloc(cap + 1);
    if (out == 0) { libdeflate_free_decompressor(dec); return 0; }
    while (inpos < clen) {
        size_t a_in = 0, a_out = 0;
        enum libdeflate_result r = libdeflate_gzip_decompress_ex(
            dec, cd + inpos, clen - inpos, out + used, cap - used,
            &a_in, &a_out);
        if (r == LIBDEFLATE_INSUFFICIENT_SPACE) {
            char *np;
            cap = cap * 2 + (1u << 20);
            np = (char *)realloc(out, cap + 1);
            if (np == 0) { free(out); libdeflate_free_decompressor(dec); return 0; }
            out = np;
            continue;
        }
        if (r != LIBDEFLATE_SUCCESS || a_in == 0) {
            free(out);
            libdeflate_free_decompressor(dec);
            return 0;
        }
        inpos += a_in;
        used += a_out;
    }
    libdeflate_free_decompressor(dec);
    *olen = used;
    return out;
}

/* Parse a fully materialized text buffer in place (spare byte required).
 * Line semantics identical to the streaming loop below: CRLF trimmed,
 * empty lines still reach process_line (the ""-gene intern quirk), a
 * final unterminated line is processed. Returns 0 ok, -1 parse abort. */
static int parse_text_buf(parse_out_t *o, char *text, size_t tlen,
                          char delim, double min_ratio, double min_iden,
                          double coef)
{
    size_t pos = 0;
    while (pos < tlen) {
        char *nl = (char *)memchr(text + pos, '\n', tlen - pos);
        size_t llen = nl ? (size_t)(nl - (text + pos)) : tlen - pos;
        size_t next = nl ? pos + llen + 1 : tlen;
        if (llen > 0 && text[pos + llen - 1] == '\r') --llen;
        text[pos + llen] = 0;
        if (process_line(o, text + pos, (int)llen, delim,
                         min_ratio, min_iden, coef) < 0)
            return -1;
        pos = next;
    }
    return 0;
}
#endif /* PG_HAVE_LIBDEFLATE */

/* Session variant: name ids in r_name/h_name are GLOBAL across all files
 * parsed with the same session (one file-epoch bump per call). */
parse_out_t *pg_parse_paf_sess(pg_sess_t *sess, const char *fn, char delim,
                               double min_ratio, double min_iden,
                               double coef)
{
    parse_out_t *o = (parse_out_t *)calloc(1, sizeof(parse_out_t));
    gzFile fp;
    intern_init(&o->prot);
    intern_init(&o->ctg);
    o->sess = sess;
    if (sess) ++sess->epoch;
#ifdef PG_HAVE_LIBDEFLATE
    if (strcmp(fn, "-") != 0) {
        size_t clen = 0;
        char *raw = pg_read_file(fn, &clen);
        if (raw) {
            char *text = raw;
            size_t tlen = clen;
            if (clen >= 2 && (unsigned char)raw[0] == 0x1f &&
                (unsigned char)raw[1] == 0x8b) {
                text = pg_inflate_all(raw, clen, &tlen);
                if (text) free(raw);
            }
            if (text) {
                parse_text_buf(o, text, tlen, delim, min_ratio, min_iden,
                               coef);
                free(text);
                return o;    /* errors are recorded in o like the zlib path */
            }
            free(raw);       /* gzip decode failed: zlib streaming fallback */
        }
    }
#endif
    fp = strcmp(fn, "-") ? gzopen(fn, "r") : gzdopen(0, "r");
    if (fp == 0) {
        snprintf(o->errmsg, sizeof(o->errmsg), "cannot open %s", fn);
        return o;
    }
    gzbuffer(fp, 1 << 20);
    {
        size_t cap = 1 << 20, used = 0;
        char *buf = (char *)malloc(cap);
        int eof = 0;
        while (!eof) {
            int got = gzread(fp, buf + used, (unsigned)(cap - used));
            if (got <= 0) eof = 1;
            else used += got;
            if (!eof && used == cap) {
                char *nl = (char *)memchr(buf, '\n', used);
                if (nl == 0) {           /* line longer than buffer: grow */
                    cap <<= 1;
                    buf = (char *)realloc(buf, cap);
                    continue;
                }
            }
            /* process complete lines in buf[0..used) */
            {
                size_t pos = 0;
                for (;;) {
                    char *nl = (char *)memchr(buf + pos, '\n', used - pos);
                    if (nl == 0) break;
                    size_t llen = nl - (buf + pos);
                    if (llen > 0 && buf[pos + llen - 1] == '\r') --llen;
                    buf[pos + llen] = 0;
                    if (process_line(o, buf + pos, (int)llen, delim,
                                     min_ratio, min_iden, coef) < 0) {
                        free(buf);
                        gzclose(fp);
                        return o;
                    }
                    pos = nl - buf + 1;
                }
                memmove(buf, buf + pos, used - pos);
                used -= pos;
            }
            if (eof && used > 0) {      /* final line without newline */
                size_t llen = used;
                if (buf[llen - 1] == '\r') --llen;
                buf[llen] = 0;
                if (process_line(o, buf, (int)llen, delim,
                                 min_ratio, min_iden, coef) < 0) {
                    free(buf);
                    gzclose(fp);
                    return o;
                }
                used = 0;
            }
        }
        free(buf);
    }
    gzclose(fp);
    return o;
}

int32_t pg_score_adj(int32_t score_ori, double coef, double div, double uncov)
{
    /* exact long-double rounding of read.c:216 */
    return (int32_t)(score_ori * expl(-coef * (div + uncov)) + .499);
}

/* accessors for ctypes (avoid struct layout coupling) */
#define GET(field, type) \
    void *pg_get_##field(parse_out_t *o, int64_t *n) { \
        *n = (int64_t)o->field.n; return o->field.p; }

GET(r_name, int32_t) GET(r_qlen, int32_t) GET(r_cid, int32_t)
GET(r_ctglen, int64_t) GET(r_kept, int8_t)
GET(h_name, int32_t) GET(h_qs, int32_t) GET(h_qe, int32_t)
GET(h_mlen, int32_t) GET(h_blen, int32_t) GET(h_rank, int32_t)
GET(h_score_ori, int32_t) GET(h_score_adj, int32_t) GET(h_lof, int32_t)
GET(h_n_exon, int32_t) GET(h_off_exon, int32_t) GET(h_cid, int32_t)
GET(h_rev, int32_t) GET(h_cs, int64_t) GET(h_ce, int64_t) GET(h_cm, int64_t)
GET(e_os, int32_t) GET(e_oe, int32_t)

const char *pg_get_err(parse_out_t *o) { return o->errmsg; }
int64_t pg_get_n_records(parse_out_t *o) { return o->n_records; }

/* name tables */
const char *pg_get_prot_blob(parse_out_t *o, int64_t *blob_len, int64_t *n)
{
    *blob_len = (int64_t)o->prot.blob.n;
    *n = (int64_t)o->prot.n;
    return o->prot.blob.p;
}
void *pg_get_prot_offs(parse_out_t *o) { return o->prot.offs.p; }
const char *pg_get_ctg_blob(parse_out_t *o, int64_t *blob_len, int64_t *n)
{
    *blob_len = (int64_t)o->ctg.blob.n;
    *n = (int64_t)o->ctg.n;
    return o->ctg.blob.p;
}
void *pg_get_ctg_offs(parse_out_t *o) { return o->ctg.offs.p; }

void pg_parse_free(parse_out_t *o)
{
    if (!o) return;
    intern_free(&o->prot);
    intern_free(&o->ctg);
    free(o->r_name.p); free(o->r_qlen.p); free(o->r_cid.p);
    free(o->r_ctglen.p); free(o->r_kept.p);
    free(o->h_name.p); free(o->h_qs.p); free(o->h_qe.p); free(o->h_mlen.p);
    free(o->h_blen.p); free(o->h_rank.p); free(o->h_score_ori.p);
    free(o->h_score_adj.p); free(o->h_lof.p); free(o->h_n_exon.p);
    free(o->h_off_exon.p); free(o->h_cid.p); free(o->h_rev.p);
    free(o->h_cs.p); free(o->h_ce.p); free(o->h_cm.p);
    free(o->e_os.p); free(o->e_oe.p);
    free(o);
}
