/* Native host sweeps for pangene_tpu: cross-gene shadow marking and
 * same-gene overlapping-isoform filtering.
 *
 * Behavior contract is the reference's windowed scans over the cs-sorted
 * hit axis (pg_shadow overlap.c:101-178, pg_flt_ov_isoform overlap.c:58-93)
 * with the exon merge-scan innermost (pg_hit_overlap overlap.c:6-42).
 * These run ~19x per genome over the pruning schedule and dominate the
 * host path; the Python oracles (ops/sweep.py, ops/sweep_vec.py) stay as
 * the differential-test reference for this kernel.
 *
 * All floating-point predicates (cov_short, the score_dom blend) are IEEE
 * double, bit-matching the NumPy f64 host path. Original implementation;
 * no reference code reused.
 */
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

/* Jenkins-style 32-bit integer hash for score tie-breaking; must match
 * ops/sweep.py:hash_uint32 bit-exactly (contract: pgpriv.h:88-97). */
static uint32_t hash_u32(uint32_t k)
{
    k += ~(k << 15);
    k ^= k >> 10;
    k += k << 3;
    k ^= k >> 6;
    k += ~(k << 11);
    k ^= k >> 16;
    return k;
}

/* packed comparison key: score_adj<<33 | preferred<<32 | hash(pid) */
static uint64_t packed_score(int32_t score_adj, uint8_t pref, int32_t pid)
{
    return ((uint64_t)(int64_t)score_adj << 33)
        | ((uint64_t)(pref ? 1 : 0) << 32)
        | (uint64_t)hash_u32((uint32_t)pid);
}

/* CDS intersection of two sorted, non-overlapping exon lists given as
 * offsets relative to each hit's cs. */
static int64_t ov_len(const int32_t *eos, const int32_t *eoe,
                      int64_t cs_a, int32_t off_a, int32_t n_a,
                      int64_t cs_b, int32_t off_b, int32_t n_b)
{
    int32_t a = 0, b = 0;
    int64_t tot = 0;
    while (a < n_a && b < n_b) {
        int64_t s1 = eos[off_a + a] + cs_a, e1 = eoe[off_a + a] + cs_a;
        int64_t s2 = eos[off_b + b] + cs_b, e2 = eoe[off_b + b] + cs_b;
        int64_t lo = s1 > s2 ? s1 : s2, hi = e1 < e2 ? e1 : e2;
        if (hi > lo) tot += hi - lo;
        if (e1 < e2) ++a; else ++b;
    }
    return tot;
}

/* Cross-gene shadow sweep. Arrays are the genome's cs-sorted hit columns;
 * shadow / pid_dom / score_dom are updated in place. Returns the number of
 * unfiltered shadowed hits. Quirks preserved: hit 0 and filtered hits keep
 * their stale shadow flag; the window pointer advances only for unfiltered
 * i; dominators are recorded only when the winner's packed score is > 0;
 * ties keep the first (smallest other-index) dominator. */
int64_t pg_sweep_shadow(
    int64_t n,
    const int32_t *pid, const int32_t *rank,
    const int32_t *score_adj, const int32_t *score_ori,
    const int32_t *n_exon, const int32_t *off_exon,
    const int32_t *cid, const uint8_t *rev, const uint8_t *flt,
    const uint8_t *weak_br,
    const int64_t *cs, const int64_t *ce,
    const int32_t *eos, const int32_t *eoe,
    const int32_t *prot_gid, const uint8_t *gene_pref,
    int32_t check_strand, double min_ov_ratio, int32_t cal_dom_sc,
    uint8_t *shadow, int32_t *pid_dom, int32_t *score_dom)
{
    int64_t i, i0 = 0, n_shadow = 0;
    int64_t *lens, *tmp_ov;
    uint64_t *tmp_score, *pscore;
    int32_t *tmp_aid, *gid;
    if (n == 0) return 0;
    lens = (int64_t *)malloc(n * 8);
    tmp_ov = (int64_t *)calloc(n, 8);
    tmp_score = (uint64_t *)calloc(n, 8);
    pscore = (uint64_t *)malloc(n * 8);
    tmp_aid = (int32_t *)calloc(n, 4);
    gid = (int32_t *)malloc(n * 4);
    for (i = 0; i < n; ++i) {
        int32_t k, e = 0;
        for (k = 0; k < n_exon[i]; ++k)
            e += eoe[off_exon[i] + k] - eos[off_exon[i] + k];
        lens[i] = e;
        gid[i] = prot_gid[pid[i]];
        pscore[i] = packed_score(score_adj[i], gene_pref[gid[i]], pid[i]);
    }
    for (i = 1; i < n; ++i) {
        int64_t j;
        uint64_t si;
        uint8_t wi;
        if (flt[i]) continue;
        while (i0 < i && !(cid[i0] == cid[i] && ce[i0] > cs[i])) ++i0;
        shadow[i] = 0;
        si = pscore[i];
        wi = weak_br[i];
        for (j = i0; j < i; ++j) {
            int64_t ov, loser, winner;
            uint64_t sj;
            uint8_t wj;
            if (ce[j] <= cs[i] || flt[j]) continue;
            if (cid[j] != cid[i]) continue;
            if (check_strand && rev[i] != rev[j]) continue;
            ov = ov_len(eos, eoe, cs[j], off_exon[j], n_exon[j],
                        cs[i], off_exon[i], n_exon[i]);
            if (ov == 0) continue;
            if (gid[i] != gid[j]) {
                int64_t m = lens[i] < lens[j] ? lens[i] : lens[j];
                if ((double)ov / (double)m < min_ov_ratio) continue;
            }
            sj = pscore[j];
            wj = weak_br[j];
            if (gid[i] == gid[j] || wi == wj)
                loser = (si < sj || (si == sj && rank[i] > rank[j])) ? i : j;
            else
                loser = wi > wj ? i : j;
            winner = loser == i ? j : i;
            shadow[loser] = 1;
            if (tmp_score[loser] < pscore[winner]) {
                tmp_score[loser] = pscore[winner];
                tmp_aid[loser] = (int32_t)winner;
                tmp_ov[loser] = ov;
            }
        }
    }
    for (i = 0; i < n; ++i) {
        if (flt[i]) continue;
        pid_dom[i] = -1;
        if (cal_dom_sc) score_dom[i] = -1;
        if (tmp_score[i] > 0) {
            int64_t j = tmp_aid[i];
            pid_dom[i] = pid[j];
            if (cal_dom_sc) {
                double b = (double)score_ori[i]
                    * (1.0 - (double)tmp_ov[i] / (double)lens[i])
                    + (double)score_ori[j]
                    * ((double)tmp_ov[i] / (double)lens[j]) + 0.499;
                score_dom[i] = (int32_t)(int64_t)b;
            }
        }
        if (shadow[i]) ++n_shadow;
    }
    free(lens); free(tmp_ov); free(tmp_score); free(pscore);
    free(tmp_aid); free(gid);
    return n_shadow;
}

/* Same-gene overlapping-isoform filter; flt_iso_ov and flt updated in
 * place. Returns the count of hits with flt_iso_ov set (including ones set
 * by earlier invocations, matching the Python oracle's mask count). */
int64_t pg_sweep_ov_isoform(
    int64_t n,
    const int32_t *pid, const int32_t *rank,
    const int32_t *score_adj,
    const int32_t *n_exon, const int32_t *off_exon,
    const int32_t *cid, const uint8_t *rev,
    const int64_t *cs, const int64_t *ce,
    const int32_t *eos, const int32_t *eoe,
    const int32_t *prot_gid, const uint8_t *gene_pref,
    int32_t check_strand,
    uint8_t *flt_iso_ov, uint8_t *flt)
{
    int64_t i, i0 = 0, cnt = 0;
    uint64_t *pscore;
    int32_t *gid;
    if (n == 0) return 0;
    pscore = (uint64_t *)malloc(n * 8);
    gid = (int32_t *)malloc(n * 4);
    for (i = 0; i < n; ++i) {
        gid[i] = prot_gid[pid[i]];
        pscore[i] = packed_score(score_adj[i], gene_pref[gid[i]], pid[i]);
    }
    for (i = 1; i < n; ++i) {
        int64_t j;
        if (flt[i]) continue;
        while (i0 < i && !(cid[i0] == cid[i] && ce[i0] > cs[i])) ++i0;
        for (j = i0; j < i; ++j) {
            int64_t ov;
            if (flt[j] || ce[j] <= cs[i]) continue;
            if (gid[i] != gid[j]) continue;
            if (cid[j] != cid[i]) continue;
            if (check_strand && rev[i] != rev[j]) continue;
            ov = ov_len(eos, eoe, cs[j], off_exon[j], n_exon[j],
                        cs[i], off_exon[i], n_exon[i]);
            if (ov == 0) continue;
            if (pscore[i] < pscore[j]
                || (pscore[i] == pscore[j] && rank[i] > rank[j]))
                flt_iso_ov[i] = 1;
            else
                flt_iso_ov[j] = 1;
        }
    }
    for (i = 0; i < n; ++i)
        if (flt_iso_ov[i]) { flt[i] = 1; ++cnt; }
    free(pscore); free(gid);
    return cnt;
}
