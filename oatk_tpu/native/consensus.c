/* Native consensus hot loops (syncasm.c:465-1046 semantics as realized
 * by oatk_tpu/asm/consensus.py, which is byte-parity-validated against
 * the reference binaries).
 *
 * Both functions operate on flat concatenations of the per-read arrays
 * (built once per scg_consensus call):
 *   kflat[moff[sid]+idx]  u64 syncmer id<<1|ec_flag per read syncmer
 *   mflat[moff[sid]+idx]  u32 hoco_pos<<1|rev per read syncmer
 *   code_flat[hoff[sid]+p] u8 hoco base codes
 *   rl_flat[hoff[sid]+p]   u32 homopolymer run lengths (>=1)
 */
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

#define SCM_IDX_MASK 0x7FFFFFFFLL

/* Mode of per-read adjacent distances between two syncmers; ties break
 * count desc then distance asc.  pos arrays are sorted by read id. */
int64_t scm_overlap_mode(const uint64_t *pos1, int64_t n1,
                         const uint64_t *pos2, int64_t n2,
                         int64_t rc1, int64_t rc2,
                         const uint64_t *kflat, const uint32_t *mflat,
                         const int64_t *moff)
{
    int64_t stack_d[1024];
    int64_t *dv = stack_d;
    int64_t cap = 1024, nd = 0;
    int64_t p2 = 0, a, j;

    for (a = 0; a < n1; ++a) {
        uint64_t e1 = pos1[a];
        int64_t r1 = (int64_t)(e1 >> 32);
        int64_t i1 = (int64_t)(e1 >> 1) & SCM_IDX_MASK;
        int64_t c1 = (int64_t)(e1 & 1);
        int64_t g1 = moff[r1] + i1;
        if (kflat[g1] & 1) continue; /* error-corrected */
        int64_t l1 = (int64_t)(mflat[g1] >> 1);
        while (p2 < n2 && (int64_t)(pos2[p2] >> 32) < r1) ++p2;
        for (j = p2; j < n2; ++j) {
            uint64_t e2 = pos2[j];
            int64_t r2 = (int64_t)(e2 >> 32);
            if (r2 != r1) break;
            int64_t i2 = (int64_t)(e2 >> 1) & SCM_IDX_MASK;
            int64_t g2 = moff[r2] + i2;
            if (kflat[g2] & 1) continue;
            int64_t l2 = (int64_t)(mflat[g2] >> 1);
            int64_t c2 = (int64_t)(e2 & 1);
            int64_t d;
            if (i1 == i2 + 1 && c1 != rc1 && c2 != rc2) d = l1 - l2;
            else if (i1 + 1 == i2 && c1 == rc1 && c2 == rc2) d = l2 - l1;
            else continue;
            if (nd == cap) {
                cap *= 2;
                if (dv == stack_d) {
                    dv = (int64_t *)malloc(cap * sizeof(int64_t));
                    if (!dv) return 0;
                    memcpy(dv, stack_d, nd * sizeof(int64_t));
                } else {
                    int64_t *p = (int64_t *)realloc(dv, cap * sizeof(int64_t));
                    if (!p) { free(dv); return 0; }
                    dv = p;
                }
            }
            dv[nd++] = d;
        }
    }
    if (nd == 0) { if (dv != stack_d) free(dv); return 0; }

    /* insertion sort is fine (distance lists are short and clustered) */
    for (a = 1; a < nd; ++a) {
        int64_t key = dv[a];
        for (j = a - 1; j >= 0 && dv[j] > key; --j) dv[j + 1] = dv[j];
        dv[j + 1] = key;
    }
    int64_t best_d = dv[0], best_c = 1, cur_c = 1;
    for (a = 1; a < nd; ++a) {
        if (dv[a] == dv[a - 1]) ++cur_c;
        else cur_c = 1;
        if (cur_c > best_c) { best_c = cur_c; best_d = dv[a]; }
    }
    if (dv != stack_d) free(dv);
    return best_d;
}

/* Consensus inputs for one syncmer window of length l starting at
 * offset beg (>=0) within the k-mer.  Fills base_out[l] with hoco codes
 * from the first un-corrected occurrence and (when need_rl) accumulates
 * totrl_out[l] += run_length-1 over all un-corrected occurrences.
 * Returns the number of contributing occurrences (0 => caller emits N). */
int64_t scm_consensus_fill(const uint64_t *mpos, int64_t n_occ,
                           int64_t rev, int64_t beg, int64_t l,
                           const uint64_t *kflat, const uint32_t *mflat,
                           const int64_t *moff,
                           const uint8_t *code_flat, const uint32_t *rl_flat,
                           const int64_t *hoff,
                           int64_t need_rl, int64_t hoco_total,
                           uint8_t *base_out, int64_t *totrl_out)
{
    int64_t m_seq = 0, a, j;
    int have_base = 0;
    for (a = 0; a < n_occ; ++a) {
        uint64_t e = mpos[a];
        int64_t sid = (int64_t)(e >> 32);
        int64_t idx = (int64_t)(e >> 1) & SCM_IDX_MASK;
        int64_t g = moff[sid] + idx;
        if (kflat[g] & 1) continue;
        uint32_t praw = mflat[g];
        int64_t r = (int64_t)(praw & 1) ^ rev;
        int64_t p = (int64_t)(praw >> 1);
        if (!r) p += beg;
        int64_t st = hoff[sid] + p;
        if (st < 0 || st + l > hoco_total) continue; /* corrupt entry guard */
        if (!have_base) {
            if (r)
                for (j = 0; j < l; ++j) base_out[j] = 3 - code_flat[st + l - 1 - j];
            else
                memcpy(base_out, code_flat + st, l);
            have_base = 1;
            if (!need_rl) return 1;
        }
        if (r)
            for (j = 0; j < l; ++j) totrl_out[j] += (int64_t)rl_flat[st + l - 1 - j] - 1;
        else
            for (j = 0; j < l; ++j) totrl_out[j] += (int64_t)rl_flat[st + j] - 1;
        ++m_seq;
    }
    return have_base ? m_seq : 0;
}

/* Full unitig consensus emission: overlap-mode stitching of the oriented
 * syncmer list v[nv], per-window base fill + run-length means, ASCII
 * output (hoco_seq => one char per hoco base; else run-length expanded).
 * Mirrors unitig_consensus + syncmer_consensus in asm/consensus.py.
 * Returns emitted length, or -1 when out_cap is too small. */
#include <math.h>

int64_t utg_consensus_emit(const uint64_t *v, int64_t nv,
                           int64_t w, int64_t hoco_seq,
                           const uint64_t *mp_flat, const int64_t *mp_off,
                           const uint64_t *kflat, const uint32_t *mflat,
                           const int64_t *moff,
                           const uint8_t *code_flat, const uint32_t *rl_flat,
                           const int64_t *hoff, int64_t hoco_total,
                           uint8_t *out, int64_t out_cap)
{
    static const char NT[4] = {'A', 'C', 'G', 'T'};
    if (nv == 0) return 0;
    int64_t *pos = (int64_t *)malloc(nv * sizeof(int64_t));
    uint8_t *base = (uint8_t *)malloc(w);
    int64_t *totrl = (int64_t *)malloc(w * sizeof(int64_t));
    if (!pos || !base || !totrl) { free(pos); free(base); free(totrl); return -1; }
    pos[0] = 0;
    int64_t i, j;
    for (i = 1; i < nv; ++i) {
        int64_t m1 = (int64_t)(v[i - 1] >> 1), rc1 = (int64_t)(v[i - 1] & 1);
        int64_t m2 = (int64_t)(v[i] >> 1), rc2 = (int64_t)(v[i] & 1);
        pos[i] = pos[i - 1] + scm_overlap_mode(
            mp_flat + mp_off[m1], mp_off[m1 + 1] - mp_off[m1],
            mp_flat + mp_off[m2], mp_off[m2 + 1] - mp_off[m2],
            rc1, rc2, kflat, mflat, moff);
    }

    int64_t outp = 0, end_pos = 0;
    i = 0;
    while (i < nv) {
        while (i + 1 < nv && pos[i + 1] <= end_pos) ++i;
        int64_t beg_pos = pos[i];
        int64_t beg = end_pos - beg_pos;
        int64_t s = (int64_t)(v[i] >> 1), rev = (int64_t)(v[i] & 1);
        if (beg < 0) {
            if (outp - beg > out_cap) goto full;
            memset(out + outp, 'N', -beg);
            outp -= beg;
            beg = 0;
        }
        int64_t l = w - beg;
        memset(totrl, 0, l * sizeof(int64_t));
        int64_t m_seq = scm_consensus_fill(
            mp_flat + mp_off[s], mp_off[s + 1] - mp_off[s], rev, beg, l,
            kflat, mflat, moff, code_flat, rl_flat, hoff,
            !hoco_seq, hoco_total, base, totrl);
        if (m_seq == 0) {
            if (outp + l > out_cap) goto full;
            memset(out + outp, 'N', l);
            outp += l;
        } else if (hoco_seq) {
            if (outp + l > out_cap) goto full;
            for (j = 0; j < l; ++j) out[outp + j] = NT[base[j] & 3];
            outp += l;
        } else {
            for (j = 0; j < l; ++j) {
                int64_t rep = 1 + (int64_t)floor((double)totrl[j] / (double)m_seq + 0.5);
                if (outp + rep > out_cap) goto full;
                memset(out + outp, NT[base[j] & 3], rep);
                outp += rep;
            }
        }
        end_pos = beg_pos + w;
        ++i;
    }
    free(pos); free(base); free(totrl);
    return outp;
full:
    free(pos); free(base); free(totrl);
    return -1;
}

/* Batched whole-graph consensus: one call emits every live vertex's
 * consensus back-to-back into `out` with per-vertex cuts, removing the
 * per-vertex Python/ctypes dispatch that dominated large graphs.
 * Vertices are independent, so contiguous ranges run on a small thread
 * pool with private buffers merged in order (output identical to the
 * sequential loop).  Returns total emitted length, -1 if out_cap too
 * small, -2 on allocation failure. */
#include <pthread.h>

typedef struct {
    const uint64_t *va_flat; const int64_t *va_off;
    const uint8_t *live;
    int64_t w, hoco_seq;
    const uint64_t *mp_flat; const int64_t *mp_off;
    const uint64_t *kflat; const uint32_t *mflat; const int64_t *moff;
    const uint8_t *code_flat; const uint32_t *rl_flat;
    const int64_t *hoff; int64_t hoco_total;
    int64_t v0, v1;
    int64_t *vlen;      /* per-vertex emitted length */
    uint8_t *buf; int64_t buf_cap, emitted;
    int err;
} cons_range_t;

static void *cons_worker(void *arg) {
    cons_range_t *r = (cons_range_t *)arg;
    for (int64_t i = r->v0; i < r->v1; ++i) {
        if (!r->live[i]) { r->vlen[i] = 0; continue; }
        for (;;) {
            int64_t got = utg_consensus_emit(
                r->va_flat + r->va_off[i], r->va_off[i + 1] - r->va_off[i],
                r->w, r->hoco_seq,
                r->mp_flat, r->mp_off, r->kflat, r->mflat, r->moff,
                r->code_flat, r->rl_flat, r->hoff, r->hoco_total,
                r->buf + r->emitted, r->buf_cap - r->emitted);
            if (got >= 0) { r->vlen[i] = got; r->emitted += got; break; }
            int64_t nc = r->buf_cap * 2 + 4096;
            uint8_t *nb = (uint8_t *)realloc(r->buf, nc);
            if (!nb) { r->err = 1; return NULL; }
            r->buf = nb; r->buf_cap = nc;
        }
    }
    return NULL;
}

int64_t utg_consensus_emit_batch(
    const uint64_t *va_flat, const int64_t *va_off,
    const uint8_t *live, int64_t n_vtx,
    int64_t w, int64_t hoco_seq,
    const uint64_t *mp_flat, const int64_t *mp_off,
    const uint64_t *kflat, const uint32_t *mflat, const int64_t *moff,
    const uint8_t *code_flat, const uint32_t *rl_flat,
    const int64_t *hoff, int64_t hoco_total,
    int64_t n_threads,
    uint8_t *out, int64_t out_cap, int64_t *cuts)
{
    if (n_threads < 1) n_threads = 1;
    if (n_threads > 16) n_threads = 16;
    if (n_threads > n_vtx) n_threads = n_vtx > 0 ? n_vtx : 1;
    /* approx workload ~ syncmer mass * window size; below ~64k the
     * pthread spawn cost outweighs any split (post-unitigging organelle
     * graphs have few vertices but large mass, so never gate on count) */
    if (n_vtx > 0 && va_off[n_vtx] * w < 65536) n_threads = 1;
    int64_t *vlen = (int64_t *)malloc((n_vtx ? n_vtx : 1) * sizeof(int64_t));
    if (!vlen) return -2;
    cons_range_t rg[16];
    memset(rg, 0, sizeof(rg));
    /* partition by syncmer mass, not vertex count (unitig sizes skew) */
    int64_t total_scm = va_off[n_vtx];
    int64_t v = 0;
    for (int64_t t = 0; t < n_threads; ++t) {
        rg[t].va_flat = va_flat; rg[t].va_off = va_off; rg[t].live = live;
        rg[t].w = w; rg[t].hoco_seq = hoco_seq;
        rg[t].mp_flat = mp_flat; rg[t].mp_off = mp_off;
        rg[t].kflat = kflat; rg[t].mflat = mflat; rg[t].moff = moff;
        rg[t].code_flat = code_flat; rg[t].rl_flat = rl_flat;
        rg[t].hoff = hoff; rg[t].hoco_total = hoco_total;
        rg[t].vlen = vlen;
        rg[t].v0 = v;
        int64_t target = total_scm * (t + 1) / n_threads;
        while (v < n_vtx && va_off[v] < target) ++v;
        if (t == n_threads - 1) v = n_vtx;
        rg[t].v1 = v;
        int64_t mass = va_off[rg[t].v1] - va_off[rg[t].v0];
        rg[t].buf_cap = mass * w * 2 + 4096;
        rg[t].buf = (uint8_t *)malloc(rg[t].buf_cap);
        if (!rg[t].buf) {
            for (int64_t u = 0; u < t; ++u) free(rg[u].buf);
            free(vlen);
            return -2;
        }
    }
    if (n_threads == 1) {
        cons_worker(&rg[0]);
    } else {
        pthread_t tid[16];
        int64_t spawned = 0;
        for (int64_t t = 0; t < n_threads; ++t) {
            if (pthread_create(&tid[t], NULL, cons_worker, &rg[t]) != 0) break;
            spawned++;
        }
        for (int64_t t = spawned; t < n_threads; ++t) cons_worker(&rg[t]);
        for (int64_t t = 0; t < spawned; ++t) pthread_join(tid[t], NULL);
    }
    int err = 0;
    int64_t total = 0;
    for (int64_t t = 0; t < n_threads; ++t) {
        err |= rg[t].err;
        total += rg[t].emitted;
    }
    int64_t ret;
    if (err) { ret = -2; goto done; }
    if (total > out_cap) { ret = -1; goto done; }
    cuts[0] = 0;
    {
        int64_t outp = 0;
        for (int64_t t = 0; t < n_threads; ++t) {
            memcpy(out + outp, rg[t].buf, rg[t].emitted);
            outp += rg[t].emitted;
        }
    }
    {
        int64_t acc = 0;
        for (int64_t i = 0; i < n_vtx; ++i) {
            acc += vlen[i];
            cuts[i + 1] = acc;
        }
    }
    ret = total;
done:
    for (int64_t t = 0; t < n_threads; ++t) free(rg[t].buf);
    free(vlen);
    return ret;
}

/* Batched arc overlap-length computation: mirrors the arc loop of
 * asm/consensus.py scg_consensus (ln>0 => sub-unitig consensus length;
 * else boundary-syncmer overlap mode, + single-window consensus length
 * when the overlap is < w).  out_als[ai] = computed l for processed
 * arcs, untouched otherwise.  Returns 0, or -1 when scratch_cap is too
 * small for a sub-unitig emission (caller regrows). */
int64_t arc_overlap_batch(
    const uint64_t *av, const uint64_t *aw, const int64_t *aln,
    const uint8_t *adel, const uint8_t *acomp, int64_t n_arc,
    const uint64_t *va_flat, const int64_t *va_off, const int64_t *vtx_len,
    int64_t w, int64_t hoco_seq,
    const uint64_t *mp_flat, const int64_t *mp_off,
    const uint64_t *kflat, const uint32_t *mflat, const int64_t *moff,
    const uint8_t *code_flat, const uint32_t *rl_flat,
    const int64_t *hoff, int64_t hoco_total,
    uint8_t *scratch, int64_t scratch_cap,
    int64_t *out_als)
{
    uint8_t *base = (uint8_t *)malloc(w);
    int64_t *totrl = (int64_t *)malloc(w * sizeof(int64_t));
    if (!base || !totrl) { free(base); free(totrl); return -1; }
    for (int64_t ai = 0; ai < n_arc; ++ai) {
        if (adel[ai] || acomp[ai]) continue;
        int64_t v = (int64_t)av[ai], t = (int64_t)aw[ai];
        int64_t ln = aln[ai];
        int64_t l;
        const uint64_t *a = va_flat + va_off[v >> 1];
        int64_t na = va_off[(v >> 1) + 1] - va_off[v >> 1];
        if (ln > 0) {
            const uint64_t *sub = (v & 1) ? a : a + (na - ln);
            l = utg_consensus_emit(sub, ln, w, hoco_seq,
                                   mp_flat, mp_off, kflat, mflat, moff,
                                   code_flat, rl_flat, hoff, hoco_total,
                                   scratch, scratch_cap);
            if (l < 0) { free(base); free(totrl); return -1; }
        } else {
            int64_t z = v & 1;
            int64_t vv = (int64_t)(z ? a[0] : a[na - 1]) ^ z;
            const uint64_t *a2 = va_flat + va_off[t >> 1];
            int64_t na2 = va_off[(t >> 1) + 1] - va_off[t >> 1];
            int64_t z2 = t & 1;
            int64_t tt = (int64_t)(z2 ? a2[na2 - 1] : a2[0]) ^ z2;
            int64_t m1 = vv >> 1, rc1 = vv & 1, m2 = tt >> 1, rc2 = tt & 1;
            l = scm_overlap_mode(mp_flat + mp_off[m1], mp_off[m1 + 1] - mp_off[m1],
                                 mp_flat + mp_off[m2], mp_off[m2 + 1] - mp_off[m2],
                                 rc1, rc2, kflat, mflat, moff);
            if (l < w) {
                /* syncmer_consensus(vv>>1, vv&1, beg=l) emitted length */
                int64_t beg = l, bl = 0;
                if (beg < 0) { bl = -beg; beg = 0; }
                int64_t win = w - beg;
                bl += win;
                memset(totrl, 0, win * sizeof(int64_t));
                int64_t m_seq = scm_consensus_fill(
                    mp_flat + mp_off[m1], mp_off[m1 + 1] - mp_off[m1],
                    rc1, beg, win,
                    kflat, mflat, moff, code_flat, rl_flat, hoff,
                    !hoco_seq, hoco_total, base, totrl);
                if (m_seq > 0 && !hoco_seq) {
                    for (int64_t j = 0; j < win; ++j)
                        bl += (int64_t)floor((double)totrl[j] / (double)m_seq + 0.5);
                }
                l = bl;
            } else {
                l = 0;
            }
        }
        int64_t lv = vtx_len[v >> 1], lt = vtx_len[t >> 1];
        if (l > lv) l = lv;
        if (l > lt) l = lt;
        out_als[ai] = l;
    }
    free(base); free(totrl);
    return 0;
}
