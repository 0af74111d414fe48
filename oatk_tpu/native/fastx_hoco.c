/* Native FASTA/FASTQ parse + homopolymer compression (runtime hot path).
 *
 * The TPU compute path consumes 2-bit packed hoco codes; this C stage
 * replaces the Python per-read parse+compress loop (the host-side
 * bottleneck once device kernels are fast).  Semantics match
 * oatk_tpu.kernels.oracle.hoco_compress_np exactly: runs of an
 * identical valid base collapse to one position (run length recorded),
 * ambiguous bases are kept uncompressed with code 0 and flagged.
 *
 * Build: cc -O3 -shared -fPIC fastx_hoco.c -o libfastx_hoco.so
 */
#include <stdint.h>
#include <stddef.h>

static const uint8_t NT4[256] = {
    /* A=0 C=1 G=2 T/U=3, else 4; lower case folded */
    [0 ... 255] = 4,
    ['A'] = 0, ['a'] = 0, ['C'] = 1, ['c'] = 1,
    ['G'] = 2, ['g'] = 2, ['T'] = 3, ['t'] = 3,
    ['U'] = 3, ['u'] = 3,
};

/* Parse records from a FASTA or FASTQ text buffer and hoco-compress.
 *
 * Outputs (caller-allocated):
 *   codes   [max_hoco]  u8: hoco base codes (0-3; ambiguous -> 0)
 *   rl      [max_hoco]  u32: run length per hoco position (>= 1)
 *   isn     [max_hoco]  u8: 1 where ambiguous
 *   offs    [max_reads+1] i64: per-read start offsets into the above
 *   rawlen  [max_reads] i64: raw (uncompressed) read length
 *   hdr_beg/hdr_end [max_reads] i64: header name spans in `data`
 *
 * Returns number of reads parsed, or -1 if capacity exceeded
 * (n_hoco_out then holds the required hoco capacity lower bound).
 */
int64_t parse_fastx_hoco(
    const uint8_t *data, int64_t len,
    uint8_t *codes, uint32_t *rl, uint8_t *isn,
    int64_t *offs, int64_t *rawlen,
    int64_t *hdr_beg, int64_t *hdr_end,
    int64_t max_reads, int64_t max_hoco,
    int64_t *n_hoco_out)
{
    int64_t i = 0, n_reads = 0, h = 0;

    while (i < len) {
        /* skip blank lines */
        while (i < len && (data[i] == '\n' || data[i] == '\r')) ++i;
        if (i >= len) break;
        int is_fq = data[i] == '@';
        if (data[i] != '>' && !is_fq) return -2; /* malformed */
        if (n_reads >= max_reads) return -1;
        ++i;
        int64_t hb = i;
        while (i < len && data[i] != '\n' && data[i] != ' ' && data[i] != '\t'
               && data[i] != '\r') ++i;
        int64_t he = i;
        while (i < len && data[i] != '\n') ++i; /* rest of header */
        ++i;

        offs[n_reads] = h;
        hdr_beg[n_reads] = hb;
        hdr_end[n_reads] = he;

        /* sequence lines until next record (or +-line for FASTQ) */
        int64_t raw = 0;
        uint8_t prev = 255;
        while (i < len && data[i] != '>' && data[i] != '+' &&
               !(is_fq && data[i] == '@')) {
            while (i < len && data[i] != '\n') {
                uint8_t b = data[i++];
                if (b == '\r') continue;
                uint8_t c = NT4[b];
                ++raw;
                if (c == 4) {
                    if (h >= max_hoco) goto overflow;
                    codes[h] = 0;
                    rl[h] = 1;
                    isn[h] = 1;
                    ++h;
                    prev = 255;
                } else if (c == prev) {
                    ++rl[h - 1];
                } else {
                    if (h >= max_hoco) goto overflow;
                    codes[h] = c;
                    rl[h] = 1;
                    isn[h] = 0;
                    ++h;
                    prev = c;
                }
            }
            ++i;
            if (!is_fq) continue;
            break; /* FASTQ: exactly one sequence line */
        }
        if (is_fq) {
            /* skip '+' line and quality line */
            while (i < len && data[i] != '\n') ++i;
            ++i;
            while (i < len && data[i] != '\n') ++i;
            ++i;
        }
        rawlen[n_reads] = raw;
        ++n_reads;
    }
    offs[n_reads] = h;
    *n_hoco_out = h;
    return n_reads;

overflow:
    *n_hoco_out = h + (len - i); /* generous lower bound */
    return -1;
}

/* 2-bit pack concatenated hoco codes per read into per-read padded rows.
 * rows: [n_reads, row_bytes] u8, first base of each read at bits 7-6 of
 * its row's byte 0.  Used to build the device upload batch in one pass. */
static inline void pack_one_row(
    const uint8_t *src, int64_t n, uint8_t *dst)
{
    int64_t b = 0;
    for (; b + 4 <= n; b += 4) {
        dst[b >> 2] = (uint8_t)(src[b] << 6 | src[b + 1] << 4 |
                                src[b + 2] << 2 | src[b + 3]);
    }
    if (b < n) {
        uint8_t v = 0;
        for (int64_t j = b; j < n; ++j)
            v |= src[j] << ((3 - (j & 3)) << 1);
        dst[b >> 2] = v;
    }
}

void pack_rows(
    const uint8_t *codes, const int64_t *offs,
    int64_t row0, int64_t n_rows, int64_t row_bytes,
    uint8_t *rows)
{
    for (int64_t r = 0; r < n_rows; ++r)
        pack_one_row(codes + offs[row0 + r],
                     offs[row0 + r + 1] - offs[row0 + r],
                     rows + r * row_bytes);
}

/* Gather variant: rows pack an arbitrary subset of reads (length
 * bucketing scatters reads of one device chunk through the segment).
 * One native call replaces a per-read Python/FFI loop. */
void pack_rows_gather(
    const uint8_t *codes, const int64_t *starts, const int64_t *ends,
    int64_t n_rows, int64_t row_bytes, uint8_t *rows)
{
    for (int64_t r = 0; r < n_rows; ++r)
        pack_one_row(codes + starts[r], ends[r] - starts[r],
                     rows + r * row_bytes);
}

/* GIL-free byte scans for the loader's critical path: counting record
 * headers ("\n>"/"\n@") to bound allocation, and locating a 2-byte
 * pattern to validate optimistic FASTA segment splits.  ctypes releases
 * the GIL around these calls, so they overlap parse worker threads
 * instead of serializing on bytes.count. */
#include <string.h>

int64_t count_byte2(const uint8_t *p, int64_t n, uint8_t a, uint8_t b)
{
    int64_t cnt = 0;
    const uint8_t *end = p + n;
    while (p < end - 1) {
        const uint8_t *q = memchr(p, a, end - p - 1);
        if (!q) break;
        cnt += (q[1] == b);
        p = q + 1;
    }
    return cnt;
}

int64_t find_byte2(const uint8_t *p, int64_t n, uint8_t a, uint8_t b)
{
    const uint8_t *base = p, *end = p + n;
    while (p < end - 1) {
        const uint8_t *q = memchr(p, a, end - p - 1);
        if (!q) break;
        if (q[1] == b) return q - base;
        p = q + 1;
    }
    return -1;
}
