"""Count histograms and hom/het peak detection.

Port of the hifiasm-style peak finder used for automatic ``-c``
selection (/root/reference/syncmer.c:760-865) plus the smer/kmer/dist
statistics of sr_db_stat (/root/reference/syncmer.c:867-1028).
"""
from __future__ import annotations

import sys

import numpy as np

MAX_DEPTH = 1000
LOWEST_CUT = 5


def count_histogram(counts: np.ndarray, max_n: int = MAX_DEPTH) -> np.ndarray:
    """hist[c] = number of items seen exactly c times; c >= max_n pooled."""
    hist = np.zeros(max_n + 1, dtype=np.int64)
    c = np.minimum(counts.astype(np.int64), max_n)
    np.add.at(hist, c, 1)
    return hist


def analyze_count_peaks(cnt: np.ndarray, start_cnt: int = LOWEST_CUT, verbose: int = 0):
    """Return (peak_hom, peak_het); -1 when undetermined.

    Same decision procedure as ha_analyze_count: find the leftmost
    trough, the global peak right of it, then secondary peaks on either
    side with the 5%-height and 95%-dip significance rules and the
    2.5x-distance rule on the right.
    """
    n_cnt = len(cnt)
    peak_het = -1
    start = 1 if cnt[1] > 0 else 2

    low_i = max(start, start_cnt)
    i = low_i + 1
    while i < n_cnt and cnt[i] <= cnt[i - 1]:
        i += 1
    low_i = i - 1
    if low_i == n_cnt - 1:
        return -1, peak_het  # low coverage

    max_i = low_i + 1
    for i in range(low_i + 1, n_cnt):
        if cnt[i] > cnt[max_i]:
            max_i = i
    max_v = cnt[max_i]

    # smaller peak on the low end
    max2_i, max2 = -1, -1
    for i in range(max_i - 1, low_i, -1):
        if cnt[i] >= cnt[i - 1] and cnt[i] >= cnt[i + 1] and cnt[i] > max2:
            max2, max2_i = cnt[i], i
    if low_i < max2_i < max_i:
        mn = min((cnt[j] for j in range(max2_i + 1, max_i)), default=max_v)
        if max2 < max_v * 0.05 or mn > max2 * 0.95:
            max2, max2_i = -1, -1

    # smaller peak on the high end
    max3_i, max3 = -1, -1
    for i in range(max_i + 1, n_cnt - 1):
        if cnt[i] >= cnt[i - 1] and cnt[i] >= cnt[i + 1] and cnt[i] > max3:
            max3, max3_i = cnt[i], i
    if max3_i > max_i:
        mn = min((cnt[j] for j in range(max_i + 1, max3_i)), default=max_v)
        if max3 < max_v * 0.05 or mn > max3 * 0.95 or max3_i > max_i * 2.5:
            max3, max3_i = -1, -1

    if max3_i > 0:
        return max3_i, max_i
    if max2_i > 0:
        peak_het = max2_i
    return max_i, peak_het


def hist_plot(hist_pairs, label: str, fo=sys.stderr):
    """ASCII histogram (hist_plot analogue, /root/reference/syncmer.c:669-734):
    hist_pairs = sorted [(count_value, frequency)]; bars of '*' scaled to
    the 99% mass, '+' suffix per extra decade."""
    n = len(hist_pairs)
    if n < 5:
        return
    cnts = [freq for _, freq in hist_pairs]
    tot = sum(c for (v, c), i in zip(hist_pairs, range(n)) if i >= 3) * 0.99
    acc = 0.0
    b = n
    for i in range(n):
        acc += cnts[i]
        if acc >= tot:
            b = i + 1
            break
    p_cnt = max(cnts[:b], default=1)
    per_dot = max(1, p_cnt / 100)
    for i in range(b):
        v, c = hist_pairs[i]
        d = int(c / per_dot)
        bar = "*" * min(d, 100)
        if c / per_dot > 100:
            bar += "+" * int(np.log10(c / per_dot / 100))
        print(f"[M::hist_plot] [{label}] {v}: {bar} {c}", file=fo)
    if b < n:
        rest = sum(cnts[b:])
        d = int(rest / per_dot)
        bar = "*" * min(d, 100)
        print(f"[M::hist_plot] [{label}] >{hist_pairs[b-1][0]}: {bar} {rest}", file=fo)


def read_db_stat(read_db, fo=sys.stderr, verbose: int = 0) -> dict:
    """Collect syncmer statistics (sr_db_stat analogue) into read_db.stats."""
    w = read_db.k
    all_smer = []
    all_kmer = []
    dists = []
    m = 0
    for r in read_db.reads:
        if r.n == 0:
            continue
        m += r.n
        all_smer.append(r.s_mer)
        all_kmer.append(r.k_mer)
        p = (r.m_pos >> 1).astype(np.int64)
        if r.n > 1:
            dists.append(p[1:] - p[:-1] - w)
    stats: dict = {}
    if m == 0:
        print("[M::read_db_stat] empty syncmer collection", file=fo)
        read_db.stats = stats
        return stats
    smer = np.concatenate(all_smer)
    kmer = np.concatenate(all_kmer)
    dist = np.concatenate(dists) if dists else np.zeros(0, np.int64)

    _, s_counts = np.unique(smer, return_counts=True)
    _, k_counts = np.unique(kmer, return_counts=True)
    s_hist = count_histogram(s_counts)
    k_hist = count_histogram(k_counts)
    s_hom, s_het = analyze_count_peaks(s_hist)
    k_hom, k_het = analyze_count_peaks(k_hist)

    stats.update(
        syncmer_n=m,
        syncmer_per_read=m / max(1, read_db.n),
        syncmer_avg_dist=float(dist.mean()) if len(dist) else 0.0,
        smer_unique=len(s_counts),
        smer_singleton=int((s_counts == 1).sum()),
        smer_avg_cnt=float(s_counts.mean()),
        smer_peak_hom=s_hom,
        smer_peak_het=s_het,
        kmer_unique=len(k_counts),
        kmer_singleton=int((k_counts == 1).sum()),
        kmer_avg_cnt=float(k_counts.mean()),
        kmer_peak_hom=k_hom,
        kmer_peak_het=k_het,
    )
    if fo:
        p = lambda msg: print(f"[M::read_db_stat] {msg}", file=fo)
        p(f"number syncmers collected: {m}")
        p(f"number syncmers per read: {stats['syncmer_per_read']:.3f}")
        p(f"average kmer space: {stats['syncmer_avg_dist']:.3f}")
        p(f"number unique smer: {stats['smer_unique']}; singletons: {stats['smer_singleton']}")
        p(f"smer peak_hom: {s_hom}; peak_het: {s_het}")
        p(f"number unique kmer: {stats['kmer_unique']}; singletons: {stats['kmer_singleton']}")
        p(f"kmer peak_hom: {k_hom}; peak_het: {k_het}")
        if verbose > 1:
            dv, dc = np.unique(dist, return_counts=True) if len(dist) else ([], [])
            hist_plot(sorted(zip([int(x) for x in dv], [int(x) for x in dc])), "DIST", fo)
            sv, sc = np.unique(s_counts, return_counts=True)
            hist_plot(sorted(zip([int(x) for x in sv], [int(x) for x in sc])), "SMER", fo)
            kv, kc = np.unique(k_counts, return_counts=True)
            hist_plot(sorted(zip([int(x) for x in kv], [int(x) for x in kc])), "KMER", fo)
    read_db.stats = stats
    return stats
