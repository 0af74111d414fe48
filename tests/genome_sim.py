"""Synthetic circular genome + HiFi-like read simulator for parity tests.

All generators are vectorized (Gbp-scale datasets generate in seconds,
not tens of minutes of per-base Python loops).  Seeded datasets are
deterministic per numpy version; parity tests regenerate BOTH sides'
outputs from the same reads, so dataset identity across code revisions
is not required."""
from __future__ import annotations

import numpy as np

_COMP_TAB = np.arange(256, dtype=np.uint8)
for _a, _b in zip(b"ACGTacgt", b"TGCAtgca"):
    _COMP_TAB[_a] = _b


def revcomp(s: str) -> str:
    a = np.frombuffer(s.encode(), np.uint8)
    return _COMP_TAB[a][::-1].tobytes().decode()


_NT = np.frombuffer(b"ACGT", np.uint8)


def random_genome(rng, length: int, hp_prob: float = 0.15, max_hp: int = 8) -> str:
    """Random circular genome with homopolymer runs (each emitted base
    extends into a run of 1+integers(1, max_hp) with prob hp_prob)."""
    parts = []
    have = 0
    while have < length:
        n = max(1024, int((length - have) / (1 + hp_prob * max_hp / 2)) + 16)
        codes = rng.integers(0, 4, size=n).astype(np.uint8)
        hp = rng.random(n) < hp_prob
        ext = rng.integers(1, max_hp, size=n)
        rep = 1 + np.where(hp, ext, 0)
        chunk = np.repeat(_NT[codes], rep)
        parts.append(chunk)
        have += len(chunk)
    return np.concatenate(parts)[:length].tobytes().decode()


def sample_reads(
    rng,
    genome: str,
    coverage: float,
    read_len: int,
    len_sd: int = 0,
    err_rate: float = 0.0,
    circular: bool = True,
    hp_frac: float = 0.0,
):
    """Sample reads uniformly (both strands) from a (circular) genome,
    optionally injecting substitution/indel errors at err_rate."""
    G = len(genome)
    n_reads = int(np.ceil(coverage * G / read_len))
    reads = []
    src = genome + genome  # wraparound
    for _ in range(n_reads):
        L = max(50, int(read_len + (rng.normal(0, len_sd) if len_sd else 0)))
        start = int(rng.integers(G)) if circular else int(rng.integers(max(1, G - L)))
        seq = src[start : start + L] if circular else genome[start : start + L]
        if rng.random() < 0.5:
            seq = revcomp(seq)
        if err_rate > 0:
            seq = inject_errors(rng, seq, err_rate, hp_frac)
        reads.append(seq)
    return reads


def inject_errors(rng, seq: str, rate: float, hp_frac: float = 0.0) -> str:
    """Inject sequencing errors at per-base `rate`.

    hp_frac: fraction of errors that are homopolymer-length indels
    (insert a copy of the current base / delete a base equal to its
    neighbor).  Real HiFi errors are dominated by hp-run-length noise,
    which homopolymer compression absorbs -- hp_frac ~0.85 models that;
    the default 0 keeps the harsher legacy uniform profile used by the
    existing seeded parity tests."""
    a = np.frombuffer(seq.encode(), np.uint8)
    n = len(a)
    err = rng.random(n) < rate
    idx = np.flatnonzero(err)
    if len(idx) == 0:
        return seq
    ne = len(idx)
    is_hp = rng.random(ne) < hp_frac
    rep = np.ones(n, np.int64)
    # hp-length errors: lengthen (dup) with prob .5, else shorten when
    # the left neighbour matches (a run continues), else dup anyway
    hp_i = idx[is_hp]
    dup = rng.random(len(hp_i)) < 0.5
    left_same = np.zeros(len(hp_i), bool)
    nz = hp_i > 0
    left_same[nz] = a[hp_i[nz] - 1] == a[hp_i[nz]]
    rep[hp_i] = np.where(dup | ~left_same, 2, 0)
    # other errors: substitution / insertion / deletion in equal parts
    ot_i = idx[~is_hp]
    kind = rng.integers(0, 3, size=len(ot_i))
    rnd1 = _NT[rng.integers(0, 4, size=len(ot_i))]
    rep[ot_i[kind == 2]] = 0
    rep[ot_i[kind == 1]] = 2
    out = np.repeat(a, rep)
    cum = np.cumsum(rep)  # cum[i]-1 = last output copy of input i
    sub = ot_i[kind == 0]
    out[cum[sub] - 1] = rnd1[kind == 0]
    ins = ot_i[kind == 1]
    out[cum[ins] - 1] = rnd1[kind == 1]
    return out.tobytes().decode()


def write_reads(path: str, reads: list[str], prefix: str = "read"):
    with open(path, "w") as f:
        for i, r in enumerate(reads):
            f.write(f">{prefix}{i}\n{r}\n")


# HiFi SMRTbell adapter (the sequence real leftover-adapter reads carry)
PB_ADAPTER = "ATCTCTCTCTTTTCCTCCTCCTCCGTTGTTGTTGTTGAGAGAGAT"


def sample_reads_adversarial(
    rng,
    genome: str,
    coverage: float,
    read_len: int,
    err_rate: float = 0.001,
    hp_frac: float = 0.85,
    chimera_frac: float = 0.02,
    adapter_frac: float = 0.02,
    dropout: tuple[float, float] | None = (0.3, 0.15),
    contaminant: str | None = None,
    contaminant_frac: float = 0.05,
):
    """Adversarial HiFi-like reads: real error structure plus the
    library artifacts a production assembler must survive --

    - chimeras: two loci (possibly opposite strands) fused in one read
      (missed-adapter ligation artifacts);
    - adapter remnants: PB_ADAPTER text at a read end;
    - coverage dropout: a genome window of `dropout` = (span_frac,
      keep_prob) sampled at reduced probability (GC bias analogue);
    - contaminant reads drawn from an unrelated genome (host nuclear /
      bacterial carry-over).

    The reference pipeline treats all of these as noise (low-coverage
    k-mers, tips, weak arcs); parity tests assert byte-identical
    handling rather than any specific cleanup outcome."""
    G = len(genome)
    src = genome + genome
    n_reads = int(np.ceil(coverage * G / read_len))
    drop_lo = drop_hi = -1
    keep_p = 1.0
    if dropout is not None:
        span = int(G * dropout[0])
        drop_lo = int(rng.integers(G))
        drop_hi = drop_lo + span
        keep_p = dropout[1]
    reads = []
    while len(reads) < n_reads:
        start = int(rng.integers(G))
        if drop_lo >= 0:
            in_drop = (drop_lo <= start < drop_hi) or (
                drop_lo <= start + G < drop_hi
            )
            if in_drop and rng.random() > keep_p:
                continue
        L = read_len
        r = rng.random()
        if contaminant is not None and r < contaminant_frac:
            cs = contaminant + contaminant
            cst = int(rng.integers(len(contaminant)))
            seq = cs[cst : cst + L]
        elif r < contaminant_frac + chimera_frac:
            l1 = int(rng.integers(L // 4, 3 * L // 4))
            s2 = int(rng.integers(G))
            a = src[start : start + l1]
            b = src[s2 : s2 + (L - l1)]
            if rng.random() < 0.5:
                b = revcomp(b)
            seq = a + b
        else:
            seq = src[start : start + L]
        if rng.random() < 0.5:
            seq = revcomp(seq)
        if rng.random() < adapter_frac:
            if rng.random() < 0.5:
                seq = PB_ADAPTER + seq
            else:
                seq = seq + PB_ADAPTER
        if err_rate > 0:
            seq = inject_errors(rng, seq, err_rate, hp_frac)
        reads.append(seq)
    return reads


def write_fastq(path: str, reads: list[str], rng=None, prefix: str = "read"):
    """FASTQ with a skewed HiFi-like quality profile (high-Q plateau,
    noisy tail) -- the parsers must ignore qualities entirely."""
    with open(path, "w") as f:
        for i, r in enumerate(reads):
            n = len(r)
            if rng is not None:
                q = np.full(n, 90, np.int64)
                tail = min(n, 50)
                q[-tail:] -= rng.integers(0, 60, tail)
                q[rng.random(n) < 0.01] = 35
                qs = (q.clip(33, 126)).astype(np.uint8).tobytes().decode()
            else:
                qs = "I" * n
            f.write(f"@{prefix}{i} ccs\n{r}\n+\n{qs}\n")


def embed_numts(
    rng,
    nuclear: str,
    organelle: str,
    n_inserts: int = 8,
    len_range: tuple[int, int] = (500, 6000),
    divergence: float | tuple[float, float] = (0.0, 0.01),
) -> str:
    """Insert organelle fragments into a nuclear genome (numt/nupt
    analogue -- the confounder oatk's DBSCAN coverage clustering and
    seed gating exist for, /root/reference/path.c:3416-3445,3821-3967).

    Fragments are sampled from random positions of the (circular)
    organelle, reverse-complemented half the time, and mutated per base
    at `divergence` (a (lo, hi) tuple draws a per-fragment rate: recent
    insertions are IDENTICAL to the organelle -- the nastiest case,
    shared syncmers at nuclear coverage -- while old ones carry only
    nuclear-unique k-mers)."""
    G = len(organelle)
    src = organelle + organelle
    positions = sorted(int(rng.integers(len(nuclear))) for _ in range(n_inserts))
    pieces = []
    cur = 0
    for p in positions:
        L = int(rng.integers(len_range[0], len_range[1]))
        st = int(rng.integers(G))
        frag = src[st : st + L]
        if rng.random() < 0.5:
            frag = revcomp(frag)
        d = (
            float(rng.uniform(divergence[0], divergence[1]))
            if isinstance(divergence, tuple)
            else divergence
        )
        if d > 0:
            frag = inject_errors(rng, frag, d)
        pieces.append(nuclear[cur:p])
        pieces.append(frag)
        cur = p
    pieces.append(nuclear[cur:])
    return "".join(pieces)


def heteroplasmic_minor(rng, genome: str, n_snv: int = 20) -> str:
    """A minor haplotype: `n_snv` substitutions at distinct positions
    (low-frequency organelle variants -- heteroplasmy -- that surface as
    bubbles stressing the super-bubble protection in
    /root/reference/graph.c:382-432)."""
    a = np.frombuffer(genome.encode(), np.uint8).copy()
    pos = rng.choice(len(a), size=min(n_snv, len(a)), replace=False)
    for p in pos:
        alts = [c for c in b"ACGT" if c != a[p]]
        a[p] = alts[int(rng.integers(3))]
    return a.tobytes().decode()
