"""Synthetic circular genome + HiFi-like read simulator for parity tests."""
from __future__ import annotations

import numpy as np

_COMP = {"A": "T", "C": "G", "G": "C", "T": "A", "N": "N"}


def revcomp(s: str) -> str:
    return "".join(_COMP[c] for c in reversed(s))


def random_genome(rng, length: int, hp_prob: float = 0.15, max_hp: int = 8) -> str:
    """Random circular genome with homopolymer runs."""
    out = []
    while len(out) < length:
        b = "ACGT"[rng.integers(4)]
        out.append(b)
        if rng.random() < hp_prob:
            out.extend(b * int(rng.integers(1, max_hp)))
    return "".join(out[:length])


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
    out = []
    for c in seq:
        r = rng.random()
        if r >= rate:
            out.append(c)
            continue
        if rng.random() < hp_frac:
            # hoco-invisible homopolymer length error
            if rng.random() < 0.5:
                out.append(c)
                out.append(c)  # lengthen the run
            elif out and out[-1] == c:
                pass  # shorten the run (skip c)
            else:
                out.append(c)
                out.append(c)
            continue
        kind = rng.integers(3)
        if kind == 0:  # substitution
            out.append("ACGT"[rng.integers(4)])
        elif kind == 1:  # insertion
            out.append(c)
            out.append("ACGT"[rng.integers(4)])
        # kind == 2: deletion (skip)
    return "".join(out)


def write_reads(path: str, reads: list[str], prefix: str = "read"):
    with open(path, "w") as f:
        for i, r in enumerate(reads):
            f.write(f">{prefix}{i}\n{r}\n")
