"""Randomized parser fuzz: native parse+hoco vs the Python oracle.

Locks the AVX-512 hoco line kernel (native/fastx_hoco.c
hoco_line_avx512) and its scalar fallback against
kernels/oracle.hoco_compress_np on adversarial container shapes:
CRLF, 1/7/80-column wrapping, empty lines inside records, FASTQ,
lowercase, ambiguity letters, and >=256 homopolymer runs (the rl
saturation + overflow-list path; reference sr_t ho_rl semantics,
/root/reference/syncmer.h:56).
"""
import random

import numpy as np
import pytest

from oatk_tpu import native
from oatk_tpu.kernels.oracle import hoco_compress_np

BASES = "ACGTacgtUu"  # U/u are valid (NT4 code 3, same as T)
AMB = "NnRYKMswbdhv-X"


def _rand_seq(rng, n):
    out = []
    while len(out) < n:
        r = rng.random()
        if r < 0.05:
            out.append(rng.choice(AMB))
        elif r < 0.25:
            c = rng.choice(BASES)
            out.extend(c * rng.randint(2, 600 if rng.random() < 0.05 else 12))
        else:
            out.append(rng.choice(BASES))
    return "".join(out[:n])


@pytest.mark.skipif(native.parse_fastx_hoco(b">r\nACGT\n") is None,
                    reason="native library unavailable")
@pytest.mark.parametrize(
    "seq",
    ["UUUU", "TTUU", "TU", "tUuT", "AUTUA", "uuuu" * 100, "TtUu" + "N" + "UT"],
)
def test_parse_fastx_hoco_tu_runs(seq):
    """T and U both map to NT4 code 3 (reference seq_nt4_table): mixed
    T/U homopolymer runs must compress identically on the AVX-512 and
    scalar paths -- directed cases for the U canonicalization."""
    data = f">r0\n{seq}\n".encode()
    res = native.parse_fastx_hoco(data)
    assert res is not None
    names, rawlen, offs, codes, rl, isn_pos, ovf_pos, ovf_len = res
    o_codes, o_rl, o_isn = hoco_compress_np(np.frombuffer(seq.encode(), np.uint8))
    s, e = int(offs[0]), int(offs[1])
    assert np.array_equal(codes[s:e], o_codes), seq
    assert np.array_equal(
        rl[s:e], np.minimum(o_rl.astype(np.int64), 255).astype(np.uint8)
    ), seq
    assert np.array_equal(isn_pos - s, np.flatnonzero(o_isn)), seq


@pytest.mark.skipif(native.parse_fastx_hoco(b">r\nACGT\n") is None,
                    reason="native library unavailable")
def test_parse_fastx_hoco_fuzz_vs_oracle():
    rng = random.Random(7)
    for trial in range(120):
        n_reads = rng.randint(1, 8)
        recs = []
        blob = []
        fq = rng.random() < 0.3
        for i in range(n_reads):
            seq = _rand_seq(rng, rng.randint(0, 500))
            recs.append(seq)
            nl = "\r\n" if rng.random() < 0.2 else "\n"
            if fq:
                blob.append(f"@r{i} extra{nl}{seq}{nl}+{nl}{'I' * len(seq)}{nl}")
            else:
                w = rng.choice([0, 1, 7, 80])
                parts = (
                    [seq[j : j + w] for j in range(0, len(seq), w)] or [""]
                    if w
                    else [seq]
                )
                if rng.random() < 0.2:
                    parts.insert(rng.randint(0, len(parts)), "")
                blob.append(f">r{i} desc{nl}{nl.join(parts)}{nl}")
        data = "".join(blob).encode()
        res = native.parse_fastx_hoco(data)
        assert res is not None, f"trial {trial}: parse failed"
        names, rawlen, offs, codes, rl, isn_pos, ovf_pos, ovf_len = res
        assert len(names) == n_reads
        for i, seq in enumerate(recs):
            o_codes, o_rl, o_isn = hoco_compress_np(
                np.frombuffer(seq.encode(), np.uint8)
            )
            s, e = int(offs[i]), int(offs[i + 1])
            assert rawlen[i] == len(seq), (trial, i)
            assert np.array_equal(codes[s:e], o_codes), (trial, i, seq)
            exact = o_rl.astype(np.int64)
            assert np.array_equal(
                rl[s:e], np.minimum(exact, 255).astype(np.uint8)
            ), (trial, i, seq)
            m = (ovf_pos >= s) & (ovf_pos < e)
            assert np.array_equal(
                np.sort(ovf_pos[m]), np.flatnonzero(exact >= 255) + s
            ), (trial, i)
            assert np.array_equal(
                np.sort(ovf_len[m]), np.sort(exact[exact >= 255])
            ), (trial, i)
            mi = (isn_pos >= s) & (isn_pos < e)
            assert np.array_equal(isn_pos[mi] - s, np.flatnonzero(o_isn)), (
                trial,
                i,
                seq,
            )
