"""Extraction parity against the reference's DEBUG_SYNCMER_SEQ dump.

The `/root/refbin/syncasm_debug` binary is compiled with
DEBUG_SYNCMER_SEQ and emits one record per syncmer occurrence:
``>sid_idx_pos_ocbit_rev  RD:Z:name MM:Z:smer KH:Z:kmerhash`` followed
by the oriented k-mer sequence.  This locks the claim (previously only
a docstring) that device extraction is bit-identical to the reference:
positions, strand, open/close bit, and the 64-bit Murmur k-mer hash.
"""
import subprocess
from pathlib import Path

import numpy as np

from conftest import random_read
from genome_sim import write_reads

REFBIN = Path("/root/refbin")


def _parse_dump(path):
    out = []
    for line in open(path):
        if not line.startswith(">"):
            continue
        head, *tags = line[1:].rstrip("\n").split("\t")
        sid, idx, pos, oc, rev = (int(x) for x in head.split("_"))
        kh = None
        for t in tags:
            if t.startswith("KH:Z:"):
                kh = int(t[5:])
        out.append((sid, idx, pos, oc, rev, kh))
    return out


def test_extraction_matches_reference_debug_dump(tmp_path, rng):
    reads = [random_read(rng, int(rng.integers(300, 2500)), n_prob=0.002)
             for _ in range(30)]
    fa = tmp_path / "reads.fa"
    write_reads(str(fa), reads)
    subprocess.run(
        [str(REFBIN / "syncasm_debug"), "-k", "51", "-s", "11", "-c", "1",
         "--no-read-ec", "--unzip-round", "0", "-o", str(tmp_path / "d"), str(fa)],
        check=True, capture_output=True,
    )
    dump = _parse_dump(tmp_path / "d_syncmer_debug.fa")
    assert len(dump) > 50, "dump suspiciously small"

    from oatk_tpu.asm.reads import extract_all_syncmers
    from oatk_tpu.io.fastx import read_fastx

    db = extract_all_syncmers(read_fastx([str(fa)]), 51, 11, use_device=True)
    mine = []
    for r in db.reads:
        for j in range(r.n):
            mp = int(r.m_pos[j])
            mine.append((
                r.sid, j, mp >> 1, int(r.s_mer[j]) & 1, mp & 1, int(r.k_mer[j]),
            ))
    assert len(mine) == len(dump), (len(mine), len(dump))
    for a, b in zip(mine, dump):
        assert a == b, f"occurrence differs: mine={a} ref={b}"
