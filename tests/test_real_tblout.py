"""Annotation DB parsing of a genuine-format nhmmscan --tblout file
(HMMER 3.x layout: comment header block, aligned columns, accessions,
multi-word trailing descriptions), cross-checked against the reference
pathfinder consuming the identical file."""
import subprocess
from pathlib import Path

import numpy as np

from genome_sim import random_genome, sample_reads, write_reads

REFBIN = Path("/root/refbin")

HDR = """\
#                                                                   --- full sequence ---- --- best 1 domain ---- --- domain number estimation ----
# target name        accession  query name           accession  hmmfrom hmm to alifrom ali to envfrom env to  sq len strand   E-value  score  bias  description of target
#------------------- ---------- -------------------- ---------- ------- ------ ------- ------ ------- ------ ------- ------ --------- ------ ----- ---------------------
"""


def _real_tblout(path, hits):
    with open(path, "w") as f:
        f.write(HDR)
        for gene, seg, af, at, strand, ev, score in hits:
            ml = abs(at - af)
            a0, a1 = (at, af) if strand == "-" else (af, at)
            f.write(
                f"{gene:<20s} PF{abs(hash(gene))%99999:05d}.3   {seg:<20s} -  "
                f"{1:7d} {ml:6d} {a0:7d} {a1:6d} {max(1,a0-3):7d} {a1+3:6d} "
                f"{ml:7d} {strand:>6s} {ev:9.2g} {score:6.1f} {0.3:5.1f}  "
                f"NADH dehydrogenase subunit (mitochondrion)\n"
            )
        f.write("#\n# Program:         nhmmscan\n# Version:         3.4 (Aug 2023)\n")


def test_real_format_tblout_parse_and_parity(tmp_path, rng):
    genome = random_genome(rng, 25000)
    reads = sample_reads(rng, genome, coverage=14, read_len=3000)
    fa = tmp_path / "reads.fa"
    write_reads(str(fa), reads)
    pref = tmp_path / "asm"
    subprocess.run(
        [str(REFBIN / "syncasm"), "-k", "251", "-s", "17", "-c", "3",
         "--no-read-ec", "--unzip-round", "0", "-o", str(pref), str(fa)],
        check=True, capture_output=True,
    )
    gfa = f"{pref}.utg.final.gfa"
    segs = [l.split("\t")[1] for l in open(gfa) if l.startswith("S\t")]
    genes = ["nad1", "cox1", "atp6", "rps3", "rrn18", "nad4L", "trnM-CAU"]
    hits = []
    for i, g in enumerate(genes):
        seg = segs[i % len(segs)]
        start = 100 + 37 * i
        hits.append((g, seg, start, start + 600, "+-"[i % 2], 3.2e-40, 512.5 + i))
    tbl = tmp_path / "real.tblout"
    _real_tblout(tbl, hits)

    # parser-level sanity
    from oatk_tpu.annot.db import OG_MITO, hmm_annot_read

    db = hmm_annot_read(str(tbl), None, OG_MITO)
    assert db.n == len(hits)
    assert set(db.gnames) == set(genes)

    # byte parity: reference pathfinder consumes the same file
    subprocess.run(
        [str(REFBIN / "pathfinder"), "-m", str(tbl), "-o", str(tmp_path / "ref"), gfa],
        check=True, capture_output=True,
    )
    from oatk_tpu.pathfind.driver import pathfinder

    pathfinder(gfa, str(tbl), None, out_pref=str(tmp_path / "mine"))
    for suff in ("ctg.fasta", "ctg.bed", "gfa", "bed"):
        a = (tmp_path / f"ref.mito.{suff}").read_bytes()
        b = (tmp_path / f"mine.mito.{suff}").read_bytes()
        assert a == b, f"mito.{suff} differs with real-format tblout"
