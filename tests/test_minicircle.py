"""Minicircle mode end-to-end (self-consistency; the reference needs a
real nhmmscan for -M so there is no binary parity oracle here)."""
import stat
import subprocess

import numpy as np

from genome_sim import random_genome, sample_reads, write_reads
from test_tools_parity import FAKE_NHMMSCAN


def test_oatk_minicircle_mode(tmp_path, rng):
    # small circular "animal mito"-like genome; reads long enough to span
    # it multiple times (rolling-circle style templates)
    genome = random_genome(rng, 4000)
    tandem = genome * 4
    reads = []
    for _ in range(60):
        start = int(rng.integers(len(genome)))
        L = int(rng.integers(6000, 11000))
        seq = (tandem + tandem)[start : start + L]
        reads.append(seq)
    fa = tmp_path / "reads.fa"
    write_reads(str(fa), reads)

    exe = tmp_path / "fake_nhmmscan"
    exe.write_text(FAKE_NHMMSCAN.replace("gene$i", "mini$i"))
    exe.chmod(exe.stat().st_mode | stat.S_IEXEC)
    (tmp_path / "fake.hmm").write_text("dummy\n")

    from oatk_tpu.cli.oatk import main

    ret = main([
        "-k", "101", "-s", "13", "-c", "3", "--no-read-ec", "--unzip-round", "0",
        "-M", "-m", str(tmp_path / "fake.hmm"), "--nhmmscan", str(exe),
        "-o", str(tmp_path / "oatk.asm"), str(fa),
    ])
    assert ret == 0
    fasta = (tmp_path / "oatk.asm.mini.ctg.fasta").read_text()
    assert fasta.startswith(">")
    seq = "".join(fasta.splitlines()[1:])
    # the extracted minicircle unit should be ~ the 4 kb monomer
    assert abs(len(seq) - len(genome)) < 500, len(seq)
    gfa = (tmp_path / "oatk.asm.mini.gfa").read_text()
    assert gfa.startswith("H\t")
