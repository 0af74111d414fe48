"""path_to_fasta / rotate / hmmannot / oatk wrapper parity tests."""
import os
import stat
import subprocess
from pathlib import Path

import numpy as np
import pytest

from genome_sim import random_genome, sample_reads, write_reads

REFBIN = Path("/root/refbin")


def _mk_gfa(tmp_path, rng, glen=18000):
    genome = random_genome(rng, glen)
    reads = sample_reads(rng, genome, coverage=14, read_len=2500)
    fa = tmp_path / "reads.fa"
    write_reads(str(fa), reads)
    pref = tmp_path / "asm"
    subprocess.run(
        [str(REFBIN / "syncasm"), "-k", "251", "-s", "17", "-c", "3",
         "--no-read-ec", "--unzip-round", "0", "-o", str(pref), str(fa)],
        check=True, capture_output=True,
    )
    return f"{pref}.utg.final.gfa"


def _segs(gfa):
    out = []
    for line in open(gfa):
        if line.startswith("S\t"):
            out.append(line.split("\t")[1])
    return out


def test_path_to_fasta_parity(tmp_path, rng):
    gfa = _mk_gfa(tmp_path, rng)
    segs = _segs(gfa)
    pstr = ",".join(f"{s}+" for s in segs)
    ref = subprocess.run(
        [str(REFBIN / "path_to_fasta"), gfa, pstr], capture_output=True, text=True, check=True
    ).stdout
    from oatk_tpu.cli.path_to_fasta import main

    out = tmp_path / "mine.fa"
    assert main([gfa, pstr, "-o", str(out)]) == 0
    assert out.read_text() == ref

    # --linear + custom wrap + gap
    ref2 = subprocess.run(
        [str(REFBIN / "path_to_fasta"), "--linear", "-l", "80", "-n", "10", gfa, pstr],
        capture_output=True, text=True, check=True,
    ).stdout
    out2 = tmp_path / "mine2.fa"
    assert main(["--linear", "-l", "80", "-n", "10", gfa, pstr, "-o", str(out2)]) == 0
    assert out2.read_text() == ref2


def test_rotate_parity(tmp_path, rng):
    fa = tmp_path / "in.fa"
    seqs = {f"ctg{i}": random_genome(rng, int(rng.integers(500, 3000))) for i in range(3)}
    with open(fa, "w") as f:
        for n, s in seqs.items():
            f.write(f">{n}\n{s}\n")
    # positional rotation
    ref = subprocess.run(
        [str(REFBIN / "rotate"), str(fa), "ctg1", "137"], capture_output=True, text=True, check=True
    ).stdout
    from oatk_tpu.cli.rotate import main

    out = tmp_path / "o1.fa"
    assert main([str(fa), "ctg1", "137", "-o", str(out)]) == 0
    assert out.read_text() == ref
    # reverse strand
    ref2 = subprocess.run(
        [str(REFBIN / "rotate"), "-r", str(fa), "ctg2", "93"], capture_output=True, text=True, check=True
    ).stdout
    out2 = tmp_path / "o2.fa"
    assert main(["-r", str(fa), "ctg2", "93", "-o", str(out2)]) == 0
    assert out2.read_text() == ref2
    # batch file with strands
    rot = tmp_path / "rot.txt"
    rot.write_text("ctg0 17 -\nctg2 250 +\n")
    ref3 = subprocess.run(
        [str(REFBIN / "rotate"), "-s", str(rot), str(fa)], capture_output=True, text=True, check=True
    ).stdout
    out3 = tmp_path / "o3.fa"
    assert main(["-s", str(rot), str(fa), "-o", str(out3)]) == 0
    assert out3.read_text() == ref3


FAKE_NHMMSCAN = """#!/bin/bash
# fake nhmmscan: --noali --cpu 1 -o /dev/null --tblout OUT DB IN
out=""; db=""; fin=""
while [[ $# -gt 0 ]]; do
  case "$1" in
    --tblout) out="$2"; shift 2;;
    --noali|--cpu|-o) [[ "$1" == "--noali" ]] && shift || shift 2;;
    *) if [[ -z "$db" ]]; then db="$1"; else fin="$1"; fi; shift;;
  esac
done
: > "$out"
i=0
grep '^>' "$fin" | sed 's/>//' | while read -r name rest; do
  i=$((i+1))
  echo "gene$i - $name - 1 500 100 600 90 610 500 + 1e-30 450.0 0.5 -" >> "$out"
done
"""


def test_hmm_annotate_fake(tmp_path, rng):
    # fake nhmmscan executable; verify batching + tblout concatenation
    exe = tmp_path / "fake_nhmmscan"
    exe.write_text(FAKE_NHMMSCAN)
    exe.chmod(exe.stat().st_mode | stat.S_IEXEC)
    fa = tmp_path / "seqs.fa"
    with open(fa, "w") as f:
        for i in range(7):
            f.write(f">s{i}\n{random_genome(rng, 800)}\n")
    from oatk_tpu.annot.runner import hmm_annotate

    out = tmp_path / "annot.txt"
    with open(out, "w") as fo:
        hmm_annotate([str(fa)], str(exe), "db.hmm", fo, max_batch_size=2000, max_batch_num=10, n_threads=2)
    lines = [l for l in out.read_text().splitlines() if l.strip()]
    assert len(lines) == 7
    names = {l.split()[2] for l in lines}
    assert names == {f"s{i}" for i in range(7)}

    # parse the result through the annot DB
    from oatk_tpu.annot.db import OG_MITO, hmm_annot_read

    db = hmm_annot_read(str(out), None, OG_MITO)
    assert db.n == 7 and db.n_seg == 7


def test_oatk_input_gfa_mode_parity(tmp_path, rng):
    """oatk -G (restart from a user GFA) vs the reference binary: with the
    same stub nhmmscan both sides are fully deterministic, so every output
    file (annotation tblout + 4 pathfinder files) must be byte-identical."""
    gfa = _mk_gfa(tmp_path, rng, glen=22000)
    exe = tmp_path / "fake_nhmmscan"
    exe.write_text(FAKE_NHMMSCAN.replace("gene$i", "nad$i"))
    exe.chmod(exe.stat().st_mode | stat.S_IEXEC)
    (tmp_path / "fake.hmm").write_text("dummy\n")

    subprocess.run(
        [str(REFBIN / "oatk"), "-G", "-m", str(tmp_path / "fake.hmm"),
         "--nhmmscan", str(exe), "-o", str(tmp_path / "ref.asm"), gfa],
        check=True, capture_output=True,
    )
    from oatk_tpu.cli.oatk import main

    ret = main([
        "-G", "-m", str(tmp_path / "fake.hmm"), "--nhmmscan", str(exe),
        "-o", str(tmp_path / "mine.asm"), gfa,
    ])
    assert ret == 0
    for suff in ("annot_mito.txt", "mito.gfa", "mito.bed", "mito.ctg.fasta", "mito.ctg.bed"):
        a = (tmp_path / f"ref.asm.{suff}").read_bytes()
        b = (tmp_path / f"mine.asm.{suff}").read_bytes()
        assert a == b, f"{suff} differs"


def test_oatk_rejects_missing_db(tmp_path, capsys):
    from oatk_tpu.cli.oatk import main

    ret = main(["-m", "/nonexistent.hmm", "-o", str(tmp_path / "x"), "in.fa"])
    assert ret == 1


def test_oatk_wrapper_with_fake_nhmmscan(tmp_path, rng):
    """Full wrapper: reads -> assembly -> (fake) annotation -> pathfinder."""
    exe = tmp_path / "fake_nhmmscan"
    # fake scan emitting mito-like genes on every segment
    exe.write_text(FAKE_NHMMSCAN.replace("gene$i", "nad$i"))
    exe.chmod(exe.stat().st_mode | stat.S_IEXEC)
    genome = random_genome(rng, 20000)
    reads = sample_reads(rng, genome, coverage=15, read_len=3000)
    fa = tmp_path / "reads.fa"
    write_reads(str(fa), reads)
    (tmp_path / "fake.hmm").write_text("dummy\n")

    from oatk_tpu.cli.oatk import main

    ret = main([
        "-k", "251", "-s", "17", "-c", "3", "--no-read-ec", "--unzip-round", "0",
        "-m", str(tmp_path / "fake.hmm"), "--nhmmscan", str(exe),
        "-o", str(tmp_path / "oatk.asm"), str(fa),
    ])
    assert ret == 0
    fasta = (tmp_path / "oatk.asm.mito.ctg.fasta").read_text()
    assert fasta.startswith(">ctg000001")
    # assembled circular contig should be ~genome size
    seq = "".join(fasta.splitlines()[1:])
    assert abs(len(seq) - len(genome)) < 2000


def test_syncasm_data_cap_multifile_parity(tmp_path, rng):
    """-D cap with multi-file (plain + gz) input must truncate at the
    same read boundary as the reference (sstream semantics)."""
    import gzip

    genome = random_genome(rng, 25000)
    reads = sample_reads(rng, genome, coverage=24, read_len=2600)
    half = len(reads) // 2
    p1 = tmp_path / "p1.fa"
    with open(p1, "w") as f:
        for i, r in enumerate(reads[:half]):
            f.write(f">a{i}\n{r}\n")
    p2 = tmp_path / "p2.fa.gz"
    with gzip.open(p2, "wt") as f:
        for i, r in enumerate(reads[half:]):
            f.write(f">b{i}\n{r}\n")

    subprocess.run(
        [str(REFBIN / "syncasm"), "-k", "251", "-s", "17", "-c", "3", "-D", "400K",
         "--no-read-ec", "--unzip-round", "0", "-o", str(tmp_path / "ref"),
         str(p1), str(p2)],
        check=True, capture_output=True,
    )
    from oatk_tpu.cli.syncasm import main

    ret = main(["-k", "251", "-s", "17", "-c", "3", "-D", "400K",
                "--no-read-ec", "--unzip-round", "0",
                "-o", str(tmp_path / "mine"), str(p1), str(p2)])
    assert ret == 0
    a = (tmp_path / "ref.utg.final.gfa").read_bytes()
    b = (tmp_path / "mine.utg.final.gfa").read_bytes()
    assert a == b


def test_hmm_annotate_streaming_overlap(tmp_path, monkeypatch):
    """kt_pipeline semantics (run_hmmannot.c:130-333): batch splitting,
    nhmmscan execution and tblout concat overlap, and in-flight temp
    files stay bounded.  A slow input iterator (0.1 s/seq) plus a slow
    fake nhmmscan (0.4 s/batch) make the overlap measurable: serialized
    split-then-scan would take split + ceil(n/threads)*scan; the
    streaming pipeline must beat split + 2*scan."""
    import time

    exe = tmp_path / "slow_nhmmscan"
    exe.write_text(FAKE_NHMMSCAN.replace(": > \"$out\"", "sleep 0.4\n: > \"$out\""))
    exe.chmod(exe.stat().st_mode | stat.S_IEXEC)

    from oatk_tpu.annot import runner

    n_seq, seq = 12, "ACGT" * 200
    fa = tmp_path / "seqs.fa"
    with open(fa, "w") as f:
        for i in range(n_seq):
            f.write(f">s{i}\n{seq}\n")

    real_iter = runner._iter_seqs

    def slow_iter(path):
        for item in real_iter(path):
            time.sleep(0.1)
            yield item

    monkeypatch.setattr(runner, "_iter_seqs", slow_iter)

    tmpdir = tmp_path / "tmp_annot"
    peak = {"n": 0}
    stop = {"v": False}

    def watch():
        while not stop["v"]:
            if tmpdir.is_dir():
                peak["n"] = max(peak["n"], len(list(tmpdir.iterdir())))
            time.sleep(0.005)

    import threading

    w = threading.Thread(target=watch, daemon=True)
    w.start()
    out = tmp_path / "annot.txt"
    t0 = time.time()
    with open(out, "w") as fo:
        runner.hmm_annotate(
            [str(fa)], str(exe), "db.hmm", fo,
            max_batch_size=1, max_batch_num=2, n_threads=4,
            tmpdir=str(tmpdir),
        )
    wall = time.time() - t0
    stop["v"] = True
    w.join()

    split_t, scan_t = n_seq * 0.1, 0.4
    # serialized: split + ceil(12/4)*scan = 1.2 + 1.2 = 2.4 s minimum
    assert wall < split_t + 2 * scan_t, f"no overlap: wall={wall:.2f}s"
    # bounded in-flight temp files: (queue 2 + reading + draining) units
    # x max_batch_num batches x 2 files
    assert 0 < peak["n"] <= 4 * 2 * 2, peak["n"]
    lines = [l for l in out.read_text().splitlines() if l.strip()]
    assert len(lines) == n_seq
    assert [l.split()[2] for l in lines] == [f"s{i}" for i in range(n_seq)]


def test_threads_flag_plumbed_to_native_pools(tmp_path, rng, monkeypatch):
    """`syncasm -t N` must size every native threaded stage (reference
    run_syncasm.c:360,381: one value governs parse/align/EC pools).
    Observed via native.n_threads_default(), which every native wrapper
    (align_batch, ec_correct_reads, parse_fastx_hoco_mt, sorts) consults
    at call time."""
    from oatk_tpu import native
    from oatk_tpu.asm import pipeline

    genome = random_genome(rng, 16000)
    reads = sample_reads(rng, genome, coverage=12, read_len=2500)
    fa = tmp_path / "reads.fa"
    write_reads(str(fa), reads)

    seen: list[int] = []
    orig_stat = pipeline.read_db_stat

    def spy_stat(*a, **kw):
        seen.append(native.n_threads_default())
        return orig_stat(*a, **kw)

    monkeypatch.setattr(pipeline, "read_db_stat", spy_stat)

    from oatk_tpu.cli.syncasm import main

    # -t 1: single-threaded native stages (reproducible-timing contract)
    ret = main(["-k", "251", "-s", "17", "-c", "3", "-t", "1",
                "--no-read-ec", "--unzip-round", "0",
                "-o", str(tmp_path / "t1"), str(fa)])
    assert ret == 0
    assert seen and all(v == 1 for v in seen), seen

    seen.clear()
    ret = main(["-k", "251", "-s", "17", "-c", "3", "-t", "3",
                "--no-read-ec", "--unzip-round", "0",
                "-o", str(tmp_path / "t3"), str(fa)])
    assert ret == 0
    assert seen and all(v == 3 for v in seen), seen
    # override restored after the run (library callers keep auto width)
    assert native._n_threads_override == 0

    # -t must not change outputs, only pool width
    a = (tmp_path / "t1.utg.final.gfa").read_bytes()
    b = (tmp_path / "t3.utg.final.gfa").read_bytes()
    assert a == b
