"""nhmmscan batch annotation runner (run_hmmannot.c analogue).

Splits FASTA/FASTQ/GFA-S-line input into <= batch_size temp FASTAs and
fans out ``nhmmscan --noali --cpu 1 --tblout`` subprocesses (3 retries
each) over a thread pool, concatenating the tblout results -- the one
deliberately host/subprocess stage of the pipeline
(/root/reference/run_hmmannot.c:107-333).
"""
from __future__ import annotations

import gzip
import os
import shutil
import subprocess
import tempfile
from concurrent.futures import ThreadPoolExecutor

from ..utils import log_error, log_info


def _iter_seqs(path: str):
    """Yield (name, seq) from FASTA/FASTQ(.gz)/GFA S-lines."""
    with open(path, "rb") as raw:
        magic = raw.read(2)
    op = gzip.open if magic == b"\x1f\x8b" else open
    mode = "rt"
    is_fa = is_fq = is_gfa = False
    name, chunks = None, []
    with op(path, mode) as fp:
        it = iter(fp)
        for line in it:
            line = line.rstrip("\n")
            if not line:
                continue
            if not is_gfa and line[0] == ">":
                is_fa = True
                if name is not None:
                    yield name, "".join(chunks)
                name = line[1:].split()[0]
                chunks = []
            elif not is_gfa and not is_fa and line[0] == "@":
                is_fq = True
                nm = line[1:].split()[0]
                seq = next(it).rstrip("\n")
                next(it)
                next(it)
                yield nm, seq
            elif is_fa:
                chunks.append(line)
            else:
                is_gfa = True
                f = line.split("\t")
                if f[0] == "S" and len(f) > 2 and f[2] != "*":
                    yield f[1], f[2]
        if name is not None:
            yield name, "".join(chunks)


def run_cmd_retry(cmd: str, retries: int = 3) -> int:
    for i in range(retries):
        ret = subprocess.run(cmd, shell=True).returncode
        if ret == 0:
            return 0
    return ret


def check_executable(exe: str) -> bool:
    return shutil.which(exe) is not None


def hmm_annotate(
    files: list[str],
    nhmmscan: str,
    nhmmdb: str,
    fo,
    max_batch_size: int = 100000,
    max_batch_num: int = 0,
    n_threads: int = 1,
    tmpdir: str | None = None,
) -> int:
    """Annotate sequences against an HMM database, writing tblout to fo."""
    if max_batch_num <= 0:
        max_batch_num = n_threads * 5
    own_tmp = tmpdir is None
    if own_tmp:
        tmpdir = tempfile.mkdtemp(prefix="tmp_")
    os.makedirs(tmpdir, exist_ok=True)

    try:
        for path in files:
            batches: list[tuple[str, str]] = []
            cur_fp = None
            cur_size = 0
            n_seq = l_seq = 0

            def new_batch():
                nonlocal cur_fp, cur_size
                fin = tempfile.NamedTemporaryFile(
                    mode="w", suffix=".fa", dir=tmpdir, delete=False
                )
                fout = fin.name[: -3] + ".out"
                batches.append((fin.name, fout))
                cur_fp = fin
                cur_size = 0

            new_batch()
            for name, seq in _iter_seqs(path):
                if cur_size >= max_batch_size and len(batches) < max_batch_num:
                    cur_fp.close()
                    new_batch()
                cur_fp.write(f">{name}\n{seq}\n")
                cur_size += len(seq)
                n_seq += 1
                l_seq += len(seq)
            cur_fp.close()
            if cur_size == 0 and batches:
                os.unlink(batches[-1][0])
                batches.pop()
            if not batches:
                continue
            log_info(
                f"{n_seq} sequences ({l_seq} bp) loaded in {len(batches)} "
                f"batch{'es' if len(batches) > 1 else ''}",
                func="hmm_annotate",
            )

            def work(batch):
                fin, fout = batch
                cmd = f"{nhmmscan} --noali --cpu 1 -o /dev/null --tblout {fout} {nhmmdb} {fin}"
                ret = run_cmd_retry(cmd, 3)
                if ret != 0:
                    log_error(f"command failed: {cmd}", func="hmm_annotate")
                    raise RuntimeError(cmd)

            with ThreadPoolExecutor(max_workers=max(1, n_threads)) as ex:
                list(ex.map(work, batches))

            for fin, fout in batches:
                with open(fout) as f:
                    shutil.copyfileobj(f, fo)
                os.unlink(fin)
                os.unlink(fout)
    finally:
        if own_tmp:
            shutil.rmtree(tmpdir, ignore_errors=True)
    return 0
