"""Randomized pathfinder parity stress sweep.

python tests/stress_pathfinder.py [n_iters] [seed0]
"""
import subprocess
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent))
sys.path.insert(0, str(Path(__file__).parent.parent))

from genome_sim import random_genome, sample_reads, write_reads  # noqa: E402
from test_pathfinder_parity import (  # noqa: E402
    MITO_GENES,
    PLTD_GENES,
    _cmp_files,
    _parse_gfa_segs,
    _scatter_genes,
    _write_tblout,
)

REFBIN = Path("/root/refbin")


def one_case(seed: int, tmp: Path) -> str:
    rng = np.random.default_rng(seed)
    # build 1-2 genomes, possibly with repeats, then annotations
    n_g = int(rng.integers(1, 3))
    reads = []
    for _ in range(n_g):
        glen = int(rng.integers(8000, 40000))
        g = random_genome(rng, glen)
        if rng.random() < 0.6:
            rep = random_genome(rng, int(rng.integers(1800, 5000)))
            g = g + rep + random_genome(rng, int(rng.integers(4000, 12000))) + rep
        reads += sample_reads(rng, g, float(rng.integers(10, 25)), int(rng.integers(1800, 3500)))
    fa = tmp / "reads.fa"
    write_reads(str(fa), reads)
    subprocess.run(
        [str(REFBIN / "syncasm"), "-k", "251", "-s", "17", "-c", "3",
         "--no-read-ec", "--unzip-round", "0", "-o", str(tmp / "asm"), str(fa)],
        check=True, capture_output=True,
    )
    gfa = tmp / "asm.utg.final.gfa"
    segs = _parse_gfa_segs(gfa)
    if not segs:
        return "empty graph (skipped)"

    both = rng.random() < 0.5
    names = sorted(segs)
    if both and len(names) >= 2:
        half = len(names) // 2
        mito_hits = _scatter_genes(rng, {k: segs[k] for k in names[:half]}, MITO_GENES,
                                   int(rng.integers(3, len(MITO_GENES) + 1)))
        pltd_hits = _scatter_genes(rng, {k: segs[k] for k in names[half:]}, PLTD_GENES,
                                   int(rng.integers(3, len(PLTD_GENES) + 1)))
    else:
        both = False
        mito_hits = _scatter_genes(rng, segs, MITO_GENES, int(rng.integers(2, len(MITO_GENES) + 1)))
        pltd_hits = []
    mito = tmp / "mito.txt"
    _write_tblout(mito, mito_hits)
    pltd = None
    if both:
        pltd = tmp / "pltd.txt"
        _write_tblout(pltd, pltd_hits)

    max_copy = int(rng.choice([5, 10]))
    args = [str(REFBIN / "pathfinder"), "-m", str(mito)]
    if pltd:
        args += ["-p", str(pltd)]
    args += ["-c", str(max_copy), "-o", str(tmp / "ref"), str(gfa)]
    subprocess.run(args, check=True, capture_output=True)

    from oatk_tpu.pathfind.driver import pathfinder

    pathfinder(str(gfa), str(mito), str(pltd) if pltd else None,
               max_copy=max_copy, out_pref=str(tmp / "mine"))
    types = ["mito"] + (["pltd"] if pltd else [])
    for t in types:
        for suff in ("ctg.fasta", "ctg.bed", "gfa", "bed"):
            _cmp_files(tmp / f"ref.{t}.{suff}", tmp / f"mine.{t}.{suff}")
    return f"genomes={n_g} segs={len(segs)} both={both} max_copy={max_copy}"


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    seed0 = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    fails = 0
    for i in range(n):
        seed = seed0 + i
        with tempfile.TemporaryDirectory() as td:
            try:
                desc = one_case(seed, Path(td))
                print(f"[{i+1}/{n}] seed={seed} OK  ({desc})", flush=True)
            except AssertionError as e:
                fails += 1
                print(f"[{i+1}/{n}] seed={seed} FAIL\n{str(e)[:500]}", flush=True)
    print(f"done: {fails} failures / {n}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
