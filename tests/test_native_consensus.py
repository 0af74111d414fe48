"""Native C consensus loops must reproduce the pure-Python path exactly
(byte output and overlap modes) on randomized assemblies."""
import numpy as np
import pytest

from genome_sim import random_genome, sample_reads, write_reads


def _build(tmp_path, rng, with_repeat: bool):
    g = random_genome(rng, int(rng.integers(12000, 30000)))
    if with_repeat:
        rep = random_genome(rng, 2500)
        g = g + rep + random_genome(rng, 6000) + rep
    reads = sample_reads(rng, g, coverage=float(rng.integers(8, 20)),
                         read_len=int(rng.integers(1800, 3200)))
    fa = tmp_path / "r.fa"
    write_reads(str(fa), reads)
    from oatk_tpu.asm.pipeline import load_reads
    from oatk_tpu.asm.scg import make_syncmer_graph, process_mergeable_unitigs
    from oatk_tpu.index.syncmer_db import collect_syncmer_db

    rd = load_reads([str(fa)], 251, 17)
    db = collect_syncmer_db(rd)
    scg = make_syncmer_graph(rd, db, 3, 0.35)
    process_mergeable_unitigs(scg)
    return rd, db, scg


def test_native_consensus_matches_python(tmp_path, rng):
    from oatk_tpu import native
    from oatk_tpu.asm import consensus as C

    if not native.available():
        pytest.skip("native library unavailable")
    rd, db, scg = _build(tmp_path, rng, with_repeat=True)
    flats = C._Flats.build(rd, db)
    assert flats is not None
    utg = scg.utg
    n_checked = 0
    for i in range(utg.n_vtx):
        if utg.vtx_del[i]:
            continue
        for hoco_seq in (False, True):
            a_out: list[bytes] = []
            b_out: list[bytes] = []
            la = C.unitig_consensus(rd, db, utg.vtx_a[i], a_out, hoco_seq, flats)
            lb = C.unitig_consensus(rd, db, utg.vtx_a[i], b_out, hoco_seq, None)
            assert la == lb
            assert b"".join(a_out) == b"".join(b_out)
        n_checked += 1
    assert n_checked > 0

    # overlap modes across arc endpoint pairs (incl. reverse orientations)
    utg._flush_pending()
    n_arcs = 0
    for ai in range(len(utg.av)):
        if utg.adel[ai]:
            continue
        v, t = int(utg.av[ai]), int(utg.aw[ai])
        a = utg.vtx_a[v >> 1]
        vv = int(a[0] if (v & 1) else a[-1]) ^ (v & 1)
        a2 = utg.vtx_a[t >> 1]
        tt = int(a2[-1] if (t & 1) else a2[0]) ^ (t & 1)
        x = C.calc_syncmer_overlap(rd, db, vv >> 1, vv & 1, tt >> 1, tt & 1, flats)
        y = C.calc_syncmer_overlap(rd, db, vv >> 1, vv & 1, tt >> 1, tt & 1, None)
        assert x == y
        n_arcs += 1
