"""Native C error correction (native/ec.c) == Python asm/ec.py on
randomized erroneous assemblies: spliced read arrays, rebuilt syncmer DB
state, and the EC stats table must match exactly."""
import os
import pickle
import tempfile

import numpy as np
import pytest

from genome_sim import random_genome, sample_reads, write_reads


@pytest.mark.parametrize("seed", [200, 203])
def test_native_ec_equals_python(seed, monkeypatch):
    from oatk_tpu import native
    from oatk_tpu.asm import ec as EC
    from oatk_tpu.asm.consensus import scg_consensus
    from oatk_tpu.asm.pipeline import load_reads
    from oatk_tpu.asm.scg import make_syncmer_graph
    from oatk_tpu.index.syncmer_db import collect_syncmer_db

    if not native.available():
        pytest.skip("native library unavailable")

    rng = np.random.default_rng(seed)
    a = random_genome(rng, 8000)
    rep = random_genome(rng, 2500)
    b = random_genome(rng, 7000)
    reads = sample_reads(rng, a + rep + b + rep, coverage=14, read_len=2200, err_rate=0.0025)
    td = tempfile.mkdtemp()
    fa = os.path.join(td, "r.fa")
    write_reads(fa, reads)

    def run(force_python):
        rd = load_reads([fa], 251, 17, 0, True)
        scm = collect_syncmer_db(rd)
        scg = make_syncmer_graph(rd, scm, 0, 0.0)
        scg_consensus(rd, scg, hoco_seq=True, save_seq=True, fo=None)
        stats_seen = {}
        orig = EC._correct_reads_native
        if force_python:
            monkeypatch.setattr(EC, "_correct_reads_native", lambda *a, **k: False)
        else:
            def capture(rdb, s, m, stats, *a, **kw):
                ok = orig(rdb, s, m, stats, *a, **kw)
                stats_seen["v"] = stats.copy()
                return ok
            monkeypatch.setattr(EC, "_correct_reads_native", capture)
        EC.read_error_correction(rd, scg, 0.02, 3, 30, 3, 0.35, 0)
        monkeypatch.undo()
        return rd, scm

    rd1, scm1 = run(force_python=False)
    rd2, scm2 = run(force_python=True)

    for r1, r2 in zip(rd1.reads, rd2.reads):
        assert np.array_equal(r1.k_mer, r2.k_mer)
        assert np.array_equal(r1.m_pos, r2.m_pos)
        assert np.array_equal(r1.s_mer, r2.s_mer)
    assert np.array_equal(scm1.cov, scm2.cov)
    assert np.array_equal(scm1.del_, scm2.del_)
    for p1, p2 in zip(scm1.m_pos, scm2.m_pos):
        assert np.array_equal(p1, p2)
