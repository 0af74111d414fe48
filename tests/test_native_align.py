"""Native C alignment chaining + LCS == Python reference implementations
on randomized assemblies (the Python paths remain the oracle)."""
import os
import tempfile

import numpy as np
import pytest

from genome_sim import random_genome, sample_reads, write_reads


def _setup(seed):
    from oatk_tpu.asm.pipeline import load_reads
    from oatk_tpu.asm.scg import make_syncmer_graph, process_mergeable_unitigs
    from oatk_tpu.index.syncmer_db import collect_syncmer_db

    rng = np.random.default_rng(seed)
    a = random_genome(rng, 8000)
    rep = random_genome(rng, 2500)
    b = random_genome(rng, 7000)
    reads = sample_reads(rng, a + rep + b + rep, coverage=14, read_len=2200, err_rate=0.002)
    td = tempfile.mkdtemp()
    fa = os.path.join(td, "r.fa")
    write_reads(fa, reads)
    rd = load_reads([fa], 251, 17, 0, True)
    scm = collect_syncmer_db(rd)
    scg = make_syncmer_graph(rd, scm, 3, 0.35)
    process_mergeable_unitigs(scg)
    return rd, scg


def _ra_equal(ra1, ra2):
    assert len(ra1) == len(ra2)
    for x, y in zip(ra1, ra2):
        assert x.sid == y.sid and abs(x.s - y.s) < 1e-12 and len(x.frags) == len(y.frags)
        for fx, fy in zip(x.frags, y.frags):
            assert (fx.uid, fx.u_beg, fx.u_end, fx.s_beg, fx.s_end) == (
                fy.uid, fy.u_beg, fy.u_end, fy.s_beg, fy.s_end,
            )


@pytest.mark.parametrize("seed", [101, 104])
def test_native_align_equals_python(seed, monkeypatch):
    from oatk_tpu import native
    from oatk_tpu.asm import align as AL

    if not native.available():
        pytest.skip("native library unavailable")
    rd, scg = _setup(seed)
    ra_native = AL.scg_read_alignment(rd, scg, for_unzip=False)
    monkeypatch.setattr(native, "available", lambda: False)
    ra_py = AL.scg_read_alignment(rd, scg, for_unzip=False)
    monkeypatch.undo()
    _ra_equal(ra_native, ra_py)

    ra_native_u = AL.scg_read_alignment(rd, scg, for_unzip=True, old_ra_db=ra_native)
    monkeypatch.setattr(native, "available", lambda: False)
    ra_py_u = AL.scg_read_alignment(rd, scg, for_unzip=True, old_ra_db=ra_py)
    monkeypatch.undo()
    _ra_equal(ra_native_u, ra_py_u)


def test_native_lcs_equals_python(monkeypatch):
    from oatk_tpu import native
    from oatk_tpu.asm import coverage as COV

    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(7)
    for _ in range(300):
        sn = int(rng.integers(1, 40))
        un = int(rng.integers(1, 40))
        alpha = int(rng.integers(2, 8))
        s = rng.integers(0, alpha, sn).astype(np.int64)
        u = rng.integers(0, alpha, un).astype(np.int64)
        off = int(rng.integers(0, 100))
        got = COV._find_lcs(s, u, off)
        monkeypatch.setattr(native, "available", lambda: False)
        want = COV._find_lcs(s, u, off)
        monkeypatch.undo()
        assert got == want, (s.tolist(), u.tolist(), off, got, want)
