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


def test_native_ma_blocks_equals_python():
    """Native ma_blocks (LCS + synchronized merge walk) == the Python
    _make_ma_blocks, including the multi-alignment (n>1) merge branches,
    on randomized synthetic alignments."""
    from types import SimpleNamespace

    from oatk_tpu import native
    from oatk_tpu.asm import coverage as COV
    from oatk_tpu.asm.align import RaFrag, ReadAln

    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(31337)
    for case in range(200):
        n_utg = int(rng.integers(2, 6))
        vtx_a = [
            (rng.integers(0, 30, int(rng.integers(5, 40))).astype(np.uint64) << np.uint64(1))
            | rng.integers(0, 2, 1).astype(np.uint64)[0]
            for _ in range(n_utg)
        ]
        n_scm = int(rng.integers(5, 40))
        kmer = rng.integers(0, 30, n_scm).astype(np.uint64) << np.uint64(1)
        read = SimpleNamespace(k_mer=kmer)
        g = SimpleNamespace(vtx_a=vtx_a)
        scg = SimpleNamespace(utg=g)
        n_aln = int(rng.integers(1, 4))
        alns = []
        for _ in range(n_aln):
            nf = int(rng.integers(1, 4))
            cuts = np.sort(rng.choice(np.arange(1, n_scm), size=min(nf - 1, n_scm - 2),
                                      replace=False)) if nf > 1 else np.zeros(0, np.int64)
            bounds = [0, *[int(c) for c in cuts], n_scm - 1]
            frags = []
            for f in range(len(bounds) - 1):
                sb = bounds[f] + (1 if f else 0)
                se = bounds[f + 1]
                if sb > se:
                    sb = se
                u = int(rng.integers(n_utg))
                un = len(vtx_a[u])
                ub = int(rng.integers(un))
                ue = min(un - 1, ub + (se - sb) + int(rng.integers(0, 3)))
                frags.append(RaFrag((u << 1) | int(rng.integers(2)), ub, ue, sb, se))
            alns.append(ReadAln(0, frags))
        # native path
        va_flat = np.concatenate(vtx_a).astype(np.uint64, copy=False)
        va_off = np.zeros(n_utg + 1, np.int64)
        np.cumsum(np.fromiter((len(a) for a in vtx_a), np.int64, count=n_utg),
                  out=va_off[1:])
        scm_arr = np.ascontiguousarray(kmer >> np.uint64(1), np.int64)
        rows, cut = [], [0]
        for ra in alns:
            for f in ra.frags:
                rows.append((f.uid, f.u_beg, f.u_end, f.s_beg, f.s_end, 0))
            cut.append(len(rows))
        frag6 = np.asarray(rows, np.int64).reshape(len(rows), 6)
        aln_cut = np.asarray(cut, np.int64)
        nm_c, um_c = native.ma_blocks_native(scm_arr, frag6, aln_cut, va_flat, va_off)
        nm_p, um_p = COV._make_ma_blocks(scg, read, alns)
        assert list(nm_c) == list(nm_p), (case, list(nm_c), nm_p)
        assert [list(r) for r in um_c] == [list(r) for r in um_p], case


def test_native_ma_blocks_batch_equals_python(monkeypatch):
    """The single-call threaded batch (ma_blocks_batch) must reproduce
    the per-read Python _make_ma_blocks flattening exactly: same block
    counts, same n_match, same uid stream, same per-read cuts."""
    from oatk_tpu import native
    from oatk_tpu.asm import coverage as COV
    from oatk_tpu.asm.align import scg_read_alignment
    from oatk_tpu.asm.scg import Scg  # noqa: F401 (import check)

    if not native.available():
        pytest.skip("native library unavailable")
    rd, scg = _setup(101)
    ra_db = scg_read_alignment(rd, scg, for_unzip=False)
    g = scg.utg
    by_read = {}
    for ra in ra_db:
        by_read.setdefault(ra.sid, []).append(ra)

    n_vtx = g.n_vtx
    va_flat = np.concatenate(
        [g.vtx_a[i] if g.vtx_a[i] is not None else np.zeros(0, np.uint64)
         for i in range(n_vtx)]
    ).astype(np.uint64, copy=False)
    va_off = np.zeros(n_vtx + 1, np.int64)
    np.cumsum(
        np.fromiter(
            (len(g.vtx_a[i]) if g.vtx_a[i] is not None else 0 for i in range(n_vtx)),
            np.int64, count=n_vtx,
        ),
        out=va_off[1:],
    )
    scm_l, scm_off, rows, aln_cut, rao = [], [0], [], [0], [0]
    for sid, alns in by_read.items():
        km = rd.reads[sid].k_mer
        scm_l.append(np.ascontiguousarray(km >> np.uint64(1), np.int64))
        scm_off.append(scm_off[-1] + len(km))
        for ra in alns:
            for f in ra.frags:
                rows.append((f.uid, f.u_beg, f.u_end, f.s_beg, f.s_end, 0))
            aln_cut.append(len(rows))
        rao.append(len(aln_cut) - 1)
    nm_c, u_c, cut_c = native.ma_blocks_batch_native(
        np.concatenate(scm_l), np.asarray(scm_off, np.int64),
        np.asarray(rows, np.int64).reshape(len(rows), 6),
        np.asarray(aln_cut, np.int64), np.asarray(rao, np.int64),
        va_flat, va_off,
    )
    # python oracle, flattened the same way
    nm_p, u_p, cut_p = [], [], [0]
    for sid, alns in by_read.items():
        n_match, u_match = COV._make_ma_blocks(scg, rd.reads[sid], alns)
        nm_p.extend(int(x) for x in n_match)
        for us in u_match:
            u_p.extend(int(u) for u in us)
        cut_p.append(len(nm_p))
    assert list(nm_c) == nm_p
    assert list(u_c) == u_p
    assert list(cut_c) == cut_p
    assert len(nm_p) > 0  # non-degenerate case


def test_flat_coverage_equals_object_path():
    """scg_ra_utg_coverage over the aligner's flat arrays (RaDB.flat)
    must produce identical unitig coverage to the ReadAln-object path."""
    from oatk_tpu import native
    from oatk_tpu.asm.align import scg_read_alignment
    from oatk_tpu.asm.coverage import scg_ra_utg_coverage

    if not native.available():
        pytest.skip("native library unavailable")
    rd, scg = _setup(104)
    ra_db = scg_read_alignment(rd, scg, for_unzip=False)
    assert getattr(ra_db, "flat", None) is not None and len(ra_db) > 0

    cov_before = scg.utg.vtx_cov.copy()
    scg_ra_utg_coverage(scg, rd, ra_db)
    cov_flat = scg.utg.vtx_cov.copy()

    scg.utg.vtx_cov[:] = cov_before
    ra_plain = list(ra_db)  # strips .flat -> per-read object path
    scg_ra_utg_coverage(scg, rd, ra_plain)
    assert np.array_equal(cov_flat, scg.utg.vtx_cov)


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


def test_thread_count_determinism(tmp_path, monkeypatch):
    """All threaded native stages must produce identical output at any
    worker count (ordered merges; the reference's kt_for model)."""
    import subprocess as sp

    from oatk_tpu import native

    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(77)
    a = random_genome(rng, 7000)
    rep = random_genome(rng, 2200)
    reads = sample_reads(rng, a + rep + random_genome(rng, 5000) + rep,
                         coverage=14, read_len=2100, err_rate=0.002)
    fa = tmp_path / "reads.fa"
    write_reads(str(fa), reads)

    outs = []
    for t in (1, 8):
        monkeypatch.setenv("OATK_TPU_THREADS", str(t))
        from oatk_tpu.asm.pipeline import syncasm

        syncasm([str(fa)], k=251, s=17, min_k_cov=3, do_ec=True, do_unzip=3,
                out=str(tmp_path / f"t{t}"))
        outs.append((tmp_path / f"t{t}.utg.final.gfa").read_bytes())
        monkeypatch.undo()
    assert outs[0] == outs[1] and outs[0]


def _strip_flat(ra_db):
    """Materialized plain-list copy (forces every consumer down the
    per-ReadAln object loops)."""
    return list(ra_db)


@pytest.mark.parametrize("seed", [105, 107])
def test_arc_coverage_flat_equals_objects(seed):
    """scg_ra_arc_coverage's vectorized chain_tables path must set the
    exact acov values the per-object dict loop produces (bit-exact --
    float accumulation order is preserved)."""
    from oatk_tpu import native
    from oatk_tpu.asm import align as AL
    from oatk_tpu.asm.coverage import scg_ra_arc_coverage

    if not native.available():
        pytest.skip("native library unavailable")
    rd, scg = _setup(seed)
    ra = AL.scg_read_alignment(rd, scg, for_unzip=False)
    assert getattr(ra, "flat", None) is not None
    # the vectorized path must actually engage (not fall back silently)
    assert AL.chain_tables(scg.utg, scg.idx, ra.flat) is not None

    scg_flat = type(scg)(scg.scm_db, scg.utg.copy(), scg.idx)
    scg_ra_arc_coverage(scg_flat, rd, ra, refine=False)

    scg_obj = type(scg)(scg.scm_db, scg.utg.copy(), scg.idx)
    scg_ra_arc_coverage(scg_obj, rd, _strip_flat(ra), refine=False)

    assert np.array_equal(scg_flat.utg.acov, scg_obj.utg.acov)


@pytest.mark.parametrize("seed", [106])
def test_multiplex_flat_equals_objects(seed):
    """scg_multiplex driven by the flat arrays must transform the graph
    exactly like the per-object triplet loop."""
    from oatk_tpu import native
    from oatk_tpu.asm import align as AL
    from oatk_tpu.asm.unzip import scg_multiplex

    if not native.available():
        pytest.skip("native library unavailable")
    rd, scg = _setup(seed)
    max_n_scm = int(np.ceil(30000.0 / rd.k))
    ra = AL.scg_read_alignment(rd, scg, for_unzip=True)
    assert getattr(ra, "flat", None) is not None
    assert AL.chain_tables(scg.utg, scg.idx, ra.flat) is not None

    scg_a = type(scg)(scg.scm_db, scg.utg.copy(), scg.idx)
    scg_a.rebuild_index()
    upd_a = scg_multiplex(scg_a, ra, max_n_scm, 10, 0.3)

    scg_b = type(scg)(scg.scm_db, scg.utg.copy(), scg.idx)
    scg_b.rebuild_index()
    upd_b = scg_multiplex(scg_b, _strip_flat(ra), max_n_scm, 10, 0.3)

    assert upd_a == upd_b
    ga, gb = scg_a.utg, scg_b.utg
    ga._flush_pending()
    gb._flush_pending()
    assert len(ga.av) == len(gb.av)
    for name in ("av", "aw", "aln", "adel", "acomp"):
        assert np.array_equal(getattr(ga, name), getattr(gb, name)), name
    assert ga.n_vtx == gb.n_vtx
    for i in range(ga.n_vtx):
        assert bool(ga.vtx_del[i]) == bool(gb.vtx_del[i])
        if not ga.vtx_del[i]:
            assert np.array_equal(ga.vtx_a[i], gb.vtx_a[i])
