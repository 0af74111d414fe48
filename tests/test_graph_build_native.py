"""Native graph_build_arcs vs the Python dup_free construction.

The C merge (native/graph_build.c) must reproduce the Python fast
path's arc table bit for bit, and hand duplicate-key inputs back to the
generic finalize path exactly like the Python probe does.
"""
import numpy as np
import pytest

from oatk_tpu import native
from oatk_tpu.asm.scg import make_syncmer_graph


class _Mock:
    pass


def _mk_inputs(rng, n, npairs, pal_frac=0.05):
    scm = _Mock()
    scm.n = n
    scm.cov = rng.integers(1, 60, n).astype(np.uint32)
    scm.del_ = np.zeros(n, bool)
    v0 = rng.integers(0, 2 * n, 2 * npairs, dtype=np.uint64)
    v1 = rng.integers(0, 2 * n, 2 * npairs, dtype=np.uint64)
    # force some palindromic pairs (v1 == v0^1)
    npal = int(pal_frac * npairs)
    v1[:npal] = v0[:npal] ^ np.uint64(1)
    flip = v0 > v1
    cv0 = np.where(flip, v1 ^ np.uint64(1), v0)
    cv1 = np.where(flip, v0 ^ np.uint64(1), v1)
    pk = np.unique((cv0 << np.uint64(32)) | cv1)[:npairs]
    counts = rng.integers(1, 30, len(pk)).astype(np.int64)
    rd = _Mock()
    rd.version = 0
    rd._dev_pairs = (0, pk, counts)
    return rd, scm


def _build(rd, scm, monkeypatch, native_on):
    monkeypatch.setenv("OATK_TPU_GRAPH_NATIVE", "1" if native_on else "0")
    scm.del_ = np.zeros(scm.n, bool)
    return make_syncmer_graph(rd, scm, 0, 0.0)


@pytest.mark.skipif(native._load() is None, reason="native lib unavailable")
def test_native_matches_python(monkeypatch):
    rng = np.random.default_rng(11)
    rd, scm = _mk_inputs(rng, 40_000, 44_000)
    a = _build(rd, scm, monkeypatch, True)
    b = _build(rd, scm, monkeypatch, False)
    for f in ("av", "aw", "acov", "acomp", "adel", "alink", "aln", "als"):
        np.testing.assert_array_equal(
            np.asarray(getattr(a.utg, f)), np.asarray(getattr(b.utg, f)), err_msg=f
        )
    # vertex arc index + link ids from the native graph_index_link pass
    for f in ("idx_p", "idx_n"):
        np.testing.assert_array_equal(
            getattr(a.utg, f), getattr(b.utg, f), err_msg=f
        )
    # index identical too (downstream consumers read it)
    for f in ("scm", "rev", "uid", "pos", "start"):
        np.testing.assert_array_equal(getattr(a.idx, f), getattr(b.idx, f), err_msg=f)


@pytest.mark.skipif(native._load() is None, reason="native lib unavailable")
def test_native_matches_python_with_deletions(monkeypatch):
    """min_k_cov > 0 deletes low-coverage vertices: finalize's cleanup
    renumbers, so the analytic index's uid must be the post-cleanup
    rank (and arc filtering must agree with the Python path)."""
    rng = np.random.default_rng(3)
    rd, scm = _mk_inputs(rng, 30_000, 33_000)

    def build(native_on):
        monkeypatch.setenv("OATK_TPU_GRAPH_NATIVE", "1" if native_on else "0")
        scm.del_ = np.zeros(scm.n, bool)
        return make_syncmer_graph(rd, scm, 20, 0.3)

    a = build(True)
    b = build(False)
    for f in ("av", "aw", "acov", "acomp", "adel", "alink", "idx_p", "idx_n"):
        np.testing.assert_array_equal(
            np.asarray(getattr(a.utg, f)), np.asarray(getattr(b.utg, f)), err_msg=f
        )
    for f in ("scm", "rev", "uid", "pos", "start"):
        np.testing.assert_array_equal(getattr(a.idx, f), getattr(b.idx, f), err_msg=f)


@pytest.mark.skipif(native._load() is None, reason="native lib unavailable")
def test_native_dup_detection(monkeypatch):
    """A pair key whose complement key also occurs as a canonical key
    must push BOTH paths onto the generic finalize branch with identical
    results (tandem-duplicated syncmer read from both strands)."""
    rng = np.random.default_rng(5)
    rd, scm = _mk_inputs(rng, 1000, 900)
    pk, counts = rd._dev_pairs[1], rd._dev_pairs[2]
    # inject a (a,a) + (a^1,a^1) canonical duplicate pair
    a = np.uint64(2 * 500)
    k1 = (a << np.uint64(32)) | a
    k2 = ((a ^ np.uint64(1)) << np.uint64(32)) | (a ^ np.uint64(1))
    pk = np.unique(np.concatenate([pk, [k1, k2]]))
    counts = rng.integers(1, 30, len(pk)).astype(np.int64)
    rd._dev_pairs = (0, pk, counts)
    ga = _build(rd, scm, monkeypatch, True)
    gb = _build(rd, scm, monkeypatch, False)
    for f in ("av", "aw", "acov", "acomp"):
        np.testing.assert_array_equal(
            np.asarray(getattr(ga.utg, f)), np.asarray(getattr(gb.utg, f)), err_msg=f
        )


@pytest.mark.skipif(native._load() is None, reason="native lib unavailable")
def test_native_all_palindromes(monkeypatch):
    """nc == 0 corner: every canonical pair is its own complement."""
    rng = np.random.default_rng(7)
    n = 2000
    scm = _Mock()
    scm.n = n
    scm.cov = rng.integers(1, 60, n).astype(np.uint32)
    scm.del_ = np.zeros(n, bool)
    v0 = np.unique(rng.integers(0, 2 * n, 300, dtype=np.uint64))
    cv0 = np.minimum(v0, v0 ^ np.uint64(1))
    pk = np.unique((cv0 << np.uint64(32)) | (cv0 ^ np.uint64(1)))
    counts = rng.integers(1, 30, len(pk)).astype(np.int64)
    rd = _Mock()
    rd.version = 0
    rd._dev_pairs = (0, pk, counts)
    ga = _build(rd, scm, monkeypatch, True)
    gb = _build(rd, scm, monkeypatch, False)
    for f in ("av", "aw", "acov", "acomp"):
        np.testing.assert_array_equal(
            np.asarray(getattr(ga.utg, f)), np.asarray(getattr(gb.utg, f)), err_msg=f
        )


def test_sharded_pair_reduce_bit_identity():
    """Range-sharded sort-reduce == global sort+unique for any shard
    count, including duplicate-heavy and splitter-collision streams."""
    from oatk_tpu.dist.stages import sharded_pair_reduce

    rng = np.random.default_rng(17)
    for n, lo_card in ((0, 1), (1, 1), (1000, 50), (200_000, 1000)):
        packed = (
            rng.integers(0, lo_card, n, dtype=np.uint64) << np.uint64(32)
        ) | rng.integers(0, lo_card, n, dtype=np.uint64)
        base = np.sort(packed.copy())
        if n:
            new = np.concatenate([[True], base[1:] != base[:-1]])
            starts = np.flatnonzero(new)
            want_pk = base[starts]
            want_c = np.diff(np.concatenate([starts, [n]]))
        else:
            want_pk = np.zeros(0, np.uint64)
            want_c = np.zeros(0, np.int64)
        for k in (2, 3, 8):
            got = sharded_pair_reduce(packed, n_shards=k)
            assert got is not None
            np.testing.assert_array_equal(got[0], want_pk, err_msg=f"n={n} k={k}")
            np.testing.assert_array_equal(got[1], want_c, err_msg=f"n={n} k={k}")
    assert sharded_pair_reduce(np.zeros(5, np.uint64), n_shards=1) is None
