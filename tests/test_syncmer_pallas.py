"""Pallas selection kernel vs jnp reference path vs oracle (interpret
mode on CPU)."""
import numpy as np
import pytest

from conftest import random_read
from oatk_tpu.io.fastx import SeqRecord


def _mk(seqs):
    return [SeqRecord(i, f"r{i}", np.frombuffer(s.encode(), np.uint8)) for i, s in enumerate(seqs)]


@pytest.mark.parametrize("w,s", [(15, 5), (51, 11), (91, 13)])
def test_pallas_path_matches_oracle(rng, w, s):
    import jax.numpy as jnp

    from oatk_tpu.kernels.oracle import syncmers_of_read_oracle
    from oatk_tpu.kernels.syncmer import extract_syncmers_batch_pallas

    seqs = [random_read(rng, rng.integers(w + 5, 700), n_prob=0.01) for _ in range(6)]
    recs = _mk(seqs)
    B = len(recs)
    L = 1024
    seq = np.zeros((B, L), np.uint8)
    lens = np.zeros(B, np.int32)
    for i, r in enumerate(recs):
        b = r.seq[:L]
        seq[i, : len(b)] = b
        lens[i] = len(b)
    out = extract_syncmers_batch_pallas(
        jnp.asarray(seq), jnp.asarray(lens), w, s, 2048, interpret=True
    )
    n_sel = int(out["n_sel"])
    sel_b = np.asarray(out["sel_b"])[:n_sel]
    sel_p = np.asarray(out["sel_p"])[:n_sel]
    sel_z = np.asarray(out["sel_z"])[:n_sel]
    sel_smer = np.asarray(out["sel_smer"])[:n_sel].astype(np.uint64)
    sel_kh = np.asarray(out["sel_khash"])[:n_sel]
    cuts = np.searchsorted(sel_b, np.arange(B + 1))
    for i, rec in enumerate(recs):
        ora = syncmers_of_read_oracle(rec.seq[:L], w, s, i)
        lo, hi = cuts[i], cuts[i + 1]
        np.testing.assert_array_equal(
            sel_p[lo:hi] * 2 + sel_z[lo:hi], ora.m_pos, err_msg=f"read {i} m_pos"
        )
        np.testing.assert_array_equal(sel_smer[lo:hi], ora.s_mer, err_msg=f"read {i} s_mer")
        np.testing.assert_array_equal(sel_kh[lo:hi], ora.k_mer, err_msg=f"read {i} k_mer")


@pytest.mark.parametrize("w,s", [(51, 11)])
def test_extract_all_pallas_impl(rng, w, s):
    """Full wrapper with impl='pallas' (interpret on CPU) vs oracle."""
    from oatk_tpu.asm.reads import extract_all_syncmers
    from oatk_tpu.kernels.oracle import syncmers_of_read_oracle

    seqs = [random_read(rng, rng.integers(w + 5, 600), n_prob=0.01) for _ in range(5)]
    recs = _mk(seqs)
    db = extract_all_syncmers(recs, w, s, impl="pallas")
    for rec in recs:
        ora = syncmers_of_read_oracle(rec.seq, w, s, rec.sid)
        got = db.reads[rec.sid]
        np.testing.assert_array_equal(got.m_pos, ora.m_pos)
        np.testing.assert_array_equal(got.s_mer, ora.s_mer)
        np.testing.assert_array_equal(got.k_mer, ora.k_mer)


def test_fused_blob_equals_packed_inputs(rng):
    """The single-transfer blob variant (packed|hl|n_pos in one uint8
    upload) must produce identical results to the three-array path."""
    import jax.numpy as jnp

    from oatk_tpu.kernels.oracle import pack_hoco
    from oatk_tpu.kernels.syncmer import (
        extract_hoco_fused_pallas,
        extract_hoco_packed_pallas,
    )

    B, Lp, w, s = 5, 1024, 51, 11
    codes = rng.integers(0, 4, (B, Lp)).astype(np.uint8)
    hl = rng.integers(200, Lp, B).astype(np.int32)
    packed = np.zeros((B, Lp // 4), np.uint8)
    for b in range(B):
        packed[b] = pack_hoco(codes[b])
    n_cap = 64
    n_arr = np.full(n_cap, B * Lp, np.int32)
    n_arr[:4] = [5, 777, 1030, 2050]
    max_out = 2048
    a = extract_hoco_packed_pallas(
        jnp.asarray(packed), jnp.asarray(hl), jnp.asarray(n_arr),
        w, s, max_out, interpret=True,
    )
    blob = np.concatenate([packed.reshape(-1), hl.view(np.uint8), n_arr.view(np.uint8)])
    b_ = extract_hoco_fused_pallas(
        jnp.asarray(blob), B, Lp, n_cap, w, s, max_out, interpret=True,
    )
    assert np.array_equal(np.asarray(a["packed"]), np.asarray(b_["packed"]))


def test_compact_sel_overflow_escalation():
    """Pathologically dense selection (>maxper per 512-subrow) must
    inflate the reported n_sel past max_out so the loader's retry
    re-dispatches with a larger max_out, which widens maxper until the
    result is exact (kernels/syncmer._compact_sel)."""
    import numpy as np
    import jax.numpy as jnp

    from oatk_tpu.kernels.syncmer import _compact_sel

    rng = np.random.default_rng(11)
    B, L = 8, 2048
    sel = np.zeros((B, L), np.int32)
    # one ultra-dense subrow (200 of 512) + normal sparse elsewhere
    dense = rng.choice(512, 200, replace=False)
    sel[2, 512 + dense] = 1 + (dense % 2)
    sparse = rng.choice(L, 20, replace=False)
    sel[5, sparse] = 1
    expect = np.flatnonzero(sel.reshape(-1))
    exp_oc = sel.reshape(-1)[expect]

    max_out = 256
    for _ in range(8):  # mirrors _grow_if_overflow's loop
        fi, oc, valid, n_sel, n_rep = (
            np.asarray(x) for x in _compact_sel(jnp.asarray(sel), max_out)
        )
        if int(n_rep) <= max_out:
            break
        max_out = -(-(int(n_rep) + 1024) // 1024) * 1024
    assert int(n_sel) == len(expect)
    assert int(n_rep) == int(n_sel), "converged report must be exact"
    got = fi[valid]
    assert np.array_equal(got, expect)
    assert np.array_equal(oc[valid], exp_oc)
