"""Vectorized syncmer kernel vs sequential oracle (which is itself
bit-checked against the reference binary's DEBUG_SYNCMER_SEQ dump)."""
import numpy as np
import pytest

from conftest import random_read
from oatk_tpu.asm.reads import extract_all_syncmers
from oatk_tpu.io.fastx import SeqRecord
from oatk_tpu.kernels.oracle import hoco_compress_np, syncmers_of_read_oracle


def _compare(records, w, s):
    dev = extract_all_syncmers(records, w, s, use_device=True)
    for rec in records:
        ora = syncmers_of_read_oracle(rec.seq, w, s, rec.sid, rec.name)
        got = dev.reads[rec.sid]
        assert got.hoco_l == ora.hoco_l, rec.sid
        np.testing.assert_array_equal(got.hoco_code, ora.hoco_code)
        np.testing.assert_array_equal(got.ho_rl, ora.ho_rl)
        np.testing.assert_array_equal(got.is_n, ora.is_n)
        np.testing.assert_array_equal(got.m_pos, ora.m_pos, err_msg=f"read {rec.sid} m_pos")
        np.testing.assert_array_equal(got.s_mer, ora.s_mer, err_msg=f"read {rec.sid} s_mer")
        np.testing.assert_array_equal(got.k_mer, ora.k_mer, err_msg=f"read {rec.sid} k_mer")


def _mk(seqs):
    return [SeqRecord(i, f"r{i}", np.frombuffer(s.encode(), np.uint8)) for i, s in enumerate(seqs)]


@pytest.mark.parametrize("w,s", [(11, 5), (31, 7), (91, 13)])
def test_kernel_matches_oracle_random(rng, w, s):
    seqs = [random_read(rng, rng.integers(w + 5, 1200), n_prob=0.01) for _ in range(12)]
    _compare(_mk(seqs), w, s)


def test_kernel_matches_oracle_edge_cases(rng):
    w, s = 15, 5
    seqs = [
        "A" * 100,  # all one homopolymer
        "ACGT" * 50,
        "N" * 30 + random_read(rng, 100),
        random_read(rng, 100) + "N" * 30,
        random_read(rng, 40, n_prob=0.2),
        "ACGTN" * 40,
        random_read(rng, 16),  # barely longer than w
        random_read(rng, 14),  # shorter than w
    ]
    _compare(_mk(seqs), w, s)


def test_kernel_default_params(rng):
    # defaults: k=1001, s=31 need long reads
    w, s = 1001, 31
    seqs = [random_read(rng, rng.integers(3000, 9000), n_prob=0.002) for _ in range(4)]
    _compare(_mk(seqs), w, s)


def test_hoco_roundtrip(rng):
    seq = np.frombuffer(random_read(rng, 500, hp_prob=0.3, n_prob=0.01).encode(), np.uint8)
    code, rl, is_n = hoco_compress_np(seq)
    # expanding hoco by run lengths (stored as run-1) reproduces the
    # read (with N->A substitution)
    out = np.repeat(np.where(is_n, 4, code), rl.astype(np.int64) + 1)
    from oatk_tpu.kernels.oracle import SEQ_NT4

    orig = SEQ_NT4[seq]
    np.testing.assert_array_equal(np.where(out == 4, 4, out), orig)


@pytest.mark.parametrize("w", [40, 41, 42, 43, 971])
def test_rc_packed_bytes_all_phases(rng, w):
    """_rc_packed_bytes must equal pack(reverse-complement(window)) for
    every w mod 4 phase (the funnel shift + tail masks differ per
    phase; w=971 is the production k=1001/s=31 width)."""
    import jax.numpy as jnp

    from oatk_tpu.kernels.syncmer import (
        _pack_window_bytes,
        _rc_packed_bytes,
    )

    win = rng.integers(0, 4, (16, w)).astype(np.uint8)
    bytes_f = np.asarray(_pack_window_bytes(jnp.asarray(win), w))
    got = np.asarray(_rc_packed_bytes(jnp.asarray(bytes_f), w))
    want = np.asarray(_pack_window_bytes(jnp.asarray((3 - win)[:, ::-1]), w))
    np.testing.assert_array_equal(got, want)
