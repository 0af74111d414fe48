"""Multi-device sharded extract+count on the virtual 8-device CPU mesh."""
import numpy as np

import jax
import jax.numpy as jnp

from conftest import random_read
from oatk_tpu.dist.sharding import make_mesh, sharded_extract_count_step
from oatk_tpu.io.fastx import SeqRecord
from oatk_tpu.asm.reads import extract_all_syncmers


def test_sharded_extract_count(rng):
    assert len(jax.devices()) == 8
    mesh = make_mesh(8)
    w, s = 51, 11
    B, L = 16, 1024
    seqs = [random_read(rng, L - 200)[: L - 8] for _ in range(B)]
    seq = np.zeros((B, L), np.uint8)
    lens = np.zeros(B, np.int32)
    for i, sq in enumerate(seqs):
        b = np.frombuffer(sq.encode(), np.uint8)[:L]
        seq[i, : len(b)] = b
        lens[i] = len(b)

    n_distinct, hist, n_sel, n_dropped = sharded_extract_count_step(
        jnp.asarray(seq), jnp.asarray(lens), w, s, 2048, mesh, 1024
    )
    assert int(np.asarray(n_dropped).sum()) == 0

    # single-process oracle: total syncmers + distinct hash count
    recs = [SeqRecord(i, f"r{i}", np.frombuffer(sq.encode(), np.uint8)) for i, sq in enumerate(seqs)]
    db = extract_all_syncmers(recs, w, s, use_device=False)
    all_h = np.concatenate([r.k_mer for r in db.reads if r.n])
    assert int(np.asarray(n_sel).sum()) == len(all_h)
    assert int(np.asarray(n_distinct).sum()) == len(np.unique(all_h))
    # histogram sanity: every shard saw the same psummed histogram
    h = np.asarray(hist)
    assert (h == h[0]).all()
    _, counts = np.unique(all_h, return_counts=True)
    ref_hist = np.bincount(np.clip(counts, 0, 63), minlength=64)
    np.testing.assert_array_equal(h[0], ref_hist)


def test_stage_sharding_bit_identical(tmp_path, monkeypatch):
    """Alignment (P1) and EC (P3) partitioned into 8 contiguous read
    blocks and merged in rank order must be byte-identical to the
    unsharded run (per-read independence; the cross-process path uses
    the same partition/merge, dist/stages.py)."""
    import numpy as np

    from genome_sim import random_genome, sample_reads, write_reads
    from oatk_tpu.asm.pipeline import syncasm

    rng = np.random.default_rng(31)
    g = random_genome(rng, 18000)
    reads = sample_reads(rng, g, coverage=10, read_len=2200, err_rate=0.004)
    fa = tmp_path / "r.fa"
    write_reads(str(fa), reads)

    monkeypatch.delenv("OATK_TPU_STAGE_SHARDS", raising=False)
    syncasm([str(fa)], k=151, s=13, min_k_cov=3, do_ec=True, do_unzip=3,
            out=str(tmp_path / "plain"))
    monkeypatch.setenv("OATK_TPU_STAGE_SHARDS", "8")
    syncasm([str(fa)], k=151, s=13, min_k_cov=3, do_ec=True, do_unzip=3,
            out=str(tmp_path / "shard"))
    a = (tmp_path / "plain.utg.final.gfa").read_bytes()
    b = (tmp_path / "shard.utg.final.gfa").read_bytes()
    assert a == b and a
