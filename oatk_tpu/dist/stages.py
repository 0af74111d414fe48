"""Mesh/process sharding of the downstream read-parallel stages.

The reference parallelizes read->graph alignment and graph-path error
correction with host threads (P1 /root/reference/alignment.c:636-676,
P3 /root/reference/syncerr.c:882); both are per-read independent, so the
TPU-native framework scales them ACROSS hosts as well: reads partition
into contiguous sid blocks, every process runs the (itself
thread-parallel) native stage on its block against the replicated
graph, and the flat results allgather in rank order -- which IS read
order, so the merged result is bit-identical to an unsharded run (the
slot-merge discipline of native/align.c / native/ec.c extended across
process boundaries).

Single-process mesh runs can force ``n_shards`` to validate the
partition/merge path without jax.distributed (used by the multichip
dryrun and the parity tests).
"""
from __future__ import annotations

import numpy as np


def shard_ranges(n: int, k: int) -> list[tuple[int, int]]:
    """k contiguous [lo, hi) ranges covering [0, n) (balanced +-1)."""
    return [((n * r) // k, (n * (r + 1)) // k) for r in range(k)]


def sharded_pair_reduce(packed: np.ndarray, n_shards: int = 0):
    """Range-partitioned sort-reduce of packed canonical pair keys ->
    (pk_unique, counts), bit-identical to one global sort + unique.

    The adjacent-pair stream feeding make_syncmer_graph is replicated
    on every process (reference analogue: the arc-counting scan in
    syncasm.c:116-368), but the SORT need not be: each rank owns a
    contiguous key range (deterministic splitters from a stride sample
    of the replicated stream, so every rank derives identical bounds),
    sorts + uniques only its range, and the variable-length allgather
    concatenates in rank order -- which is ascending key-range order,
    so the merged arrays ARE the global sorted unique keys and counts.

    Returns None when there is nothing to shard (single process and
    n_shards <= 1); in-process callers force n_shards to validate the
    partition/merge without jax.distributed."""
    import jax

    from .. import native

    cross = jax.process_count() > 1
    if n_shards <= 0:
        n_shards = jax.process_count()
    if n_shards <= 1:
        return None
    if len(packed) == 0:
        return np.zeros(0, np.uint64), np.zeros(0, np.int64)
    stride = max(1, len(packed) // 8192)
    sample = np.sort(packed[::stride])
    qs = np.linspace(0, len(sample) - 1, n_shards + 1).astype(np.int64)[1:-1]
    bounds = sample[qs]  # n_shards-1 splitters; shard r owns
    # [bounds[r-1], bounds[r]) with open ends, so duplicate keys equal
    # to a splitter all land in one shard
    my = [jax.process_index()] if cross else range(n_shards)
    pks, cnts = [], []
    for r in my:
        if n_shards == 1:
            mine = packed
        elif r == 0:
            mine = packed[packed < bounds[0]]
        elif r == n_shards - 1:
            mine = packed[packed >= bounds[r - 1]]
        else:
            mine = packed[(packed >= bounds[r - 1]) & (packed < bounds[r])]
        mine = np.ascontiguousarray(mine)
        if not native.sort_u64(mine):
            mine.sort(kind="stable")
        if len(mine):
            new = np.concatenate([[True], mine[1:] != mine[:-1]])
            starts = np.flatnonzero(new)
            c = np.diff(np.concatenate([starts, [len(mine)]]))
            pks.append(mine[starts])
            cnts.append(c.astype(np.int64))
        else:
            pks.append(np.zeros(0, np.uint64))
            cnts.append(np.zeros(0, np.int64))
    if cross:
        pk_parts = _allgather_var(pks[0])
        cnt_parts = _allgather_var(cnts[0])
        return np.concatenate(pk_parts), np.concatenate(cnt_parts)
    return np.concatenate(pks), np.concatenate(cnts)


def all_ranks_ok(local_ok: bool) -> bool:
    """Cross-process agreement: True iff EVERY process reports ok.

    A collective -- every process must call it at the same point.  Used
    before the sharded-stage allgathers so a rank-local failure (native
    library unavailable, allocation failure in the batched corrector)
    sends ALL ranks to the replicated fallback instead of one rank
    silently skipping the collectives and deadlocking the rest."""
    from jax.experimental import multihost_utils

    flags = np.asarray(
        multihost_utils.process_allgather(
            np.asarray([1 if local_ok else 0], np.int32), tiled=True
        )
    ).reshape(-1)
    return bool(flags.min() == 1)


def _allgather_var(arr: np.ndarray):
    """Allgather a per-process variable-length array: ranks exchange
    lengths first, pad to the max, gather, trim.  Returns the list of
    per-rank arrays in rank order.

    The padded length is quantized to the next power of two (>=1024) so
    the collective's jitted shape repeats across calls -- alignment runs
    several times per pipeline with fresh sizes each round, and an
    un-quantized gather would recompile every time."""
    import jax
    from jax.experimental import multihost_utils

    arr = np.ascontiguousarray(arr)
    n_local = np.asarray([arr.shape[0]], np.int64)
    sizes = np.asarray(
        multihost_utils.process_allgather(n_local, tiled=True)
    ).reshape(-1)
    m = int(sizes.max()) if len(sizes) else 0
    m = max(1024, 1 << (m - 1).bit_length()) if m else 1024
    pad_shape = (m,) + arr.shape[1:]
    padded = np.zeros(pad_shape, arr.dtype)
    padded[: arr.shape[0]] = arr
    gathered = np.asarray(
        multihost_utils.process_allgather(padded[None], tiled=True)
    )
    assert gathered.shape[0] == jax.process_count()
    return [gathered[r, : int(sizes[r])] for r in range(gathered.shape[0])]


def ec_gather(parts: list) -> list:
    """Allgather this process's EC output part(s) from every process.

    Each part is (stats[11] i64, out_kmer u64, out_mpos u32,
    out_cut i64, out_upd u8) over the process's read range; the return
    is the full part list in rank (= read) order."""
    assert len(parts) == 1, "one contiguous range per process"
    st, out_kmer, out_mpos, out_cut, out_upd = parts[0]
    sts = _allgather_var(np.asarray(st, np.int64))
    kms = _allgather_var(np.asarray(out_kmer, np.uint64))
    mps = _allgather_var(np.asarray(out_mpos, np.uint32))
    cts = _allgather_var(np.asarray(out_cut, np.int64))
    ups = _allgather_var(np.asarray(out_upd))
    return [
        (sts[r], kms[r], mps[r], cts[r], ups[r]) for r in range(len(sts))
    ]


def merge_aln_flats(parts: list[dict | None]) -> dict:
    """Concatenate per-shard alignment flats (rank order = sid order):
    chain cuts offset by cumulative fragment counts, read spans by
    cumulative chain counts."""
    sids_l, frag_l, ms_l = [], [], []
    cut_l = [np.zeros(1, np.int64)]
    off_l = [np.zeros(1, np.int64)]
    frag_base = chain_base = 0
    for p in parts:
        if p is None or len(p["sids"]) == 0:
            continue
        sids_l.append(p["sids"])
        frag_l.append(p["frag6"])
        ms_l.append(p["max_score"])
        cut_l.append(np.asarray(p["aln_cut"], np.int64)[1:] + frag_base)
        off_l.append(np.asarray(p["read_aln_off"], np.int64)[1:] + chain_base)
        frag_base += len(p["frag6"])
        chain_base += len(p["aln_cut"]) - 1
    if not sids_l:
        return dict(
            sids=np.zeros(0, np.int64),
            frag6=np.zeros((0, 6), np.int64),
            aln_cut=np.zeros(1, np.int64),
            read_aln_off=np.zeros(1, np.int64),
            max_score=np.zeros(0, np.int64),
        )
    return dict(
        sids=np.concatenate(sids_l),
        frag6=np.concatenate(frag_l),
        aln_cut=np.concatenate(cut_l),
        read_aln_off=np.concatenate(off_l),
        max_score=np.concatenate(ms_l),
    )


def _log_aln(read_db, flat) -> None:
    from ..asm.consensus import read_flats
    from ..utils import log_info

    mc = read_flats(read_db).mc
    n_mappable = int((mc > 0).sum())
    n_a_read = np.diff(flat["read_aln_off"])
    n_mapped = int((n_a_read > 0).sum())
    n_unique = int((n_a_read == 1).sum())
    log_info(
        f"{n_mappable} mappable reads, {n_mapped} mapped ({n_unique} unique mapping)",
        func="scg_read_alignment",
    )


def sharded_read_alignment(
    read_db, scg, for_unzip: bool = False, old_ra_db=None, n_shards: int = 0
):
    """Read->graph alignment partitioned over processes (jax.distributed)
    or, with ``n_shards``, over in-process blocks (partition/merge
    validation on a virtual mesh).  Bit-identical to the unsharded call."""
    import jax

    from .. import native
    from ..asm.align import RaDB, scg_read_alignment

    native_ok = native.available()
    if jax.process_count() > 1:
        # agreement BEFORE any data collective: if one rank can't run
        # the native flat path, every rank must take the replicated
        # fallback or the others deadlock in the allgathers below
        native_ok = all_ranks_ok(native_ok)
    if not native_ok:
        # object-path fallback has no flat arrays to merge; compute the
        # full alignment locally (replicated across processes)
        from collections import Counter

        from ..asm.consensus import read_flats
        from ..utils import log_info

        ra_db = scg_read_alignment(read_db, scg, for_unzip, old_ra_db, shard=(0, 1))
        cnt = Counter(ra.sid for ra in ra_db)
        mc = read_flats(read_db).mc
        log_info(
            f"{int((mc > 0).sum())} mappable reads, {len(cnt)} mapped "
            f"({sum(1 for v in cnt.values() if v == 1)} unique mapping)",
            func="scg_read_alignment",
        )
        return ra_db

    if n_shards <= 0:
        n_shards = jax.process_count()
    cross_process = jax.process_count() > 1
    if cross_process:
        n_shards = jax.process_count()
        my = [jax.process_index()]
    else:
        my = range(n_shards)

    parts: list[dict | None] = []
    for r in my:
        # in-process validation mode runs the shards sequentially, each
        # call re-deriving the shared setup (_arc_table, gating) --
        # deliberately unoptimized: it exists to validate partition/
        # merge parity, while production sharding is one shard/process
        sub = scg_read_alignment(
            read_db, scg, for_unzip, old_ra_db, shard=(r, n_shards)
        )
        parts.append(getattr(sub, "flat", None))

    if cross_process:
        import os as _os
        import time as _time

        _g0 = _time.perf_counter()
        p = parts[0]
        if p is None:
            p = merge_aln_flats([])
        sids_all = _allgather_var(np.asarray(p["sids"], np.int64))
        frag_all = _allgather_var(np.asarray(p["frag6"], np.int64))
        cut_all = _allgather_var(np.asarray(p["aln_cut"], np.int64))
        off_all = _allgather_var(np.asarray(p["read_aln_off"], np.int64))
        ms_all = _allgather_var(np.asarray(p["max_score"], np.int64))
        parts = [
            dict(
                sids=sids_all[r], frag6=frag_all[r], aln_cut=cut_all[r],
                read_aln_off=off_all[r], max_score=ms_all[r],
            )
            for r in range(n_shards)
        ]
        if _os.environ.get("OATK_TPU_TIMEIT"):
            import sys as _sys

            print(
                f"[T::dist] aln_gather={(_time.perf_counter() - _g0) * 1000:.1f}ms",
                file=_sys.stderr, flush=True,
            )

    ra_db = RaDB()
    ra_db.flat = merge_aln_flats(parts)
    ra_db._lazy = True
    _log_aln(read_db, ra_db.flat)
    return ra_db
