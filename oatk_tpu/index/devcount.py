"""Device-resident syncmer counting for the single-chip production path.

The reference's HOT LOOP 2 is a global qsort of 128-bit
(kmerhash<<64 | sid<<32 | idx<<1 | rev) keys plus per-cluster collision
resolution (/root/reference/syncmer.c:1397-1451).  The tuned loader
(asm/reads.py) computes the Murmur hashes on device during extraction;
instead of fetching them to the host and sorting there, this module
keeps the (hash, low, smer) key triples ON DEVICE:

- every extraction chunk appends its keys into donated carry buffers
  (one small jit per chunk, overlapped with the next chunk's upload);
- finalize runs ONE device sort by (valid, hash, low) -- the exact
  total order of the reference qsort -- assigns dense syncmer ids as a
  prefix sum over cluster starts, flags hash collisions by comparing
  s-mer payloads against the cluster head, compacts the per-cluster
  head (hash, smer) pairs, and re-sorts ids back to per-read flat
  order (flat order IS ascending ``low``);
- the host fetches a u32 id per occurrence (flat order) plus the tiny
  per-distinct head arrays -- REPLACING the 8-byte khash lane of the
  per-chunk packed fetch, so the wire carries less than before and the
  host never sorts.

Hash collisions between different k-mer sequences (never observed in
practice; the reference checks only under DEBUG_CHECK_HASH_COLLISION,
syncmer.c:1336-1340) fall back to the host exact-sequence resolution
over the fetched sorted keys, byte-identical to the host path.

All jit shapes are drawn from a small vocabulary (2048-grid chunk
lanes x power-of-four buffer capacities), so a new dataset reuses
cached XLA programs.
"""
from __future__ import annotations

from functools import partial

import numpy as np

U64_MAX = np.uint64(0xFFFFFFFFFFFFFFFF)


def _cap_quantum(x: int) -> int:
    """Buffer capacities snap to powers of FOUR (min 2^18): every cap
    value compiles its own write/finalize programs (~100-300 s through
    the relay tunnel), so the vocabulary is kept to ~4 values across all
    dataset scales at the price of at most 4x sort oversize."""
    c = 1 << 18
    while c < x:
        c <<= 2
    return c


def _jax():
    import jax

    return jax


def _make_keys_jit():
    """Per-chunk key decode, padded to a coarse lane grid.

    Cap-independent on purpose: its compile vocabulary is the loader's
    fixed chunk-shape set, reused across dataset scales; only the tiny
    write step below depends on the buffer capacity."""
    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnames=("Lp", "out_cap"))
    def keys_jit(packed, sids, Lp, out_cap):
        from jax import lax

        max_out = packed.shape[1] - 1
        B = sids.shape[0]
        n_sel = packed[0, max_out].astype(jnp.int32)
        lane = jnp.arange(max_out, dtype=jnp.int32)
        valid = lane < jnp.minimum(n_sel, max_out)

        flat = packed[0, :max_out]
        z = (flat & 1).astype(jnp.uint64)
        fi = flat >> 1
        b = (fi // Lp).astype(jnp.int32)
        # rank within read: first lane with the same row (sel rows are
        # ascending; invalid lanes map to sentinel B so they group last)
        bkey = jnp.where(valid, b, B)
        first = jnp.searchsorted(bkey, bkey).astype(jnp.int32)
        idx = (lane - first).astype(jnp.uint64)
        sid = sids[jnp.clip(b, 0, B - 1)].astype(jnp.uint64)
        low = (sid << jnp.uint64(32)) | (idx << jnp.uint64(1)) | z
        h = lax.bitcast_convert_type(packed[2, :max_out], jnp.uint64)
        sm = lax.bitcast_convert_type(packed[1, :max_out], jnp.uint64)
        vinv = jnp.where(valid, 0, 1).astype(jnp.int32)

        pad = out_cap - max_out
        return (
            packed[:2],
            jnp.pad(h, (0, pad)),
            jnp.pad(low, (0, pad)),
            jnp.pad(sm, (0, pad)),
            jnp.pad(vinv, (0, pad), constant_values=1),
        )

    return keys_jit


def _make_write_jit():
    import jax
    import jax.numpy as jnp

    @partial(jax.jit, donate_argnums=(0, 1, 2, 3))
    def write_jit(bh, bl, bs, bv, h, l, s, v, wr):
        from jax import lax

        bh = lax.dynamic_update_slice(bh, h, (wr,))
        bl = lax.dynamic_update_slice(bl, l, (wr,))
        bs = lax.dynamic_update_slice(bs, s, (wr,))
        bv = lax.dynamic_update_slice(bv, v, (wr,))
        return bh, bl, bs, bv

    return write_jit


def _make_invalidate_jit():
    import jax
    import jax.numpy as jnp

    @partial(jax.jit, donate_argnums=(0,))
    def invalidate_jit(bv, off, n):
        i = jnp.arange(bv.shape[0], dtype=jnp.int64)
        return jnp.where((i >= off) & (i < off + n), jnp.int32(1), bv)

    return invalidate_jit


def _make_grow_jit():
    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnames=("new_cap",), donate_argnums=(0, 1, 2, 3))
    def grow_jit(bh, bl, bs, bv, new_cap):
        pad = new_cap - bh.shape[0]
        return (
            jnp.pad(bh, (0, pad)),
            jnp.pad(bl, (0, pad)),
            jnp.pad(bs, (0, pad)),
            jnp.pad(bv, (0, pad), constant_values=1),
        )

    return grow_jit


def _make_finalize_jit():
    import jax
    import jax.numpy as jnp

    # no donation: the carry buffers stay alive so a (rare) overflow
    # regrow discovered AFTER the early finalize dispatch can invalidate
    # + re-append and re-dispatch; XLA wasn't aliasing these anyway
    # (5 u64 outputs vs 3 u64 inputs)
    @jax.jit
    def finalize_jit(bh, bl, bs, bv):
        from jax import lax

        cap = bh.shape[0]
        i = jnp.arange(cap, dtype=jnp.int32)
        # the reference's total 128-bit key order: (hash, low) over the
        # valid lanes; invalid lanes (vinv=1) sort to the tail.  This is
        # the ONLY sort: ids are a prefix sum over cluster starts, the
        # head tables compact with a scatter by id, and the sorted low
        # keys double as the position lists (mp_flat) on the host.
        vv, h1, l1, s1 = lax.sort((bv, bh, bl, bs), num_keys=3)
        valid = vv == 0
        n_tot = jnp.sum(valid, dtype=jnp.int32)

        prev_h = jnp.concatenate([h1[:1] ^ jnp.uint64(1), h1[:-1]])
        f = valid & ((i == 0) | (h1 != prev_h))
        gid = jnp.cumsum(f.astype(jnp.int32)) - 1
        n_scm = jnp.sum(f, dtype=jnp.int32)

        head = lax.cummax(jnp.where(f, i, -1))
        s_head = s1[jnp.maximum(head, 0)]
        n_susp = jnp.sum(valid & (s1 != s_head), dtype=jnp.int32)

        # per-cluster head (hash, smer) compacted to [0, n_scm) in gid
        # order: a stable single-key sort (XLA scatter on TPU serializes;
        # the sort is the faster compaction at these sizes)
        nf = jnp.where(f, 0, 1).astype(jnp.int32)
        _, hh, hs = lax.sort((nf, h1, s1), num_keys=1, is_stable=True)

        # ids back to per-read flat order (= ascending low): fetching the
        # resorted i32 ids costs 4 B/occurrence on the wire vs 8 B for
        # the low keys -- the extra device sort is cheaper than the extra
        # fetch bytes on the latency-bound tunnel (measured both ways)
        vf, lf, gid_flat = lax.sort((vv, l1, gid), num_keys=2)

        # ---- arc-pair counting (make_syncmer_graph HOT input) ----
        # The graph builder's arc counts are a sort-reduce over all
        # consecutive-syncmer pairs per read (/root/reference/
        # syncasm.c:231-257); in flat (sid, idx) order those pairs are
        # exactly the adjacent lane pairs within one sid.  Counting them
        # here reuses the buffers already on device and overlaps the
        # host read assembly, removing the host-side pair materialize +
        # radix sort (~0.8 s/Gbp) from ec_graph0 / make_graph.
        one = jnp.uint64(1)
        gidu = jnp.maximum(gid_flat, 0).astype(jnp.uint64)
        v = (gidu << one) | (lf & one)
        sid = lf >> jnp.uint64(32)
        pok = (vf[:-1] == 0) & (vf[1:] == 0) & (sid[:-1] == sid[1:])
        v0, v1 = v[:-1], v[1:]
        flip = v0 > v1
        cv0 = jnp.where(flip, v1 ^ one, v0)
        cv1 = jnp.where(flip, v0 ^ one, v1)
        pkey = jnp.where(pok, (cv0 << jnp.uint64(32)) | cv1, U64_MAX)
        pkey = jnp.pad(pkey, (0, 1), constant_values=U64_MAX)
        pks = lax.sort(pkey)
        pvalid = pks != U64_MAX
        n_pv = jnp.sum(pvalid, dtype=jnp.int32)
        pf = pvalid & ((i == 0) | (pks != jnp.concatenate([pks[:1], pks[:-1]])))
        n_pu = jnp.sum(pf, dtype=jnp.int32)
        # compact unique pair keys + their start positions; counts are
        # consecutive-start differences (last unique runs to n_pv)
        npf = jnp.where(pf, 0, 1).astype(jnp.int32)
        _, pk_u, pos_u = lax.sort((npf, pks, i), num_keys=1, is_stable=True)
        nxt = jnp.concatenate([pos_u[1:], pos_u[:1]])
        pcnt = jnp.where(i == n_pu - 1, n_pv - pos_u, nxt - pos_u)

        scalars = jnp.stack([n_tot, n_scm, n_susp, n_pu])
        return gid_flat, hh, hs, h1, l1, s1, scalars, pk_u, pcnt

    return finalize_jit


_append = None
_invalidate = None
_grow = None
_finalize = None


def _jits():
    global _append, _invalidate, _grow, _finalize
    if _append is None:
        _append = (_make_keys_jit(), _make_write_jit())
        _invalidate = _make_invalidate_jit()
        _grow = _make_grow_jit()
        _finalize = _make_finalize_jit()
    return _append, _invalidate, _grow, _finalize


class DevCountState:
    """Device carry buffers accumulating (hash, low, smer) key lanes
    across extraction chunks; finalize builds the SyncmerDB."""

    def __init__(self, cap_hint: int = 0):
        self._bufs = None  # (bh, bl, bs, bv) device arrays
        self._final = None  # pre-dispatched finalize outputs
        self.cap = 0
        self.cap_hint = cap_hint  # expected total lanes (avoids growth
        # steps, each of which compiles a fresh (max_out, cap) append)
        self.n_fill = 0  # host-tracked append offset
        # evidence counters (PARITY/BASELINE at-scale validation):
        # buffer growth steps, chunk appends, overflow invalidations
        self.n_grow = 0
        self.n_append = 0
        self.n_invalidate = 0

    def _ensure(self, need: int):
        import jax.numpy as jnp

        append, invalidate, grow, finalize = _jits()
        if self._bufs is None:
            self.cap = _cap_quantum(max(need, self.cap_hint))
            self._bufs = (
                jnp.full(self.cap, U64_MAX, jnp.uint64),
                jnp.full(self.cap, U64_MAX, jnp.uint64),
                jnp.full(self.cap, U64_MAX, jnp.uint64),
                jnp.ones(self.cap, jnp.int32),
            )
        while self.n_fill + need > self.cap:
            new_cap = self.cap << 2  # stay on the pow4 quantum grid
            self._bufs = grow(*self._bufs, new_cap=new_cap)
            self.cap = new_cap
            self.n_grow += 1

    def append(self, packed, sids: np.ndarray, Lp: int, max_out: int):
        """Append one chunk's keys; returns (packed2 device array
        [2, max_out+1], chunk offset in the buffers)."""
        import jax.numpy as jnp

        self._final = None  # stale if finalize was dispatched early
        (keys, write), *_ = _jits()
        # chunk lanes snap to a 2048 grid: the key decode stays within
        # the loader's chunk-shape compile vocabulary, the write step
        # compiles per (lane grid, cap) only
        out_cap = -(-max_out // 2048) * 2048
        self._ensure(out_cap)
        off = self.n_fill
        packed2, h, l, s, v = keys(
            packed, jnp.asarray(sids, jnp.int64), Lp=Lp, out_cap=out_cap
        )
        self._bufs = write(*self._bufs, h, l, s, v, np.int32(off))
        self.n_fill = off + out_cap
        self.n_append += 1
        return packed2, off

    def invalidate(self, off: int, n: int):
        """Mark a previously appended chunk's lanes invalid (overflow
        regrow or a discarded parse attempt)."""
        if self._bufs is None:
            return
        self._final = None  # stale if finalize was dispatched early
        _, invalidate, *_ = _jits()
        bh, bl, bs, bv = self._bufs
        bv = invalidate(bv, np.int64(off), np.int64(n))
        self._bufs = (bh, bl, bs, bv)
        self.n_invalidate += 1

    def start_finalize(self):
        """Dispatch the finalize sort (async); the loader calls this as
        soon as the last chunk is appended so the device sort overlaps
        the packed-result fetch drains and the host-side read assembly.
        The carry buffers stay alive: a later append/invalidate (overflow
        regrow) drops the stale result and a re-dispatch picks up the
        corrected buffers."""
        if self._bufs is not None and self._final is None:
            *_, finalize = _jits()
            self._final = finalize(*self._bufs)

    def build(self, read_db):
        """Finalize on device and build the SyncmerDB on host.

        Returns None when no occurrences were collected."""
        import jax

        from .syncmer_db import SyncmerDB, build_db_from_sorted

        if self._bufs is None and self._final is None:
            return None
        self.start_finalize()
        (gid_flat_d, hh_d, hs_d, h1_d, l1_d, s1_d, scalars_d,
         pk_u_d, pcnt_d) = self._final
        self._final = None
        self._bufs = None

        # n_tot is host-known (the per-read views are assembled), so the
        # ids, head tables AND the scalars come back in ONE tree fetch;
        # n_scm <= n_tot bounds the head slices
        mc, sids, mflat, base = _read_occ_flats(read_db)
        n_exp = read_db.total_syncmers()
        if n_exp == 0:
            return None
        gran = max(4096, self.cap // 8)
        m = min(self.cap, -(-n_exp // gran) * gran)
        scalars, gid_flat, hh, hs = jax.device_get(
            (scalars_d, gid_flat_d[:m], hh_d[:m], hs_d[:m])
        )
        n_tot, n_scm, n_susp, n_pu = (int(x) for x in np.asarray(scalars))
        if n_tot != n_exp:
            raise RuntimeError(
                f"device counting holds {n_tot} occurrences, ReadDB has {n_exp}"
            )

        if n_susp:
            # hash collision between distinct sequences: resolve exactly
            # on host over the fetched sorted keys (reference
            # process_kmer_cluster semantics, never hit in practice)
            sh, sl, ss = jax.device_get((h1_d[:m], l1_d[:m], s1_d[:m]))
            return build_db_from_sorted(
                read_db,
                np.asarray(sh[:n_tot]),
                np.asarray(sl[:n_tot]),
                np.asarray(ss[:n_tot]),
                base,
            )

        db = _build_db_from_gid(
            read_db,
            np.asarray(gid_flat[:n_tot]),
            n_scm,
            np.asarray(hh[:n_scm]), np.asarray(hs[:n_scm]),
            mc, sids, mflat, base,
        )
        if n_pu > 0:
            # second (small) fetch sized by the now-known unique-pair
            # count; make_syncmer_graph consumes these sorted unique
            # (v0<<32|v1, count) rows instead of re-materializing and
            # radix-sorting every adjacent pair on host
            mp = min(self.cap, -(-n_pu // 4096) * 4096)
            pk_u, pcnt = jax.device_get((pk_u_d[:mp], pcnt_d[:mp]))
            read_db._dev_pairs = (
                read_db.version,
                np.asarray(pk_u[:n_pu]),
                np.asarray(pcnt[:n_pu]).astype(np.int64),
            )
        return db


def _read_occ_flats(read_db):
    """(mc, sids, mflat, base) from the per-read views without touching
    k_mer (which is None until the ids arrive)."""
    reads = read_db.reads
    n = len(reads)
    mc = np.fromiter((len(r.m_pos) for r in reads), np.int64, count=n)
    sids = np.fromiter((r.sid for r in reads), np.int64, count=n)
    mflat = (
        np.concatenate([r.m_pos for r in reads]).astype(np.uint32, copy=False)
        if n
        else np.zeros(0, np.uint32)
    )
    n_tot = int(mc.sum())
    offs = np.zeros(n + 1, np.int64)
    np.cumsum(mc, out=offs[1:])
    base = np.zeros(n + 1, np.int64)
    base[sids] = offs[:-1]
    base[n] = n_tot
    return mc, sids, mflat, base


def _build_db_from_gid(
    read_db, gid_flat, n_scm, heads_h, heads_s, mc, sids, mflat, base
):
    """Assemble the SyncmerDB from device-assigned ids in per-read flat
    order: coverage by bincount, position lists by a radix counting sort
    of the host-computed low keys by id -- stable over the ascending
    flat (sid, idx, rev) order, exactly the reference's per-cluster
    order -- and the per-read k_mer rewrite to id<<1."""
    from .. import native
    from ..asm.consensus import set_read_flats
    from .syncmer_db import FlatViews, SyncmerDB

    n_tot = len(gid_flat)
    cov = np.bincount(gid_flat, minlength=n_scm).astype(np.uint32)
    cuts = np.zeros(n_scm + 1, np.int64)
    np.cumsum(cov.astype(np.int64), out=cuts[1:])

    # lows in flat order (= the reference's 128-bit key low half)
    offs = np.zeros(len(mc) + 1, np.int64)
    np.cumsum(mc, out=offs[1:])
    idx = (np.arange(n_tot, dtype=np.int64) - np.repeat(offs[:-1], mc)).astype(
        np.uint64
    )
    lows_flat = (
        (np.repeat(sids, mc).astype(np.uint64) << np.uint64(32))
        | (idx << np.uint64(1))
        | (mflat.astype(np.uint64) & np.uint64(1))
    )
    order = native.argsort_u64(gid_flat.astype(np.uint64))
    if order is None:
        order = np.argsort(gid_flat, kind="stable")
    mp_flat = lows_flat[order]

    db = SyncmerDB(
        h=heads_h.copy(),
        s=heads_s.copy(),
        cov=cov,
        del_=np.zeros(n_scm, dtype=bool),
        m_pos=FlatViews(mp_flat, cuts),
        mp_flat=mp_flat,
        mp_off=cuts,
    )

    new_kmer = gid_flat.astype(np.uint64) << np.uint64(1)
    for r in read_db.reads:
        n = len(r.m_pos)
        if n:
            off = base[r.sid]
            r.k_mer = new_kmer[off : off + n]
        else:
            r.k_mer = new_kmer[:0]
    read_db.version = getattr(read_db, "version", 0) + 1
    set_read_flats(read_db, mc, new_kmer, mflat, None, sids)

    assert int(db.cov.sum()) == n_tot
    return db
