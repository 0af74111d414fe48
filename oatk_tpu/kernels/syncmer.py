"""Vectorized closed-syncmer extraction over padded read batches (HOT LOOP 1).

TPU-first reformulation of the reference's sequential per-base scan
(/root/reference/syncmer.c:243-421).  Instead of a rolling minimizer
buffer, selection is expressed with sliding-window minima (van Herk
two-pass prefix/suffix cummin), which XLA vectorizes across a whole
[B, L] read batch:

  Let M[t] be the hash of the s-mer starting at hoco position t
  (sentinel MAX where out of run / symmetric).  For a k-mer window
  starting at p covering s-mers t in [p, p+q-1], q = w - s + 1:

    open(p)  : M[p] attains the window minimum (oldest-attaining rule)
    close(p) : the last s-mer is a new minimum versus the *previous*
               window  [p-1, p+q-2]  (case 2), or the previous minimum
               was uniquely expiring and the last s-mer wins the
               recomputed window, including the documented tie rule
               (case 3)
    selected(p) = open(p) XOR close(p)   -- the XOR realizes the
               same-position pair removal of the sequential code

  The equivalence with the sequential buffer semantics is validated
  against :mod:`oatk_tpu.kernels.oracle` (itself bit-checked against the
  reference binary's DEBUG_SYNCMER_SEQ dump).

Hash values fit in 2s <= 62 bits, so window minima run in int64 (native
on TPU); only the Murmur k-mer identity hash uses emulated uint64.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .hashes import MURMUR_SEED

I64MAX = np.int64(0x7FFFFFFFFFFFFFFF)
_MURMUR_M = np.uint64(0xC6A4A7935BD1E995)

# ASCII -> 2-bit code table (4 = ambiguous)
from .oracle import SEQ_NT4  # noqa: E402


def _hash64_i64(key: jnp.ndarray, mask: np.uint64) -> jnp.ndarray:
    """Thomas Wang 64-bit mix under mask, on int64 lanes (values < 2^62)."""
    k = key.astype(jnp.uint64)
    m = jnp.uint64(mask)
    k = (~k + (k << 21)) & m
    k = k ^ (k >> 24)
    k = (k + (k << 3) + (k << 8)) & m
    k = k ^ (k >> 14)
    k = (k + (k << 2) + (k << 4)) & m
    k = k ^ (k >> 28)
    k = (k + (k << 31)) & m
    return k.astype(jnp.int64)


def _winmin(M: jnp.ndarray, win: int) -> jnp.ndarray:
    """Sliding-window minimum over the last axis (van Herk / two cummins).

    Returns W with W[..., p] = min(M[..., p : p+win]); windows that run
    past the end use I64MAX padding.  win >= 1.
    """
    B, L = M.shape
    if win == 1:
        return M
    nb = -(-L // win)
    pad = nb * win - L
    Mp = jnp.pad(M, ((0, 0), (0, pad + win)), constant_values=I64MAX)
    blocks = Mp[:, : nb * win + win].reshape(B, nb + 1, win)
    pref = lax.cummin(blocks, axis=2)
    suff = lax.cummin(blocks, axis=2, reverse=True)
    pref = pref.reshape(B, -1)
    suff = suff.reshape(B, -1)
    # winmin[p] = min(suffix-in-block(p), prefix-in-block(p+win-1))
    return jnp.minimum(suff[:, :L], pref[:, win - 1 : win - 1 + L])


def _pack_windows_u64(win_codes: jnp.ndarray, w: int) -> jnp.ndarray:
    """[N, w] 2-bit codes -> [N, nblk] uint64 little-endian Murmur blocks.

    Byte j holds bases 4j..4j+3 with base 4j in bits 7-6; u64 block i is
    the LE read of bytes 8i..8i+7 (matching the reference's in-memory
    layout fed to MurmurHash64A, /root/reference/syncmer.c:173-226).
    """
    return _bytes_to_u64(_pack_window_bytes(win_codes, w))


def _pack_window_bytes(win_codes: jnp.ndarray, w: int) -> jnp.ndarray:
    """[N, w] 2-bit codes -> [N, nblk*8] packed uint8 (base 4j in bits
    7-6 of byte j; zero-padded past ceil(w/4) bytes)."""
    N = win_codes.shape[0]
    n_bytes = (w - 1) // 4 + 1
    nblk = -(-n_bytes // 8)
    # build the packed bytes in u8 and BITCAST to words: the previous
    # i32 formulation materialized a [N, nblk*32] i32 intermediate
    # (54 MB per 3 Mbp chunk); u8 shifts + bitcast_convert_type keep
    # every intermediate at 1 B/lane and the word assembly free
    padded = jnp.pad(win_codes.astype(jnp.uint8), ((0, 0), (0, nblk * 32 - w)))
    quads = padded.reshape(N, nblk * 8, 4)
    return (
        (quads[..., 0] << 6) | (quads[..., 1] << 4) | (quads[..., 2] << 2) | quads[..., 3]
    )


def _bytes_to_u64(bytes_: jnp.ndarray) -> jnp.ndarray:
    """[N, nblk*8] uint8 -> [N, nblk] LE uint64 Murmur blocks."""
    N, nb8 = bytes_.shape
    words = lax.bitcast_convert_type(bytes_.reshape(N, nb8 // 4, 4), jnp.uint32)
    lo = words[:, 0::2].astype(jnp.uint64)
    hi = words[:, 1::2].astype(jnp.uint64)
    return (hi << 32) | lo


def _rc_packed_bytes(bytes_f: jnp.ndarray, w: int) -> jnp.ndarray:
    """Reverse-complement of 2-bit-packed windows, on the PACKED bytes.

    Operating on the 4x-smaller packed representation replaces the
    [N, w] u8 ``(3 - win)[:, ::-1]`` relayout + second quad pack:
    byte-reverse, swap 2-bit fields within each byte, complement
    (c XOR 3 == 3-c, so XOR 0xFF), then funnel-shift the whole stream
    left by the 2*(4*ceil(w/4) - w) pad bits and re-zero the tail."""
    N, nb8 = bytes_f.shape
    n_bytes = (w - 1) // 4 + 1
    b = bytes_f[:, ::-1]
    b = ((b & 0x03) << 6) | ((b & 0x0C) << 2) | ((b & 0x30) >> 2) | (b >> 6)
    b = b ^ jnp.uint8(0xFF)
    # drop the leading pad bases: shift the byte stream left by `sh` bits
    sh = 2 * (4 * n_bytes - w)
    # the reversed stream starts at byte nb8 - n_bytes (bytes past
    # n_bytes were zero pad in the forward stream)
    b = b[:, nb8 - n_bytes :]
    if sh:
        nxt = jnp.pad(b[:, 1:], ((0, 0), (0, 1)))
        b = (b << sh) | (nxt >> (8 - sh))
    # re-zero: only w bases are valid; the last valid byte keeps its top
    # 2*(w%4 or 4) bits, later bytes are zero
    b = jnp.pad(b, ((0, 0), (0, nb8 - n_bytes)))
    col = jnp.arange(nb8, dtype=jnp.int32)
    keep_bits = 2 * (w % 4) if w % 4 else 8
    lastmask = jnp.uint8((0xFF << (8 - keep_bits)) & 0xFF)
    b = jnp.where(col[None, :] < n_bytes - 1, b, b & lastmask)
    b = jnp.where(col[None, :] >= n_bytes, jnp.uint8(0), b)
    return b


def _murmur64_rows(blocks: jnp.ndarray, n_bytes: int) -> jnp.ndarray:
    """Vectorized MurmurHash64A over rows of LE u64 blocks."""
    m = jnp.uint64(_MURMUR_M)
    n_full = n_bytes >> 3
    n_tail = n_bytes & 7
    h0 = jnp.uint64(MURMUR_SEED) ^ (jnp.uint64(n_bytes) * m)
    h = jnp.full(blocks.shape[0], h0, dtype=jnp.uint64)

    def body(i, h):
        k = blocks[:, i] * m
        k = k ^ (k >> 47)
        k = k * m
        h = h ^ k
        return h * m

    if n_full <= 64:
        # unroll: each fori_loop iteration touches only a [N] u64
        # column, so the loop's per-iteration overhead rivals the math;
        # n_full is static (w is static), the unrolled graph is small
        for i in range(n_full):
            h = body(i, h)
    else:
        h = lax.fori_loop(0, n_full, body, h)
    if n_tail:
        h = h ^ blocks[:, n_full]
        h = h * m
    h = h ^ (h >> 47)
    h = h * m
    h = h ^ (h >> 47)
    return h


def _hoco_phase(seq: jnp.ndarray, lens: jnp.ndarray):
    """Shared homopolymer-compression phase: ASCII [B, L] -> hoco code
    arrays (+ bookkeeping).  Returns dict with hoco_c/hoco_l/ho_rl/is_n
    and the effective-N mask (pad counts as N)."""
    B, L = seq.shape
    nt4 = jnp.asarray(SEQ_NT4)
    c = nt4[seq]
    pos_idx = jnp.arange(L, dtype=jnp.int32)
    in_read = pos_idx[None, :] < lens[:, None]
    c = jnp.where(in_read, c, 5)  # 5 = out-of-read sentinel

    prev = jnp.pad(c[:, :-1], ((0, 0), (1, 0)), constant_values=255)
    keep = ((c == 4) | (prev == 4) | (c != prev)) & (c != 5)
    hpos = jnp.cumsum(keep, axis=1, dtype=jnp.int32) - 1
    hoco_l = jnp.where(
        lens > 0, hpos[jnp.arange(B), jnp.maximum(lens - 1, 0)] + 1, 0
    ).astype(jnp.int32)

    scat = jnp.where(keep, hpos, L)
    b_idx = jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32)[:, None], (B, L))
    hoco_c = jnp.zeros((B, L), jnp.uint8).at[b_idx, scat].set(
        jnp.where(c == 4, 0, c).astype(jnp.uint8), mode="drop"
    )
    is_n = jnp.zeros((B, L), bool).at[b_idx, scat].set(c == 4, mode="drop")
    raw_of = jnp.full((B, L), -1, jnp.int32).at[b_idx, scat].set(
        jnp.broadcast_to(pos_idx[None, :], (B, L)), mode="drop"
    )
    nxt_raw = jnp.concatenate([raw_of[:, 1:], jnp.full((B, 1), -1, jnp.int32)], axis=1)
    h_in = pos_idx[None, :] < hoco_l[:, None]
    # run length MINUS ONE, matching the ReadSyncmers.ho_rl convention
    # (reference sr_t, /root/reference/syncmer.h:56)
    ho_rl = jnp.where(
        h_in,
        jnp.where(nxt_raw >= 0, nxt_raw, lens[:, None]) - raw_of - 1,
        0,
    ).astype(jnp.int32)
    eff_n = is_n | ~h_in
    return dict(hoco_c=hoco_c, hoco_l=hoco_l, ho_rl=ho_rl, is_n=is_n, eff_n=eff_n, h_in=h_in)


def _compact_indices(flat_sel: jnp.ndarray, max_out: int) -> jnp.ndarray:
    """Ascending indices of set flags, padded with flat_sel.size.

    Drop-in for ``jnp.nonzero(flat_sel, size=max_out, fill_value=N)``,
    but far faster on TPU: XLA's nonzero lowering (cumsum + scatter)
    serializes (3.0 s at 33M flags).  A flat i32 sort of
    position-or-sentinel keys fixed that (0.11 s); sorting each SUBROW
    (512 wide) independently and stitching subrows with an offset
    gather cuts the sort span from B*L to 512 (measured 4.3x vs
    full-row sort on the real chip) while producing the identical
    globally-ascending order (subrows concatenate in ascending
    flat-index blocks)."""
    if flat_sel.ndim == 1:
        n = flat_sel.size
        idx = jnp.arange(n, dtype=jnp.int32)
        key = jnp.where(flat_sel, idx, jnp.int32(n))
        out = lax.sort(key)[:max_out]
        if n < max_out:
            out = jnp.pad(out, (0, max_out - n), constant_values=n)
        return out
    B, L = flat_sel.shape
    n = B * L
    # split rows into 512-wide subrows when possible: sort cost scales
    # with log^2(width) and the stitch is width-agnostic
    SW = 512 if (L % 512 == 0 and L > 512) else L
    R = B * (L // SW)
    sel2 = flat_sel.reshape(R, SW)
    pos = jnp.arange(SW, dtype=jnp.int32)
    key = jnp.where(sel2, pos[None, :], jnp.int32(SW))
    row_sorted = lax.sort(key, dimension=1)  # per-subrow selected-first
    cnt = jnp.sum(sel2, axis=1, dtype=jnp.int32)
    offs = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(cnt, dtype=jnp.int32)])
    i = jnp.arange(max_out, dtype=jnp.int32)
    row = jnp.clip(
        jnp.searchsorted(offs, i, side="right").astype(jnp.int32) - 1, 0, R - 1
    )
    j = i - offs[row]
    valid = i < offs[R]
    p = row_sorted[row, jnp.clip(j, 0, SW - 1)]
    out = jnp.where(valid, row * SW + p, jnp.int32(n))
    return out


def _compact_sel(sel_code: jnp.ndarray, max_out: int):
    """Compact nonzero selection codes to ascending flat indices.

    Two-stage, gather-free (XLA elementwise gathers and searchsorted
    cost ~1 us PER ELEMENT on TPU; sorts and static slices are fast):

      1. per-subrow (512-wide) sort of ``pos<<2|code`` keys -- the code
         rides in the key's low bits so no post-sort gather is needed;
         keep the first MAXPER candidates per subrow (selection density
         is ~1/500, MAXPER>=64 gives ~60x headroom);
      2. per-GROUP (8 subrows) sort of ``global_rank<<32 |
         flat_idx<<2|code`` int64 candidates truncated to 2*MAXPER,
         then one flat int64 sort over the surviving R/8*2*MAXPER; the
         first max_out slots are the answer in globally-ascending
         order (a 3-level funnel measured ~25% faster than one flat
         R*MAXPER sort).

    If any subrow holds more than MAXPER selections, or any 8-subrow
    group more than 2*MAXPER (pathological density), the reported
    n_sel is inflated past max_out so the loader's existing overflow
    retry re-dispatches with a larger max_out, which doubles MAXPER
    until exact (MAXPER=SW).

    Returns (flat_idx i32[max_out], oc i32[max_out], valid bool,
    n_sel i32 exact, n_sel_report i32 for the capacity slot).
    """
    B, L = sel_code.shape
    n = B * L
    SW = 512 if (L % 512 == 0 and L > 512) else L
    R = B * (L // SW)
    maxper = min(SW, max(32, _ceil_mult(4 * max_out * SW // max(n, 1), 8)))
    sel2 = sel_code.reshape(R, SW)
    pos4 = jnp.arange(SW, dtype=jnp.int32) << 2
    sent = jnp.int32(SW << 2)
    key1 = jnp.where(sel2 != 0, pos4[None, :] | sel2, sent)
    cnt = jnp.sum(sel2 != 0, axis=1, dtype=jnp.int32)
    over64 = None
    if SW == 512 and maxper < SW:
        # hierarchical stage 1: sort each 64-lane block (21 comparator
        # stages vs 45 at 512 wide), keep the first m64 per block, then
        # sort the 8*m64 survivors per subrow -- measured 0.23 ms vs
        # 0.39 for the flat 512-wide sort on a 3.1 Mbp chunk.  A block
        # holding more than m64 selections would lose candidates, so
        # that (vanishingly rare: expected density is ~0.26/block)
        # escalates exactly like a maxper overflow; at maxper == SW the
        # flat exact path runs instead, so retries always terminate.
        m64 = max(8, -(-maxper // 8))
        k64 = lax.sort(key1.reshape(R * 8, 64), dimension=1)
        if m64 < 64:
            over64 = jnp.any(k64[:, m64] != sent)
            k64 = k64[:, :m64]
            rs = lax.sort(k64.reshape(R, 8 * m64), dimension=1)[:, :maxper]
        else:
            rs = lax.sort(k64.reshape(R, SW), dimension=1)[:, :maxper]
    else:
        rs = lax.sort(key1, dimension=1)[:, :maxper]
    return _compact_funnel(rs, cnt, R, SW, maxper, n, max_out, over64)


def _compact_funnel(
    rs, cnt, R: int, SW: int, maxper: int, n: int, max_out: int, over_extra=None
):
    """Shared funnel: truncated per-subrow candidates -> per-8-subrow
    truncated sort -> flat sort -> first max_out, with the
    overflow-escalating n_rep (see _compact_sel docstring).

    Keys are the global ``flat_pos<<2 | code`` alone (i32 whenever
    n<<2 fits): an earlier version prefixed the global rank in the high
    32 bits, but the rank order among valid candidates IS the flat-
    position order, and pure-i32 comparator stages cost half the i64
    ones."""
    n_sel = jnp.sum(cnt)
    use32 = (n << 2) < 2**31
    kdt = jnp.int32 if use32 else jnp.int64
    KSENT = kdt(2**31 - 1) if use32 else I64MAX
    base4 = (jnp.arange(R, dtype=kdt) * (SW << 2))[:, None]
    cand = base4 + rs.astype(kdt)
    cand = jnp.where(
        jnp.arange(maxper, dtype=jnp.int32)[None, :] < jnp.minimum(cnt, maxper)[:, None],
        cand,
        KSENT,
    )
    G = 8
    over_grp = jnp.bool_(False)
    if R % G == 0 and R // G >= 2 and maxper < SW:
        grp = lax.sort(cand.reshape(R // G, G * maxper), dimension=1)[:, : 2 * maxper]
        gcnt = jnp.sum(cnt.reshape(R // G, G), axis=1)
        over_grp = jnp.any(gcnt > 2 * maxper)
        cand = grp
    flat = lax.sort(cand.reshape(-1))[:max_out]
    if cand.size < max_out:
        flat = jnp.pad(flat, (0, max_out - cand.size), constant_values=KSENT)
    valid = flat != KSENT
    low = jnp.where(valid, flat.astype(jnp.int64), jnp.int64(n << 2))
    flat_idx = (low >> 2).astype(jnp.int32)
    oc = (low & 3).astype(jnp.int32)
    over = jnp.any(cnt > maxper) | over_grp
    if over_extra is not None:
        over = over | over_extra
    # inflate so the retry's max_out' yields maxper' >= 2*maxper
    fake = jnp.int32(min(maxper * n // (2 * SW), 2**30))
    n_rep = jnp.where(over, jnp.maximum(n_sel, fake), n_sel)
    return flat_idx, oc, valid, n_sel, n_rep


def _ceil_mult(x: int, m: int) -> int:
    return -(-x // m) * m


def _gather_windows(flat_hoco: jnp.ndarray, starts: jnp.ndarray, w: int) -> jnp.ndarray:
    """Gather length-w uint8 windows at dynamic starts: [N_sel, w].

    vmap(dynamic_slice) lowers to a per-row serialized gather (~0.8 us
    PER ROW on v5e regardless of width); gathering whole 128-byte
    aligned blocks by block index is ~600x faster.  The blocks travel
    as 32 little-endian int32 lanes, realigned with 5 word-level
    bit-decomposed static lane shifts (off//4 < 32) plus one in-lane
    byte funnel (off%4), then unpacked back to bytes -- measured ~2x
    cheaper than byte-level realign (7 passes over 4x the lanes).

    optimization_barrier pins both operands: without it XLA fuses the
    producers INTO the gather and recomputes them per gathered element
    (measured 2.45 ms -> 0.2 ms per 3 Mbp chunk).

    For any valid window (start + w <= size) the clipped block fetch
    never touches bytes outside [start, start+w): the realigned slice
    [off, off+w) stays within the first ceil((127+w)/128) blocks.
    """
    n = flat_hoco.size
    if n % 128:
        flat_hoco = jnp.pad(flat_hoco, (0, 128 - n % 128))
    words = lax.bitcast_convert_type(flat_hoco.reshape(-1, 4), jnp.int32)
    blocks, starts = lax.optimization_barrier((words.reshape(-1, 32), starts))
    nblk = (w + 127) // 128 + 1
    b0 = starts // 128
    bidx = b0[:, None] + jnp.arange(nblk, dtype=jnp.int32)[None, :]
    rows = blocks[jnp.clip(bidx, 0, blocks.shape[0] - 1)].reshape(
        starts.shape[0], nblk * 32
    )
    offw = ((starts % 128) // 4).astype(jnp.int32)
    for k in (16, 8, 4, 2, 1):
        shifted = jnp.pad(rows[:, k:], ((0, 0), (0, k)))
        rows = jnp.where((offw & k != 0)[:, None], shifted, rows)
    ob = ((starts % 4) * 8).astype(jnp.int32)
    nxt = jnp.pad(rows[:, 1:], ((0, 0), (0, 1)))
    lo = lax.shift_right_logical(rows, ob[:, None])
    hi = jnp.where((ob > 0)[:, None], lax.shift_left(nxt, (32 - ob)[:, None]), 0)
    rows = lo | hi
    nw = (w + 3) // 4
    bsh = jnp.arange(4, dtype=jnp.int32) * 8
    by = (rows[:, :nw, None] >> bsh[None, None, :]) & 0xFF
    return by.reshape(starts.shape[0], nw * 4)[:, :w].astype(jnp.uint8)


def _selected_details(hoco_c, hoco_l, sel_code, w: int, s: int, max_out: int):
    """Per-selected strand/smer payload/Murmur hash from selection codes.

    sel_code: [B, L] int32 (0 none, 1 open, 2 close)."""
    B, L = hoco_c.shape
    q = w - s + 1
    mask = np.uint64((1 << (2 * s)) - 1)

    flat_idx, oc, valid, n_sel, n_rep = _compact_sel(sel_code, max_out)
    sel_b = (flat_idx // L).astype(jnp.int32)
    sel_p = (flat_idx % L).astype(jnp.int32)
    safe_b = jnp.where(valid, sel_b, 0)
    safe_p = jnp.where(valid, sel_p, 0)

    flat_hoco = hoco_c.reshape(-1)
    # ONE aligned-block gather serves both hashes: the boundary s-mer
    # (start p for open, p+q-1 for close) is a static slice of the
    # k-mer window [p, p+w)
    starts = (safe_b * L + safe_p).astype(jnp.int32)
    win = _gather_windows(flat_hoco, starts, w)
    sm_win = jnp.where(
        (oc == 1)[:, None], win[:, :s], win[:, q - 1 : q - 1 + s]
    ).astype(jnp.uint64)
    sh = jnp.arange(s, dtype=jnp.uint64)
    fwd = jnp.sum(sm_win << (2 * (s - 1 - sh))[None, :], axis=1) & jnp.uint64(mask)
    rev = jnp.sum((jnp.uint64(3) - sm_win) << (2 * sh)[None, :], axis=1) & jnp.uint64(mask)
    z = (fwd > rev).astype(jnp.int32)
    canon = jnp.minimum(fwd, rev)
    payload = (canon << 1) | z.astype(jnp.uint64)
    payload = jnp.where(oc == 2, payload ^ jnp.uint64(1), payload)

    # Murmur identity over the oriented k-mer window: pack the forward
    # window once, derive the reverse-complement on the packed bytes
    # (4x fewer lanes than reversing the u8 window), select per row
    bytes_f = _pack_window_bytes(win, w)
    bytes_r = _rc_packed_bytes(bytes_f, w)
    blocks = _bytes_to_u64(jnp.where((z == 0)[:, None], bytes_f, bytes_r))
    khash = _murmur64_rows(blocks, (w - 1) // 4 + 1)

    per_read = jnp.sum(sel_code != 0, axis=1, dtype=jnp.int32)
    # single-transfer view: the axon host<->device tunnel is latency
    # bound, so ship (flat_idx<<1|z, smer, khash, n_sel) as ONE int64
    # array instead of 6 separate fetches per chunk
    row0 = jnp.where(valid, (flat_idx.astype(jnp.int64) << 1) | z.astype(jnp.int64), 0)
    # capacity slot carries n_rep: inflated past max_out when the
    # compaction candidate buffer overflowed, so the loader's existing
    # retry re-dispatches with a larger max_out (which widens MAXPER)
    row0 = jnp.concatenate([row0, n_rep.astype(jnp.int64)[None]])
    row1 = jnp.concatenate([payload.astype(jnp.int64), jnp.zeros(1, jnp.int64)])
    kh64 = lax.bitcast_convert_type(khash.astype(jnp.uint64), jnp.int64)
    row2 = jnp.concatenate([kh64, jnp.zeros(1, jnp.int64)])
    packed_out = jnp.stack([row0, row1, row2])
    return dict(
        n_sel=n_sel,
        sel_b=sel_b,
        sel_p=sel_p,
        sel_z=jnp.where(valid, z, 0),
        sel_smer=payload.astype(jnp.int64),
        sel_khash=khash,
        valid=valid,
        per_read=per_read,
        packed=packed_out,
    )


@partial(jax.jit, static_argnames=("w", "s", "max_out", "interpret", "return_hoco"))
def extract_syncmers_batch_pallas(
    seq: jnp.ndarray,
    lens: jnp.ndarray,
    w: int,
    s: int,
    max_out: int,
    interpret: bool = False,
    return_hoco: bool = False,
):
    """Pallas fast path from raw ASCII: hoco (jnp) -> VMEM selection
    kernel -> per-selected details (jnp).  Same output contract as the
    jnp path; return_hoco=True additionally ships the device-computed
    hoco arrays (OATK_TPU_DEVICE_HOCO path: the host skips its own
    hoco+pack pass at the cost of the extra device->host bytes)."""
    from .syncmer_pallas import syncmer_select_pallas

    B, L = seq.shape
    h = _hoco_phase(seq, lens)
    codes = jnp.where(
        h["eff_n"], jnp.where(h["h_in"], 4, 5), h["hoco_c"]
    ).astype(jnp.uint8)
    codes_padded = jnp.pad(codes, ((0, 0), (1, w + 2)), constant_values=5)
    sel = syncmer_select_pallas(codes_padded, w, s, interpret=interpret)
    out = _selected_details(h["hoco_c"], h["hoco_l"], sel, w, s, max_out)
    if return_hoco:
        out.update(
            hoco_c=h["hoco_c"], hoco_l=h["hoco_l"], ho_rl=h["ho_rl"], is_n=h["is_n"]
        )
    return out


@partial(jax.jit, static_argnames=("w", "s", "max_out", "interpret"))
def extract_hoco_packed_pallas(
    packed: jnp.ndarray,  # [B, L//4] uint8, 4 hoco bases/byte (first base high bits)
    hoco_l: jnp.ndarray,  # [B] int32
    n_pos: jnp.ndarray,  # [Nn] int32 flat (b*L + p) ambiguous positions
    w: int,
    s: int,
    max_out: int,
    interpret: bool = False,
):
    """Pallas fast path from 2-bit packed hoco codes (minimal transfer:
    0.25 B/base up the wire; N positions shipped sparsely)."""
    return _extract_hoco_packed_impl(packed, hoco_l, n_pos, w, s, max_out, interpret)


def _extract_hoco_packed_impl(packed, hoco_l, n_pos, w, s, max_out, interpret):
    from .syncmer_pallas import syncmer_select_pallas

    B, L4 = packed.shape
    L = L4 * 4
    shifts = jnp.array([6, 4, 2, 0], jnp.int32)
    codes = (
        ((packed[:, :, None].astype(jnp.int32) >> shifts[None, None, :]) & 3)
        .reshape(B, L)
        .astype(jnp.uint8)
    )
    pos = jnp.arange(L, dtype=jnp.int32)
    codes = jnp.where(pos[None, :] < hoco_l[:, None], codes, jnp.uint8(5))
    # N positions are marked ONLY on the select kernel's input, never on
    # hoco_c: the window gather reads exclusively k-mer windows the
    # kernel verified N-free, so the mask is invisible to it, and
    # keeping hoco_c's producer mask-free keeps the gather fast (with
    # the mask in the chain the producer fusion made the aligned-block
    # gather 2.5 ms/chunk slower; invalid rows' garbage windows are
    # masked by `valid` downstream either way).
    sel_codes = codes
    if n_pos.size:  # skip for N-free chunks
        # TPU scatter serializes (~2 us/index: 2.3 ms/chunk for 1024 N
        # positions); build the sparse N mask on the MXU instead: split
        # each flat index into (block, lane) one-hots and contract over
        # the index axis -- mask[b, l] = sum_k row_k[b] * col_k[l].
        # 0/1 bf16 operands with f32 accumulation are exact; the
        # loader's B*Lp pad sentinel falls in block NB (out of iota
        # range) and drops out, matching the old mode="drop".
        NB = -(-B * L // 512)
        blk = (n_pos // 512).astype(jnp.int32)
        lane = (n_pos % 512).astype(jnp.int32)
        row1h = (blk[:, None] == jnp.arange(NB, dtype=jnp.int32)[None, :]).astype(
            jnp.bfloat16
        )
        col1h = (lane[:, None] == jnp.arange(512, dtype=jnp.int32)[None, :]).astype(
            jnp.bfloat16
        )
        cnt = jax.lax.dot_general(
            row1h,
            col1h,
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        nmask = (cnt > 0.5).reshape(-1)[: B * L].reshape(B, L)
        sel_codes = jnp.where(nmask, jnp.uint8(4), codes)
    codes_padded = jnp.pad(sel_codes, ((0, 0), (1, w + 2)), constant_values=5)
    sel = syncmer_select_pallas(codes_padded, w, s, interpret=interpret)
    hoco_c = jnp.where(codes < 4, codes, jnp.uint8(0))
    return _selected_details(hoco_c, None, sel, w, s, max_out)


@partial(jax.jit, static_argnames=("B", "Lp", "n_cap", "w", "s", "max_out", "interpret"))
def extract_hoco_fused_pallas(
    blob: jnp.ndarray,  # [B*Lp//4 + 4*B + 4*n_cap] uint8: packed | hl(i32) | n_pos(i32)
    B: int,
    Lp: int,
    n_cap: int,
    w: int,
    s: int,
    max_out: int,
    interpret: bool = False,
):
    """Single-transfer variant of :func:`extract_hoco_packed_pallas`: the
    2-bit packed codes, per-read hoco lengths and sparse N positions
    ship as ONE uint8 blob (the relay tunnel is latency-bound, so one
    upload beats three), unpacked on device with bitcasts."""
    np_ = B * Lp // 4
    packed = blob[:np_].reshape(B, Lp // 4)
    hl = lax.bitcast_convert_type(
        blob[np_ : np_ + 4 * B].reshape(B, 4), jnp.int32
    ).reshape(B)
    n_pos = lax.bitcast_convert_type(
        blob[np_ + 4 * B : np_ + 4 * B + 4 * n_cap].reshape(n_cap, 4), jnp.int32
    ).reshape(n_cap)
    return _extract_hoco_packed_impl(packed, hl, n_pos, w, s, max_out, interpret)


@partial(jax.jit, static_argnames=("w", "s", "max_out", "interpret"))
def extract_hoco_batch_pallas(
    codes_u8: jnp.ndarray, w: int, s: int, max_out: int, interpret: bool = False
):
    """Pallas fast path from pre-compressed hoco codes.

    codes_u8: [B, L] uint8 with values 0..3 = bases, 4 = ambiguous,
    5 = padding/after-read-end.  The host computes homopolymer
    compression anyway (per-read run lengths are needed downstream), so
    uploading 1-byte hoco codes skips the device-side compaction scatter
    entirely and shrinks the transfer ~25%.
    """
    from .syncmer_pallas import syncmer_select_pallas

    codes = codes_u8
    codes_padded = jnp.pad(codes, ((0, 0), (1, w + 2)), constant_values=5)
    sel = syncmer_select_pallas(codes_padded, w, s, interpret=interpret)
    hoco_c = jnp.where(codes_u8 < 4, codes_u8, 0).astype(jnp.uint8)
    return _selected_details(hoco_c, None, sel, w, s, max_out)


@partial(jax.jit, static_argnames=("w", "s", "max_out", "return_hoco"))
def extract_syncmers_batch(
    seq: jnp.ndarray, lens: jnp.ndarray, w: int, s: int, max_out: int, return_hoco: bool = True
):
    """Extract closed syncmers from a padded ASCII read batch.

    seq:  [B, L] uint8 ASCII; positions >= lens[b] are padding.
    Returns hoco arrays (omitted when return_hoco=False to avoid big
    device->host transfers; the host recomputes them with numpy) plus
    flat selected-syncmer arrays of size max_out (entries beyond n_sel
    are invalid; flat order = (read, position) ascending which matches
    the reference's emission order).
    """
    B, L = seq.shape
    q = w - s + 1
    mask = np.uint64((1 << (2 * s)) - 1)

    nt4 = jnp.asarray(SEQ_NT4)
    c = nt4[seq]
    pos_idx = jnp.arange(L, dtype=jnp.int32)
    in_read = pos_idx[None, :] < lens[:, None]
    c = jnp.where(in_read, c, 5)  # 5 = out-of-read sentinel

    # ---- homopolymer compression ----
    prev = jnp.pad(c[:, :-1], ((0, 0), (1, 0)), constant_values=255)
    keep = ((c == 4) | (prev == 4) | (c != prev)) & (c != 5)
    hpos = jnp.cumsum(keep, axis=1, dtype=jnp.int32) - 1  # hoco index per raw pos
    hoco_l = jnp.where(
        lens > 0, hpos[jnp.arange(B), jnp.maximum(lens - 1, 0)] + 1, 0
    ).astype(jnp.int32)

    scat = jnp.where(keep, hpos, L)  # drop non-kept
    b_idx = jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32)[:, None], (B, L))
    hoco_c = jnp.zeros((B, L), jnp.uint8).at[b_idx, scat].set(
        jnp.where(c == 4, 0, c).astype(jnp.uint8), mode="drop"
    )
    is_n = jnp.zeros((B, L), bool).at[b_idx, scat].set(c == 4, mode="drop")
    raw_of = jnp.full((B, L), -1, jnp.int32).at[b_idx, scat].set(
        jnp.broadcast_to(pos_idx[None, :], (B, L)), mode="drop"
    )
    nxt_raw = jnp.concatenate([raw_of[:, 1:], jnp.full((B, 1), -1, jnp.int32)], axis=1)
    h_in = pos_idx[None, :] < hoco_l[:, None]
    # run length MINUS ONE, matching the ReadSyncmers.ho_rl convention
    # (reference sr_t, /root/reference/syncmer.h:56)
    ho_rl = jnp.where(
        h_in,
        jnp.where(nxt_raw >= 0, nxt_raw, lens[:, None]) - raw_of - 1,
        0,
    ).astype(jnp.int32)

    # padding beyond hoco_l acts as ambiguous (kills runs / smers)
    eff_n = is_n | ~h_in

    # ---- run length l[h]: consecutive valid hoco positions ending at h ----
    hp = jnp.arange(L, dtype=jnp.int32)
    last_n = lax.cummax(jnp.where(eff_n, hp[None, :], -1), axis=1)
    l_run = hp[None, :] - last_n  # 0 at N positions

    # ---- rolling canonical s-mer per ending position ----
    code64 = hoco_c.astype(jnp.int64)
    # closed form: fwd[h] = sum_{j=0..s-1} code[h-s+1+j] << 2(s-1-j)
    fwd = jnp.zeros((B, L), jnp.int64)
    rev = jnp.zeros((B, L), jnp.int64)
    for j in range(s):
        shifted = jnp.pad(code64, ((0, 0), (s - 1 - j, 0)))[:, :L]  # code[h-(s-1-j)]
        fwd = fwd | (shifted << (2 * (s - 1 - j)))
        rev = rev | ((3 - shifted) << (2 * j))

    smer_ok = (l_run >= s) & (fwd != rev)
    z_s = (fwd > rev).astype(jnp.int32)  # canonical strand
    canon = jnp.minimum(fwd, rev)
    Mh = jnp.where(smer_ok, _hash64_i64(canon, mask), I64MAX)
    Sh = jnp.where(smer_ok, (canon << 1) | z_s.astype(jnp.int64), I64MAX)

    # re-index by s-mer start: M[t] = Mh[t+s-1]
    M = jnp.pad(Mh[:, s - 1 :], ((0, 0), (0, s - 1)), constant_values=I64MAX)
    S = jnp.pad(Sh[:, s - 1 :], ((0, 0), (0, s - 1)), constant_values=I64MAX)

    # ---- window minima ----
    Bq1 = _winmin(M, q - 1)  # min over [p, p+q-2]
    Cq2 = _winmin(M, q - 2) if q > 2 else jnp.full_like(M, I64MAX)

    def shift_l(x, k, fill=I64MAX):  # x[p+k]
        if k == 0:
            return x
        return jnp.pad(x[:, k:], ((0, 0), (0, k)), constant_values=fill)

    def shift_r(x, k, fill=I64MAX):  # x[p-k]
        if k == 0:
            return x
        return jnp.pad(x[:, :-k], ((0, 0), (k, 0)), constant_values=fill)

    last = shift_l(M, q - 1)
    Mp = M
    Mp_1 = shift_r(M, 1)  # M[p-1]
    D = shift_l(Bq1, 1)  # min over [p+1, p+q-1]
    C1 = shift_l(Cq2, 1)  # min over [p+1, p+q-2]

    lw = jnp.pad(l_run, ((0, 0), (0, w)), constant_values=0)
    l_at_pw = lw[:, w : w + L]  # l[p+w] (0 beyond read)
    l_at_pw1 = lw[:, w - 1 : w - 1 + L]  # l[p+w-1]
    p_end_eq = (hp[None, :] + w) == hoco_l[:, None]

    open_ = (
        (Mp != I64MAX)
        & (Mp <= D)
        & ((l_at_pw > w) | (p_end_eq & (l_at_pw1 >= w)))
    )
    case2 = (last <= Mp_1) & (last <= Bq1)
    case3 = (
        ~case2
        & (Mp_1 <= Bq1)
        & (Mp_1 != I64MAX)
        & ((last < Bq1) | ((Mp == last) & (Mp <= C1)))
    )
    close_ = (last != I64MAX) & (l_at_pw1 >= w) & (case2 | case3)

    selected = open_ ^ close_
    z = jnp.where(open_, S & 1, shift_l(S, q - 1) & 1).astype(jnp.int32)
    smer_payload = jnp.where(open_, S, shift_l(S, q - 1) ^ 1)

    # ---- flatten selected ----
    n_sel = jnp.sum(selected, dtype=jnp.int32)
    flat_idx = _compact_indices(selected, max_out)
    valid = flat_idx < B * L
    sel_b = (flat_idx // L).astype(jnp.int32)
    sel_p = (flat_idx % L).astype(jnp.int32)
    safe_b = jnp.where(valid, sel_b, 0)
    safe_p = jnp.where(valid, sel_p, 0)
    sel_z = z.reshape(-1)[jnp.where(valid, flat_idx, 0)]
    sel_smer = smer_payload.reshape(-1)[jnp.where(valid, flat_idx, 0)]

    # ---- Murmur k-mer hash per selected window ----
    # windows are contiguous runs of the (flattened) hoco array,
    # gathered as aligned 128-byte blocks + in-register realign
    # (see _gather_windows)
    flat_hoco = hoco_c.reshape(-1)
    starts = (safe_b * L + safe_p).astype(jnp.int32)

    win = _gather_windows(flat_hoco, starts, w)
    rev_win = (3 - win)[:, ::-1]
    win = jnp.where(sel_z[:, None] == 0, win, rev_win)
    blocks = _pack_windows_u64(win, w)
    khash = _murmur64_rows(blocks, (w - 1) // 4 + 1)

    per_read = jnp.sum(selected, axis=1, dtype=jnp.int32)

    # single-transfer result view (see _selected_details)
    row0 = jnp.where(valid, (flat_idx.astype(jnp.int64) << 1) | sel_z.astype(jnp.int64), 0)
    row0 = jnp.concatenate([row0, n_sel.astype(jnp.int64)[None]])
    row1 = jnp.concatenate([sel_smer.astype(jnp.int64), jnp.zeros(1, jnp.int64)])
    kh64 = lax.bitcast_convert_type(khash.astype(jnp.uint64), jnp.int64)
    row2 = jnp.concatenate([kh64, jnp.zeros(1, jnp.int64)])
    packed_out = jnp.stack([row0, row1, row2])

    out = dict(
        n_sel=n_sel,
        sel_b=sel_b,
        sel_p=sel_p,
        sel_z=sel_z,
        sel_smer=sel_smer,
        sel_khash=khash,
        valid=valid,
        per_read=per_read,
        packed=packed_out,
    )
    if return_hoco:
        out.update(hoco_c=hoco_c, hoco_l=hoco_l, ho_rl=ho_rl, is_n=is_n)
    return out
