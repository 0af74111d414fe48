"""Pallas TPU kernel for closed-syncmer selection (HOT LOOP 1, fast path).

The jnp reference implementation (:mod:`.syncmer`) expresses the scan as
whole-array int64 ops; XLA materializes every emulated-64-bit log-step
of the sliding minima to HBM, costing ~25 HBM passes.  This kernel does
the whole selection for a tile in VMEM:

  codes tile (+ right halo w+2)
    -> rolling canonical s-mer codes as (hi, lo) uint32 pairs
       (log-step window composition)
    -> Thomas Wang hash64 under the 2s-bit mask (shift/add/xor pairs)
    -> sparse-table sliding minima over q-1 / q-2 s-mer windows and
       sliding any-N over s / w windows (log-step doubling, in VMEM)
    -> open/close selection codes (1=open, 2=close, 0=none/cancelled)

Output is one int8-sized int32 selection code per k-mer start position;
the cheap per-selected work (strand, s-mer payload, Murmur identity
hash) happens in jnp afterwards on the ~1/500-density selected set.

Semantics identical to the jnp path (tested against it and the
sequential oracle, which is bit-checked against the reference binary).
"""
from __future__ import annotations

import sys
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Mosaic lowering of the (long, unrolled) scan graph recurses deeply
sys.setrecursionlimit(max(sys.getrecursionlimit(), 100_000))

U32 = jnp.uint32
SENT_HI = np.uint32(0xFFFFFFFF)
SENT_LO = np.uint32(0xFFFFFFFF)


def _u32(x):
    """Reinterpret int32/bool lanes as uint32.

    Mosaic's convert_element_type rule loops forever on same-width
    signed->unsigned casts (jax 0.9 _convert_helper), so use bitcast."""
    if x.dtype == jnp.bool_:
        x = x.astype(jnp.int32)
    if x.dtype == jnp.uint32:
        return x
    return pltpu.bitcast(x, jnp.uint32)


def _shift_l(x, d, fill):
    """x[:, e + d] with static d >= 0, padding with fill."""
    if d == 0:
        return x
    pad = jnp.full((x.shape[0], d), fill, x.dtype)
    return jnp.concatenate([x[:, d:], pad], axis=1)


def _p_shl(hi, lo, k: int):
    if k == 0:
        return hi, lo
    if k >= 32:
        return (lo << (k - 32)) if k > 32 else lo, jnp.zeros_like(lo)
    return (hi << k) | (lo >> (32 - k)), lo << k


def _p_shr(hi, lo, k: int):
    if k == 0:
        return hi, lo
    if k >= 32:
        return jnp.zeros_like(hi), (hi >> (k - 32)) if k > 32 else hi
    return hi >> k, (lo >> k) | (hi << (32 - k))


def _p_add(ah, al, bh, bl):
    lo = al + bl
    carry = _u32(lo < al)
    return ah + bh + carry, lo


def _p_mask(hi, lo, bits: int):
    if bits >= 64:
        return hi, lo
    if bits <= 32:
        return jnp.zeros_like(hi), lo & np.uint32((1 << bits) - 1)
    return hi & np.uint32((1 << (bits - 32)) - 1), lo


def _p_lt(ah, al, bh, bl):
    return (ah < bh) | ((ah == bh) & (al < bl))


def _p_le(ah, al, bh, bl):
    return (ah < bh) | ((ah == bh) & (al <= bl))


def _p_min(ah, al, bh, bl):
    t = _p_lt(ah, al, bh, bl)
    return jnp.where(t, ah, bh), jnp.where(t, al, bl)


def _hash64_pair(hi, lo, bits: int):
    """Thomas Wang 64-bit mix constrained to `bits` (syncmer.c:116-126)."""
    # key = (~key + (key << 21)) & mask
    sh, sl = _p_shl(hi, lo, 21)
    hi, lo = _p_add(~hi, ~lo, sh, sl)
    hi, lo = _p_mask(hi, lo, bits)
    # key ^= key >> 24
    sh, sl = _p_shr(hi, lo, 24)
    hi, lo = hi ^ sh, lo ^ sl
    # key = (key + (key<<3) + (key<<8)) & mask
    s3h, s3l = _p_shl(hi, lo, 3)
    s8h, s8l = _p_shl(hi, lo, 8)
    hi, lo = _p_add(*_p_add(hi, lo, s3h, s3l), s8h, s8l)
    hi, lo = _p_mask(hi, lo, bits)
    # key ^= key >> 14
    sh, sl = _p_shr(hi, lo, 14)
    hi, lo = hi ^ sh, lo ^ sl
    # key = (key + (key<<2) + (key<<4)) & mask
    s2h, s2l = _p_shl(hi, lo, 2)
    s4h, s4l = _p_shl(hi, lo, 4)
    hi, lo = _p_add(*_p_add(hi, lo, s2h, s2l), s4h, s4l)
    hi, lo = _p_mask(hi, lo, bits)
    # key ^= key >> 28
    sh, sl = _p_shr(hi, lo, 28)
    hi, lo = hi ^ sh, lo ^ sl
    # key = (key + (key << 31)) & mask
    sh, sl = _p_shl(hi, lo, 31)
    hi, lo = _p_add(hi, lo, sh, sl)
    return _p_mask(hi, lo, bits)


def _compose_pow_u32(code, m: int, rev: bool, powers: dict):
    """F_m[e] = sum_{j<m} code[e+j] << 2(m-1-j)  (fwd, MSB-first), or
    R_m[e] = sum_{j<m} code[e+j] << 2j           (rev, LSB-first),
    as a single uint32 (requires m <= 16).  Binary-decomposition
    doubling with shared power-of-two partials cached in `powers`."""
    assert 1 <= m <= 16
    key = ("r" if rev else "f", 1)
    if key not in powers:
        powers[key] = (code, 1)

    def compose(A, a_len, P, p_len):
        # fwd:  F_{a+p}[e] = A[e] << 2p | P[e+a]
        # rev:  R_{a+p}[e] = A[e] | P[e+a] << 2a
        Ps = _shift_l(P, a_len, np.uint32(0))
        if rev:
            return A | (Ps << (2 * a_len)), a_len + p_len
        return (A << (2 * p_len)) | Ps, a_len + p_len

    def pow2(k):
        key = ("r" if rev else "f", k)
        if key not in powers:
            P = pow2(k // 2)
            powers[key] = (compose(P, k // 2, P, k // 2)[0], k)
        return powers[key][0]

    acc = None
    a_len = 0
    for bit in (16, 8, 4, 2, 1):
        if m & bit:
            p = pow2(bit)
            if acc is None:
                acc, a_len = p, bit
            else:
                acc, a_len = compose(acc, a_len, p, bit)
    return acc


def _smer_codes_u32(c2, s: int):
    """Canonical-strand s-mer codes at every start position, as uint32
    (hi, lo) pairs -- computed with pure-u32 doubling on two halves
    that split exactly at the 32-bit boundary (s > 16: hi = F_{s-16}[e],
    lo = F16[e+s-16]; rev: lo = R16[e], hi = R_{s-16}[e+16]), ~2.5x
    fewer vector ops than emulated-64-bit log-doubling."""
    powers: dict = {}
    if s <= 16:
        fl = _compose_pow_u32(c2, s, False, powers)
        fh = jnp.zeros_like(c2)
        rl = _compose_pow_u32(np.uint32(3) - c2, s, True, powers)
        rh = jnp.zeros_like(c2)
        return fh, fl, rh, rl
    a = s - 16
    fa = _compose_pow_u32(c2, a, False, powers)
    f16 = _compose_pow_u32(c2, 16, False, powers)
    fh = fa
    fl = _shift_l(f16, a, np.uint32(0))
    comp = np.uint32(3) - c2
    rpowers: dict = {}
    r16 = _compose_pow_u32(comp, 16, True, rpowers)
    ra = _compose_pow_u32(comp, a, True, rpowers)
    rl = r16
    rh = _shift_l(ra, 16, np.uint32(0))
    return fh, fl, rh, rl


def _win_compose_fwd(code, s: int):
    """F_s[e] = sum_{j<s} code[e+j] << 2(s-1-j) as uint32 pairs."""
    # doubling with binary decomposition of s
    ah = jnp.zeros_like(code)
    al = code
    a_len = 1
    ph, pl_ = ah, al
    p_len = 1
    first = True
    acc = None
    # accumulate powers matching set bits of s, low bit first
    bits = []
    ss = s
    while ss:
        bits.append(ss & 1)
        ss >>= 1
    for bi, bit in enumerate(bits):
        if bit:
            if acc is None:
                acc = (ph, pl_, p_len)
            else:
                # new_acc = P << 2*acc_len | acc[e + p_len]
                # careful: compose so that EARLIER positions take HIGHER bits:
                # F_{a+b}[e] = F_b_at_front... we want F_{p+a}[e] = P[e] << 2a | A[e+p]
                Ah, Al, a_l = acc
                sh, sl_ = _p_shl(ph, pl_, 2 * a_l)
                nh = sh | _shift_l(Ah, p_len, np.uint32(0))
                nl = sl_ | _shift_l(Al, p_len, np.uint32(0))
                acc = (nh, nl, a_l + p_len)
        if bi + 1 < len(bits):
            # double P: F_{2p}[e] = P[e] << 2p | P[e+p]
            sh, sl_ = _p_shl(ph, pl_, 2 * p_len)
            ph = sh | _shift_l(ph, p_len, np.uint32(0))
            pl_ = sl_ | _shift_l(pl_, p_len, np.uint32(0))
            p_len *= 2
    return acc[0], acc[1]


def _win_compose_rev(code, s: int):
    """R_s[e] = sum_{j<s} (3-code[e+j]) << 2j as uint32 pairs."""
    comp = np.uint32(3) - code
    ph, pl_ = jnp.zeros_like(comp), comp
    p_len = 1
    acc = None
    bits = []
    ss = s
    while ss:
        bits.append(ss & 1)
        ss >>= 1
    for bi, bit in enumerate(bits):
        if bit:
            if acc is None:
                acc = (ph, pl_, p_len)
            else:
                # R_{a+p}[e] = A[e] | P[e+a] << 2a
                Ah, Al, a_l = acc
                th = _shift_l(ph, a_l, np.uint32(0))
                tl = _shift_l(pl_, a_l, np.uint32(0))
                th, tl = _p_shl(th, tl, 2 * a_l)
                acc = (Ah | th, Al | tl, a_l + p_len)
        if bi + 1 < len(bits):
            # R_{2p}[e] = P[e] | P[e+p] << 2p
            th = _shift_l(ph, p_len, np.uint32(0))
            tl = _shift_l(pl_, p_len, np.uint32(0))
            th, tl = _p_shl(th, tl, 2 * p_len)
            ph, pl_ = ph | th, pl_ | tl
            p_len *= 2
    return acc[0], acc[1]


def _table_min(hi, lo, width: int):
    """Sliding min over [e, e+width) via doubling sparse table (in VMEM)."""
    if width <= 0:
        return jnp.full_like(hi, SENT_HI), jnp.full_like(lo, SENT_LO)
    th, tl = hi, lo
    span = 1
    while span * 2 <= width:
        sh = _shift_l(th, span, SENT_HI)
        sl = _shift_l(tl, span, SENT_LO)
        th, tl = _p_min(th, tl, sh, sl)
        span *= 2
    if span < width:
        sh = _shift_l(th, width - span, SENT_HI)
        sl = _shift_l(tl, width - span, SENT_LO)
        th, tl = _p_min(th, tl, sh, sl)
    return th, tl


def _window_any(flag, width: int):
    """any(flag[e..e+width-1]) via doubling (int32 max)."""
    t = flag
    span = 1
    while span * 2 <= width:
        t = jnp.maximum(t, _shift_l(t, span, jnp.int32(0)))
        span *= 2
    if span < width:
        t = jnp.maximum(t, _shift_l(t, width - span, jnp.int32(0)))
    return t


def _select_body(code, w: int, s: int, TILE: int, sel_ref):
    """Shared selection pipeline: extended codes [TB, E] (values 0..3
    bases, 4 N, 5 pad; col e = position tile_start + e - 1) -> sel
    codes written to sel_ref[:, :TILE]."""
    q = w - s + 1
    bits = 2 * s
    if True:  # keep the original indentation of the body below
        invalid = (code >= 4).astype(jnp.int32)
        c2 = _u32(jnp.where(code < 4, code, jnp.int32(0)))

        fh, fl, rh, rl = _smer_codes_u32(c2, s)
        # canonical strand: fwd < rev ? fwd : rev; symmetric (==) invalid
        z = ~_p_le(fh, fl, rh, rl)  # True when rev < fwd
        symm = (fh == rh) & (fl == rl)
        ch = jnp.where(z, rh, fh)
        cl = jnp.where(z, rl, fl)
        hh, hl = _hash64_pair(ch, cl, bits)

        smer_bad = (_window_any(invalid, s) > 0) | symm
        Mh = jnp.where(smer_bad, SENT_HI, hh)
        Ml = jnp.where(smer_bad, SENT_LO, hl)

        # windows over s-mer starts; B1 (width q-1) derives from C2
        # (width q-2) with one extra min step instead of a second full
        # log-doubling table: min[e, e+q-2] = min(M[e], C2[e+1])
        if q > 2:
            C2h, C2l = _table_min(Mh, Ml, q - 2)
            B1h, B1l = _p_min(
                Mh, Ml, _shift_l(C2h, 1, SENT_HI), _shift_l(C2l, 1, SENT_LO)
            )
        else:
            C2h = jnp.full_like(Mh, SENT_HI)
            C2l = jnp.full_like(Ml, SENT_LO)
            B1h, B1l = _table_min(Mh, Ml, q - 1)

        anyN_w = _window_any(invalid, w)  # any invalid in [e, e+w-1]

        # per output position p: extended index e = local + 1
        def at(x, d, fill):
            return _shift_l(x, d, fill)

        Mp_h, Mp_l = at(Mh, 1, SENT_HI), at(Ml, 1, SENT_LO)
        Mm1_h, Mm1_l = Mh, Ml  # M[p-1] = extended index 0 offset
        La_h, La_l = at(Mh, q, SENT_HI), at(Ml, q, SENT_LO)  # M[p+q-1]
        Bq1_h, Bq1_l = at(B1h, 1, SENT_HI), at(B1l, 1, SENT_LO)  # [p, p+q-2]
        D_h, D_l = at(B1h, 2, SENT_HI), at(B1l, 2, SENT_LO)  # [p+1, p+q-1]
        C1_h, C1_l = at(C2h, 2, SENT_HI), at(C2l, 2, SENT_LO)  # [p+1, p+q-2]
        noN_w = at(anyN_w, 1, jnp.int32(1)) == 0  # [p, p+w-1] clean
        code_pw = at(code, w + 1, jnp.int32(5))  # code at p+w

        mp_valid = ~((Mp_h == SENT_HI) & (Mp_l == SENT_LO))
        la_valid = ~((La_h == SENT_HI) & (La_l == SENT_LO))
        mm1_valid = ~((Mm1_h == SENT_HI) & (Mm1_l == SENT_LO))

        open_ = (
            mp_valid
            & _p_le(Mp_h, Mp_l, D_h, D_l)
            & noN_w
            & (code_pw != 4)
        )
        case2 = _p_le(La_h, La_l, Mm1_h, Mm1_l) & _p_le(La_h, La_l, Bq1_h, Bq1_l)
        case3 = (
            ~case2
            & _p_le(Mm1_h, Mm1_l, Bq1_h, Bq1_l)
            & mm1_valid
            & (
                _p_lt(La_h, La_l, Bq1_h, Bq1_l)
                | ((Mp_h == La_h) & (Mp_l == La_l) & _p_le(Mp_h, Mp_l, C1_h, C1_l))
            )
        )
        close_ = la_valid & noN_w & (case2 | case3)

        sel = jnp.where(
            open_ ^ close_,
            jnp.where(open_, jnp.int32(1), jnp.int32(2)),
            jnp.int32(0),
        )
        sel_ref[:, :] = sel[:, :TILE]


def _make_kernel(w: int, s: int, TB: int, TILE: int, E: int, u8: bool):
    def kernel(codes_hbm, sel_ref, scratch, sem):
        i = pl.program_id(0)
        j = pl.program_id(1)
        copy = pltpu.make_async_copy(
            codes_hbm.at[pl.ds(i * TB, TB), pl.ds(j * TILE, E)], scratch, sem
        )
        copy.start()
        copy.wait()
        code = scratch[:, :]  # values 0..3 bases, 4=N, 5=pad
        if u8:
            # uint8 input: 4x less HBM traffic for the codes array;
            # widen once in VMEM (Mosaic handles u8->i32 converts)
            code = code.astype(jnp.int32)
        _select_body(code, w, s, TILE, sel_ref)

    return kernel


@partial(jax.jit, static_argnames=("w", "s", "interpret"))
def syncmer_select_pallas(
    codes_padded: jnp.ndarray,
    w: int,
    s: int,
    interpret: bool = False,
):
    """codes_padded: [B, 1 + L + w + 2] int32 or uint8 (col 0 and right
    pad = 5).  uint8 input is preferred: the codes array costs 4x less
    HBM traffic and is widened in VMEM.

    Returns sel codes int32 [B, L]: 0 none, 1 open, 2 close.

    (An in-kernel bitonic sort of the selection keys was tried here and
    removed: 45 partner-select stages cost ~0.5 ms/chunk in VMEM, MORE
    than the hierarchical XLA-side stage-1 sort it replaced -- see
    _compact_sel in syncmer.py.)
    """
    B, Lp = codes_padded.shape
    L = Lp - w - 3
    TB = 8
    # tile-size choice: each tile pays a (w+3)-wide right halo of
    # redundant compute, so bigger tiles amortize it -- but VMEM holds
    # ~15 live [TB, E] i32 arrays, capping E.  Pick the candidate
    # minimizing total scanned lanes ceil(L/T)*(T+halo).
    halo = w + 3
    TILE = _choose_tile(L, w)  # E cap ~ 6.7 MB of [8, E] i32 VMEM arrays
    E = TILE + halo
    # round E up to lanes
    E = -(-E // 128) * 128
    nb = -(-B // TB)
    nt = -(-L // TILE)
    # pad input so every tile read is in-bounds
    padB = nb * TB - B
    padL = nt * TILE + E - Lp
    cp = jnp.pad(codes_padded, ((0, padB), (0, max(0, padL))), constant_values=5)

    u8 = codes_padded.dtype == jnp.uint8
    kernel = _make_kernel(w, s, TB, TILE, E, u8)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nb * TB, nt * TILE), jnp.int32),
        grid=(nb, nt),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((TB, TILE), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((TB, E), jnp.uint8 if u8 else jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(cp)
    return out[:B, :L]


def _choose_tile(L: int, w: int) -> int:
    halo = w + 3
    cap = 14080
    cands = [t for t in (2048, 3072, 4096, 6144, 8192) if t + halo <= cap]
    if L + halo <= cap:
        cands.append(max(128, -(-L // 128) * 128))
    if not cands:
        cands = [2048]
    return min(cands, key=lambda t: -(-L // t) * (t + halo))


