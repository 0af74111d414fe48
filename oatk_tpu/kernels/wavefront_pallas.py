"""Pallas banded-wavefront edit-distance kernel (batched, stepwise).

Device kernel for the LV89 diagonal-wavefront core of
:mod:`oatk_tpu.kernels.wavefront` (reference /root/reference/levdist.c:
48-440): one grid program per alignment; each program precomputes a
next-mismatch table over the (diagonal, target-pos) plane -- turning the
per-diagonal match-run extension into a single gather -- then iterates
wavefront steps in a ``lax.while_loop`` carrying the exact resumable
state of the host implementation (score, d0, n, k[]).

Key properties preserved bit-for-bit vs the numpy/C cores:

- extension order: the FIRST diagonal (ascending j) hitting an end
  aborts the step with earlier diagonals updated and the hitting one
  left unextended (resumable-state contract, levdist.c:277-284);
- the banding rule incl. the reference's ``max_d = max(max_d, ql)``
  quirk (levdist.c:330, kept verbatim for parity);
- stepwise restart: the state returned after aligning a query prefix is
  a valid input for the grown query (the EC DFS invariant).

Because the state round-trips losslessly, the kernel passes the same
property suite as the host cores (tests/test_wavefront.py) and can batch
independent DFS leaves: grid=(B,) runs B alignments concurrently.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl

BIG = np.int32(0x3FFFFFFF)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _suffix_min(idx: jnp.ndarray, length: int) -> jnp.ndarray:
    """Reverse running-minimum along axis 1 via log-step shifts (plain
    jnp ops only, so it lowers on both interpret and Mosaic paths)."""
    sh = 1
    while sh < length:
        shifted = jnp.concatenate(
            [idx[:, sh:], jnp.full((idx.shape[0], sh), BIG, idx.dtype)], axis=1
        )
        idx = jnp.minimum(idx, shifted)
        sh *= 2
    return idx


def _wf_kernel(ts_ref, qs_ref, meta_ref, k_ref, out_meta_ref, out_k_ref,
               *, TL: int, QL: int):
    D_pad = TL + QL + 1          # diagonal rows: d = row - TL
    K1 = TL + 1                  # k' in [0, TL] incl. sentinel column
    D_cap = out_k_ref.shape[-1]

    ts = ts_ref[...].astype(jnp.int32)            # [TL]
    qs = qs_ref[...].astype(jnp.int32)            # [QL]
    meta = meta_ref[...].astype(jnp.int32)        # [8]
    tl, ql, is_ext, bw = meta[0], meta[1], meta[2], meta[3]
    score0, d00, n0 = meta[4], meta[5], meta[6]

    # ---- next-mismatch table nm[r, k'] = min k'' >= k' with a mismatch
    # (out-of-range comparisons count as mismatches) ----
    d = (jnp.arange(D_pad, dtype=jnp.int32) - TL)[:, None]      # [D_pad,1]
    kk = jnp.arange(K1, dtype=jnp.int32)[None, :]               # [1,K1]
    qidx = d + kk
    max_k = jnp.minimum(ql - d, tl) - 1                         # [D_pad,1]
    ts_pad = jnp.concatenate([ts, jnp.full((1,), -1, jnp.int32)])[None, :]  # [1,K1]
    qsv = qs[jnp.clip(qidx, 0, QL - 1)]
    ok = (kk <= max_k) & (qidx >= 0) & (kk < tl)
    neq = ~(ok & (ts_pad == qsv))
    nm = _suffix_min(jnp.where(neq, jnp.broadcast_to(kk, neq.shape), BIG), K1)
    nm_flat = nm.reshape(-1)

    j = jnp.arange(D_cap, dtype=jnp.int32)

    def cond(c):
        return ~c[0]

    def body(c):
        done, hit, score, d0, n, k, t_end, q_end = c
        live = j < n
        dj = d0 + j
        kj = k
        skip = (kj >= tl) | (kj + dj >= ql)
        r = jnp.clip(dj + TL, 0, D_pad - 1)
        gidx = r * K1 + jnp.clip(kj + 1, 0, K1 - 1)
        ext = nm_flat[gidx] - 1
        kkv = jnp.where(skip, kj, ext)
        at_q = kkv + dj == ql - 1
        at_t = kkv == tl - 1
        hitv = live & ~skip & (at_q | at_t) & ((is_ext != 0) | (at_q & at_t))
        first_hit = jnp.min(jnp.where(hitv, j, D_cap))
        upd = live & ~skip & (j < first_hit)
        k1 = jnp.where(upd, kkv, kj)
        any_hit = first_hit < D_cap
        fh = jnp.clip(first_hit, 0, D_cap - 1)
        t_hit = kkv[fh]
        q_hit = kkv[fh] + d0 + fh

        # ---- next wave (only meaningful when no hit) ----
        km1 = jnp.concatenate([jnp.full((1,), -BIG, jnp.int32), k1[:-1]])
        km2 = jnp.concatenate([jnp.full((2,), -BIG, jnp.int32), k1[:-2]])
        c0 = jnp.where((j >= 2) & (j - 2 < n), km2, -BIG)       # insertion
        c1 = jnp.where((j >= 1) & (j - 1 < n), km1 + 1, -BIG)   # mismatch
        c2 = jnp.where(j < n, k1 + 1, -BIG)                     # deletion
        nk = jnp.maximum(jnp.maximum(c0, c1), c2)
        n2 = n + 2
        nd0 = d0 - 1

        grow = (bw < 0) | (n < 2 * bw + 1)
        mdb = jnp.where(
            is_ext != 0, -bw,
            jnp.where(ql < tl, ql - tl - bw, tl - ql - bw),
        )
        xdb = jnp.where(
            is_ext != 0, bw,
            jnp.where(tl > ql, tl - ql + bw, ql - tl + bw),
        )
        # reference band clamps: min_d floored at -tl; max_d RAISED to ql
        # (levdist.c quirk kept verbatim)
        min_d = jnp.where(grow, -tl, jnp.maximum(mdb, -tl))
        max_d = jnp.where(grow, ql, jnp.maximum(xdb, ql))
        stt = jnp.clip(min_d - nd0, 0, n2)
        rtrim = jnp.clip(nd0 + n2 - 1 - max_d, 0, n2)
        n_new = n2 - stt - rtrim
        k2 = nk[jnp.clip(j + stt, 0, D_cap - 1)]  # left-shift by stt
        d0_new = nd0 + stt
        score1 = score + 1
        band_out = (bw >= 0) & (score1 > bw)

        done1 = any_hit | band_out
        return (
            done1,
            any_hit,
            jnp.where(any_hit, score, score1),
            jnp.where(any_hit, d0, d0_new),
            jnp.where(any_hit, n, n_new),
            jnp.where(any_hit, k1, k2),
            jnp.where(any_hit, t_hit, t_end),
            jnp.where(any_hit, q_hit, q_end),
        )

    init = (
        jnp.asarray(False),
        jnp.asarray(False),
        score0,
        d00,
        n0,
        k_ref[...].astype(jnp.int32),
        jnp.int32(-1),
        jnp.int32(-1),
    )
    done, hit, score, d0, n, k, t_end, q_end = lax.while_loop(cond, body, init)

    out_meta_ref[...] = jnp.stack(
        [score, d0, n, hit.astype(jnp.int32), t_end, q_end,
         jnp.int32(0), jnp.int32(0)]
    )
    out_k_ref[...] = k


@partial(jax.jit, static_argnames=("TL", "QL", "D_cap", "interpret"))
def wf_ed_core_pallas_batch(
    ts: jnp.ndarray,    # [B, TL] uint8 (padded)
    qs: jnp.ndarray,    # [B, QL] uint8 (padded)
    meta: jnp.ndarray,  # [B, 8] int32: tl, ql, is_ext, bw, score, d0, n, 0
    k: jnp.ndarray,     # [B, D_cap] int32 wavefront k per diagonal
    TL: int,
    QL: int,
    D_cap: int,
    interpret: bool = False,
):
    """Run the wavefront core for B independent alignments.

    Returns (out_meta [B, 8]: score, d0, n, hit, t_end_raw, q_end_raw,
    0, 0; out_k [B, D_cap])."""
    B = ts.shape[0]
    grid = (B,)
    return pl.pallas_call(
        partial(_wf_kernel, TL=TL, QL=QL),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, TL), lambda b: (b, 0)),
            pl.BlockSpec((None, QL), lambda b: (b, 0)),
            pl.BlockSpec((None, 8), lambda b: (b, 0)),
            pl.BlockSpec((None, D_cap), lambda b: (b, 0)),
        ],
        out_specs=[
            pl.BlockSpec((None, 8), lambda b: (b, 0)),
            pl.BlockSpec((None, D_cap), lambda b: (b, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 8), jnp.int32),
            jax.ShapeDtypeStruct((B, D_cap), jnp.int32),
        ],
        interpret=interpret,
    )(ts, qs, meta, k)


def wf_ed_core_pallas(st, interpret: bool = True) -> bool:
    """Single-state driver with the same contract as
    ``wavefront._wf_ed_core_native``: advances ``st`` in place, returns
    False when the state exceeds the kernel's static capacity (caller
    falls back to the host cores)."""
    tl, ql = len(st.ts), len(st.qs)
    TL = max(128, _round_up(tl + 1, 128))
    QL = max(128, _round_up(ql + 1, 128))
    # the next-mismatch table is (TL+QL+1) x (TL+1) int32; cap sequence
    # lengths so it stays a few MB of VMEM (512 -> ~2.1 MB) and larger
    # blocks fall back to the host cores instead of blowing the Mosaic
    # allocation on real hardware
    if tl > 512 or ql > 512:
        return False
    D_cap = TL + QL + 4
    n = len(st.wk)
    if n > D_cap:
        return False
    ts = np.zeros((1, TL), np.uint8)
    qs = np.zeros((1, QL), np.uint8)
    ts[0, :tl] = st.ts
    qs[0, :ql] = st.qs
    meta = np.zeros((1, 8), np.int32)
    meta[0, :7] = (tl, ql, int(st.is_ext), st.bw, st.score, int(st.wd[0]), n)
    k = np.full((1, D_cap), -BIG, np.int32)
    k[0, :n] = st.wk
    out_meta, out_k = wf_ed_core_pallas_batch(
        jnp.asarray(ts), jnp.asarray(qs), jnp.asarray(meta), jnp.asarray(k),
        TL=TL, QL=QL, D_cap=D_cap, interpret=interpret,
    )
    om = np.asarray(out_meta)[0]
    ok = np.asarray(out_k)[0]
    score, d0, nn, hit, t_raw, q_raw = (
        int(om[0]), int(om[1]), int(om[2]), int(om[3]), int(om[4]), int(om[5])
    )
    st.score = score
    st.wd = d0 + np.arange(nn, dtype=np.int64)
    st.wk = ok[:nn].astype(np.int64)
    if hit:
        st.t_end = t_raw + 1
        st.q_end = q_raw + 1
    else:
        st.t_end = 0
        st.q_end = 0
    return True
