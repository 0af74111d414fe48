"""Wavefront edit distance vs reference levdist test binary + stepwise
restart property."""
import subprocess

import numpy as np
import pytest

from oatk_tpu.kernels.wavefront import WfState, wf_ed, wf_ed_core

LEVTEST = "/root/refbin/levtest"


def _ref_ed(ts: str, qs: str, is_ext: int):
    out = subprocess.run(
        [LEVTEST, ts, qs, str(is_ext)], capture_output=True, text=True
    ).stdout
    for line in out.splitlines():
        if "ED=" in line:
            parts = dict(p.split("=") for p in line.split("] ")[1].split())
            return int(parts["ED"]), int(parts["t_EN"]), int(parts["q_EN"])
    raise RuntimeError(out)


def _rand_pair(rng, tl, ql, mut=0.1):
    t = rng.choice(list("ACGT"), size=tl)
    q = list(t[: min(tl, ql)])
    # mutate
    q = [c if rng.random() > mut else "ACGT"[rng.integers(4)] for c in q]
    while len(q) < ql:
        q.append("ACGT"[rng.integers(4)])
    return "".join(t), "".join(q[:ql])


@pytest.mark.parametrize("is_ext", [0, 1])
def test_vs_reference(rng, is_ext):
    for _ in range(25):
        tl = int(rng.integers(5, 200))
        ql = int(rng.integers(5, 200))
        ts, qs = _rand_pair(rng, tl, ql)
        ref = _ref_ed(ts, qs, is_ext)
        mine = wf_ed(np.frombuffer(ts.encode(), np.uint8), np.frombuffer(qs.encode(), np.uint8), is_ext=bool(is_ext))
        assert mine == ref, (ts, qs, is_ext, mine, ref)


def test_stepwise_restart(rng):
    """Growing the query between wf_ed_core calls must give identical
    results to one-shot alignment (the EC DFS invariant)."""
    for _ in range(20):
        ts, qs = _rand_pair(rng, int(rng.integers(50, 300)), int(rng.integers(50, 300)), 0.15)
        tsb = np.frombuffer(ts.encode(), np.uint8)
        qsb = np.frombuffer(qs.encode(), np.uint8)
        ref = wf_ed(tsb, qsb, is_ext=True)
        st = WfState()
        st.reset(tsb)
        st.is_ext = True
        st.bw = -1
        pos = 0
        while pos < len(qsb):
            pos = min(len(qsb), pos + int(rng.integers(1, 60)))
            st.qs = qsb[:pos]
            wf_ed_core(st)
        assert (st.score, st.t_end, st.q_end) == ref


def test_banded(rng):
    # bw exceeded -> score > bw and zero ends
    ts = "A" * 50
    qs = "C" * 50
    score, t_end, q_end = wf_ed(
        np.frombuffer(ts.encode(), np.uint8), np.frombuffer(qs.encode(), np.uint8), True, bw=5
    )
    assert score > 5 and t_end == 0 and q_end == 0


def test_cigar_traceback_vs_reference(rng):
    from oatk_tpu.kernels.wavefront import WfState, cigar_string, wf_ed_core, wf_traceback

    for _ in range(15):
        ts, qs = _rand_pair(rng, int(rng.integers(10, 150)), int(rng.integers(10, 150)), 0.12)
        out = subprocess.run([LEVTEST, ts, qs, "1"], capture_output=True, text=True).stdout
        ref_cigar = None
        for line in out.splitlines():
            if "CIGAR_STR" in line:
                ref_cigar = line.split(": ", 1)[1].strip()
        st = WfState()
        st.reset(np.frombuffer(ts.encode(), np.uint8))
        st.qs = np.frombuffer(qs.encode(), np.uint8)
        st.is_ext = True
        st.bw = -1
        st.tb = []
        wf_ed_core(st)
        mine = cigar_string(wf_traceback(st))
        assert mine == ref_cigar, (ts, qs, mine, ref_cigar)
