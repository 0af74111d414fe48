#!/usr/bin/env python
"""Benchmark: full syncasm pipeline + extraction throughput on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Headline metric = END-TO-END syncasm throughput (Mbp/s) on a 110 Mbp
organelle-realistic dataset (mito 370 kb with a 12 kb direct repeat,
quadripartite pltd 147 kb, 3x nuclear background -- the same family as
tests/validate_large.py), oatk defaults k=1001/s=31, EC ON, 3 unzip
rounds, c=30, vs the reference `syncasm -k 1001 -c 30 -t 4` on the
same reads.  Auxiliary fields keep the earlier 30 Mbp full-pipeline
and extraction+counting numbers (round-1/2 headlines) plus the TPU
kernel spot-check result.

Protocol: the jit cache is warmed on the exact shapes first
(compile-once stream-many is the production regime), then best-of-N to
damp the host<->device relay-tunnel latency variance (BASELINE.md).
Before timing, a small batch runs through the device kernel and is
asserted against the host oracle, so tunnel/Mosaic regressions surface
as a failed bench instead of a wrong number.  After the timed runs the
output GFA is byte-compared against the reference binary's.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

DATA = "/tmp/oatk_bench_reads.fa"
DATA110 = "/tmp/oatk_bench_110.fa"
REFBIN = "/root/refbin/syncasm"
K, S = 1001, 31
N_RUNS = int(os.environ.get("OATK_BENCH_RUNS", "5"))


def ensure_dataset() -> int:
    if os.path.exists(DATA):
        total = 0
        with open(DATA) as f:
            for line in f:
                if not line.startswith(">"):
                    total += len(line) - 1
        return total
    from genome_sim import random_genome, sample_reads

    rng = np.random.default_rng(2026)
    genome = random_genome(rng, 300_000)
    reads = sample_reads(rng, genome, coverage=100, read_len=15_000)
    with open(DATA, "w") as f:
        for i, r in enumerate(reads):
            f.write(f">r{i}\n{r}\n")
    return sum(len(r) for r in reads)


def ensure_dataset_110() -> int:
    if os.path.exists(DATA110):
        total = 0
        with open(DATA110) as f:
            for line in f:
                if not line.startswith(">"):
                    total += len(line) - 1
        return total
    from genome_sim import random_genome, revcomp, sample_reads

    rng = np.random.default_rng(20260818)
    core_a = random_genome(rng, 160_000)
    rep = random_genome(rng, 12_000)
    core_b = random_genome(rng, 186_000)
    mito = core_a + rep + core_b + rep
    lsc = random_genome(rng, 86_000)
    ir = random_genome(rng, 25_000)
    ssc = random_genome(rng, 18_000)
    pltd = lsc + ir + ssc + revcomp(ir)
    reads = []
    reads += sample_reads(rng, mito, coverage=120, read_len=15_000,
                          err_rate=0.001, hp_frac=0.85)
    reads += sample_reads(rng, pltd, coverage=250, read_len=15_000,
                          err_rate=0.001, hp_frac=0.85)
    organelle = sum(len(r) for r in reads)
    need = 110_000_000 - organelle
    for _ in range(8):
        g = random_genome(rng, int(need / 3 / 8))
        reads += sample_reads(rng, g, coverage=3, read_len=15_000,
                              err_rate=0.001, circular=False, hp_frac=0.85)
    rng.shuffle(reads)
    with open(DATA110, "w") as f:
        for i, r in enumerate(reads):
            f.write(f">r{i}\n{r}\n")
    return sum(len(r) for r in reads)


def measure_reference_110(total_bases: int) -> float:
    args = [REFBIN, "-k", str(K), "-s", str(S), "-t", "4", "-c", "30",
            "--unzip-round", "3", "-o", "/tmp/oatk_bench_ref_110"]
    best = None
    for _ in range(3):
        t0 = time.time()
        subprocess.run(args + [DATA110], capture_output=True)
        best = min(best or 1e9, time.time() - t0)
    return total_bases / 1e6 / best


def measure_reference_110_t8(total_bases: int) -> float:
    """Amdahl-extrapolated 8-thread reference throughput at 110 Mbp.

    The bench host has 4 cores, the reference README prescribes -t 8
    (VERDICT r4 weak #4), so the honest target is the t=8 EQUIVALENT:
    fit wall(t) = serial + par/t on t=1,2,4 (best-of-2 each) and
    evaluate at t=8.  Optimistic for the reference (assumes perfect
    scaling to 8 real cores), which keeps the comparison conservative
    for us."""
    walls = {}
    for t in (1, 2, 4):
        args = [REFBIN, "-k", str(K), "-s", str(S), "-t", str(t), "-c", "30",
                "--unzip-round", "3", "-o", f"/tmp/oatk_bench_ref_t{t}"]
        best = None
        for _ in range(2):
            t0 = time.time()
            subprocess.run(args + [DATA110], capture_output=True)
            best = min(best or 1e9, time.time() - t0)
        walls[t] = best
    # least squares for wall = s + p/t over (1, 2, 4)
    import numpy as _np

    A = _np.array([[1.0, 1.0 / t] for t in walls])
    y = _np.array([walls[t] for t in walls])
    s_, p_ = _np.linalg.lstsq(A, y, rcond=None)[0]
    t8 = max(s_ + p_ / 8.0, walls[4] * 0.5)  # sanity floor
    return total_bases / 1e6 / t8


def wire_probe() -> dict:
    """Inline relay-tunnel probe (tools/wire_probe.py measurements as a
    dict) so every BENCH row ships with the session's wire weather and
    cross-round regressions become decidable vs tunnel drift."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x + 1)
    x = jnp.zeros(128, jnp.int32)
    np.asarray(f(x)[:1])  # warm
    t0 = time.time()
    y = x
    for _ in range(30):
        y = f(y)
    np.asarray(y[:1])
    dispatch_ms = (time.time() - t0) / 30 * 1e3
    blob = np.random.randint(0, 255, 4 << 20, dtype=np.uint8)
    g = jax.jit(lambda b: b.sum())
    np.asarray(g(jnp.asarray(blob)))  # warm
    t0 = time.time()
    for _ in range(3):
        np.asarray(g(jnp.asarray(blob)))
    up_mbps = 3 * 4 / (time.time() - t0)
    h = jax.jit(lambda b: jnp.tile(b, 3))
    big = h(jnp.asarray(blob))
    np.asarray(big[:1])
    t0 = time.time()
    _ = np.asarray(big)
    down_mbps = 12 / (time.time() - t0)
    outs = [f(x) for _ in range(10)]
    np.asarray(outs[-1][:1])
    t0 = time.time()
    for o in outs:
        np.asarray(o[:1])
    rtt_ms = (time.time() - t0) / 10 * 1e3
    return {
        "upload_MBps": round(up_mbps, 1),
        "download_MBps": round(down_mbps, 1),
        "dispatch_ms": round(dispatch_ms, 2),
        "rtt_ms": round(rtt_ms, 2),
    }


def measure_reference(total_bases: int, full: bool) -> float:
    args = [REFBIN, "-k", str(K), "-s", str(S), "-t", "4",
            "-o", "/tmp/oatk_bench_ref_full" if full else "/tmp/oatk_bench_ref"]
    if full:
        args += ["-c", "30", "--unzip-round", "3"]
    else:
        args += ["-c", "1000000", "--no-read-ec", "--unzip-round", "0"]
    best = None
    for _ in range(3):
        t0 = time.time()
        subprocess.run(args + [DATA], capture_output=True)
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return total_bases / 1e6 / best


def kernel_spot_check() -> str:
    """Small-batch device-kernel == host-oracle assertion (pre-timing)."""
    from oatk_tpu.asm.reads import extract_all_syncmers
    from oatk_tpu.io.fastx import SeqRecord
    from genome_sim import random_genome

    rng = np.random.default_rng(7)
    recs = []
    for i in range(4):
        seq = random_genome(rng, 4000)
        recs.append(SeqRecord(sid=i, name=f"c{i}", seq=np.frombuffer(seq.encode(), np.uint8)))
    dev = extract_all_syncmers(recs, K, S, use_device=True)
    orc = extract_all_syncmers(recs, K, S, use_device=False)
    for a, b in zip(dev.reads, orc.reads):
        assert np.array_equal(a.m_pos, b.m_pos), "kernel positions != oracle"
        assert np.array_equal(a.k_mer, b.k_mer), "kernel hashes != oracle"
        assert np.array_equal(a.s_mer, b.s_mer), "kernel smers != oracle"
    return "ok"


def tpu_preflight(timeout_s: int = 1200) -> str | None:
    """Claim the TPU once in a THROWAWAY subprocess before the in-process
    jax import: a dead pool leaves `jax.devices()` sleeping in the claim
    poll loop forever (observed 2026-08-20: >60 min, zero sockets open),
    and a hung bench records nothing.  Returns an error string when the
    chip cannot be claimed within timeout_s; the bench then emits an
    honest degraded JSON line instead of hanging."""
    import subprocess as sp

    try:
        r = sp.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, capture_output=True,
        )
    except sp.TimeoutExpired:
        return f"TPU claim did not complete within {timeout_s}s (pool down?)"
    if r.returncode != 0:
        return f"TPU backend init failed: {r.stderr.decode()[-200:]}"
    return None


def ensure_refbin():
    """/root/refbin lives outside the repo and is wiped between rounds;
    rebuild the parity/baseline oracles from /root/reference on demand."""
    if os.path.exists(REFBIN):
        return
    script = os.path.join(REPO, "tools", "build_refbin.sh")
    try:
        subprocess.run(["bash", script], check=True, capture_output=True,
                       timeout=600)
    except Exception:
        pass  # bench degrades to vs_baseline=None rather than crashing


def main():
    ensure_refbin()
    total_bases = ensure_dataset()

    err = tpu_preflight()
    if err is not None:
        print(json.dumps({
            "metric": "syncasm_full_pipeline_throughput_110mbp",
            "value": None,
            "unit": "Mbp/s",
            "vs_baseline": None,
            "error": err,
        }))
        return

    baseline_path = os.path.join(REPO, "BASELINE.json")
    with open(baseline_path) as f:
        baseline = json.load(f)
    pub = baseline.setdefault("published", {})
    changed = False
    if not pub.get("ref_extract_count_mbps") and os.path.exists(REFBIN):
        pub["ref_extract_count_mbps"] = round(measure_reference(total_bases, False), 2)
        changed = True
    if not pub.get("ref_full_pipeline_mbps") and os.path.exists(REFBIN):
        pub["ref_full_pipeline_mbps"] = round(measure_reference(total_bases, True), 2)
        changed = True
    elif os.path.exists(REFBIN) and not os.path.exists("/tmp/oatk_bench_ref_full.utg.final.gfa"):
        measure_reference(total_bases, True)  # regenerate parity oracle files
    total_110 = ensure_dataset_110()
    if not pub.get("ref_full_110_mbps") and os.path.exists(REFBIN):
        pub["ref_full_110_mbps"] = round(measure_reference_110(total_110), 2)
        changed = True
    elif os.path.exists(REFBIN) and not os.path.exists(
        "/tmp/oatk_bench_ref_110.utg.final.gfa"
    ):
        measure_reference_110(total_110)  # regenerate parity oracle files
    if not pub.get("ref_full_110_t8_mbps_est") and os.path.exists(REFBIN):
        pub["ref_full_110_t8_mbps_est"] = round(
            measure_reference_110_t8(total_110), 2
        )
        changed = True
    if changed:
        with open(baseline_path, "w") as f:
            json.dump(baseline, f, indent=2)
    ref_extract = pub.get("ref_extract_count_mbps")
    ref_full = pub.get("ref_full_pipeline_mbps")
    ref_110 = pub.get("ref_full_110_mbps")
    ref_110_t8 = pub.get("ref_full_110_t8_mbps_est")

    import oatk_tpu  # noqa: F401
    from oatk_tpu.asm.pipeline import load_reads, syncasm
    from oatk_tpu.asm.reads import load_and_extract
    from oatk_tpu.index.syncmer_db import collect_syncmer_db

    check = kernel_spot_check()
    wire_pre = wire_probe()

    def spread(times, base):
        """Variance fields for one metric: the tunnel drifts run to run,
        so the best-of scalar alone can't distinguish progress from
        noise (VERDICT r3).  All values in Mbp/s over `base` bases."""
        ts = sorted(times)
        return {
            "best": round(base / 1e6 / ts[0], 2),
            "median": round(base / 1e6 / ts[len(ts) // 2], 2),
            "min": round(base / 1e6 / ts[-1], 2),
            "n": len(ts),
        }

    # ---- extraction + counting (round-1 headline, auxiliary now) ----
    def best_of(fn, n_min, n_max, patience=3):
        """(best, all_times) over adaptive repeats: the relay tunnel has
        slow episodes, so keep running (up to n_max) until the best
        stops improving for `patience` consecutive runs."""
        best, since, times = None, 0, []
        for i in range(n_max):
            t0 = time.time()
            fn()
            dt = time.time() - t0
            times.append(dt)
            if best is None or dt < best * 0.98:
                best, since = min(best or dt, dt), 0
            else:
                since += 1
            if i + 1 >= n_min and since >= patience:
                break
        return best, times

    # warm jit cache on the exact shapes (incl. the device-counting
    # finalize sort consumed by collect_syncmer_db) -- and the host-sort
    # counting path used by the same-session A/B below
    collect_syncmer_db(load_and_extract([DATA], K, S, device_count=True))
    collect_syncmer_db(load_and_extract([DATA], K, S, device_count=False))

    def run_extract():
        # A/B leg: device-resident counting (the production default;
        # explicit here so the A/B stays meaningful under OATK_TPU_COUNT)
        read_db = load_and_extract([DATA], K, S, device_count=True)
        scm_db = collect_syncmer_db(read_db)
        assert scm_db is not None and scm_db.n > 0

    def run_extract_hostsort():
        # A/B leg: identical loader, counting via the host radix sort
        # (round-2 default) instead of the device finalize sort --
        # back-to-back in ONE session so the comparison is tunnel-valid
        read_db = load_and_extract([DATA], K, S, device_count=False)
        scm_db = collect_syncmer_db(read_db)
        assert scm_db is not None and scm_db.n > 0

    best_x, times_x = best_of(run_extract, N_RUNS, 2 * N_RUNS + 2)
    best_xh, times_xh = best_of(run_extract_hostsort, N_RUNS, 2 * N_RUNS + 2)
    extract_mbps = total_bases / 1e6 / best_x

    # ---- full pipeline (EC on, 3 unzip rounds) ----
    def run_full():
        syncasm([DATA], k=K, s=S, min_k_cov=30, do_ec=True, do_unzip=3,
                out="/tmp/oatk_bench_mine")

    best_f, times_f = best_of(run_full, N_RUNS, 2 * N_RUNS + 2)
    full_mbps = total_bases / 1e6 / best_f

    # ---- at-scale full pipeline (110 Mbp, the headline) ----
    shares = {}
    load_split = {}

    def run_full_110():
        res = syncasm([DATA110], k=K, s=S, min_k_cov=30, do_ec=True, do_unzip=3,
                      out="/tmp/oatk_bench_mine_110")
        tm = res.timings or {}
        load = tm.get("load", 0.0)
        collect = tm.get("collect_db", 0.0)
        rest = sum(v for k_, v in tm.items() if k_ not in ("load", "collect_db"))
        tot = load + collect + rest
        if tot and (not shares or tot < shares.get("total_s", 1e9)):
            shares.update(
                load_extract_s=round(load, 3),
                collect_db_s=round(collect, 3),
                downstream_host_s=round(rest, 3),
                total_s=round(tot, 3),
            )
            # loader sub-split of the winning run (VERDICT r3 item 2):
            # main-thread wall phases + worker-side parse/pack CPU sums
            lt = getattr(res.read_db, "load_timings", None) or {}
            load_split.clear()
            load_split.update({k_: round(v, 3) for k_, v in lt.items()})

    best_110, times_110 = best_of(run_full_110, max(3, N_RUNS - 2), N_RUNS + 3)
    full_110_mbps = total_110 / 1e6 / best_110

    # ---- device-busy estimate ----
    # ONE dispatch running the extraction kernel 20x inside a fori_loop
    # (each iteration consumes the previous one's output, so the chain
    # cannot be elided): wall/20 ~ true per-chunk device time with the
    # tunnel's per-dispatch latency paid once, not per iteration
    # (tools/wire_probe.py: dispatch ~1.5 ms but a python-level chain
    # still paid a round trip per .at[].set, which made the old
    # estimator report wire latency as chip time).
    device_busy = {}
    try:
        import jax
        import jax.numpy as jnp

        from oatk_tpu.asm.reads import _round_up, _sel_divisor
        from oatk_tpu.kernels.syncmer import extract_hoco_fused_pallas

        B_, Lp_, ncap_ = 256, 12288, 1024
        # the loader's max_out formula for this grid (overflow, were the
        # random payload denser than expected, is harmless for timing)
        mo_ = _round_up(max(1024, int(B_ * Lp_ / _sel_divisor(K, S))), 1024)
        rng = np.random.default_rng(3)
        packed = rng.integers(0, 256, B_ * Lp_ // 4, dtype=np.uint8)
        hl = np.full(B_, Lp_ - 8, np.int32)
        n_arr = np.full(ncap_, B_ * Lp_, np.int32)
        blob0 = np.concatenate([packed, hl.view(np.uint8), n_arr.view(np.uint8)])
        iters = 20

        @jax.jit
        def chain(blob, n):
            from jax import lax

            def body(_, b):
                out = extract_hoco_fused_pallas(b, B_, Lp_, ncap_, K, S, mo_)
                # consume EVERY output element (XOR-reduce all three
                # packed rows): feeding back only packed[0,0] let XLA
                # dead-code-eliminate the murmur/payload tail (~0.3
                # ms/chunk) and over-report throughput
                red = jnp.bitwise_xor(
                    jnp.bitwise_xor(out["packed"][0], out["packed"][1]),
                    out["packed"][2],
                )
                tot = lax.reduce(red, jnp.int64(0), lax.bitwise_xor, (0,))
                return b.at[0].set(tot.astype(jnp.uint8))

            return lax.fori_loop(0, n, body, blob)

        blob = jnp.asarray(blob0)
        _ = np.asarray(chain(blob, np.int32(1))[:1])  # warm + sync
        t0 = time.time()
        _ = np.asarray(chain(blob, np.int32(iters))[:1])
        dt = time.time() - t0
        t0 = time.time()
        _ = np.asarray(chain(blob, np.int32(1))[:1])
        dt1 = time.time() - t0  # dispatch+fetch overhead, 1 iteration
        per_chunk = max(1e-9, (dt - dt1) / (iters - 1))
        gbps = B_ * Lp_ / per_chunk / 1e9
        device_busy = {
            "kernel_gbps": round(gbps, 2),
            "device_busy_110mbp_est_s": round(total_110 / 1e9 / gbps, 4),
            "dispatch_overhead_s": round(dt1, 4),
        }
    except Exception as e:  # never fail the bench on the estimator
        device_busy = {"error": str(e)[:120]}

    wire_post = wire_probe()

    parity = "unchecked"
    ref_gfa = "/tmp/oatk_bench_ref_full.utg.final.gfa"
    if os.path.exists(ref_gfa):
        a = open(ref_gfa, "rb").read()
        b = open("/tmp/oatk_bench_mine.utg.final.gfa", "rb").read()
        parity = "ok" if a == b else "MISMATCH"
        assert parity == "ok", "bench output differs from reference GFA"
    ref_gfa_110 = "/tmp/oatk_bench_ref_110.utg.final.gfa"
    if os.path.exists(ref_gfa_110):
        a = open(ref_gfa_110, "rb").read()
        b = open("/tmp/oatk_bench_mine_110.utg.final.gfa", "rb").read()
        assert a == b, "110 Mbp bench output differs from reference GFA"
        parity = "ok" if parity == "ok" else parity

    # same-session A/B attribution (VERDICT r3 item 3): both counting
    # paths measured back-to-back, so a devcount-vs-hostsort delta is
    # code, not tunnel drift; any cross-session metric move that stays
    # WITHIN this A/B spread is tunnel noise.
    xh_mbps = total_bases / 1e6 / best_xh
    delta = (extract_mbps - xh_mbps) / xh_mbps
    ab_note = (
        f"devcount {extract_mbps:.1f} vs hostsort {xh_mbps:.1f} Mbp/s "
        f"same-session ({delta:+.1%}); cross-session drift beyond this "
        "is tunnel noise"
    )

    print(
        json.dumps(
            {
                "metric": "syncasm_full_pipeline_throughput_110mbp",
                "value": round(full_110_mbps, 2),
                "unit": "Mbp/s",
                "vs_baseline": (
                    round(full_110_mbps / ref_110, 3) if ref_110 else None
                ),
                "vs_baseline_t8": (
                    round(full_110_mbps / ref_110_t8, 3) if ref_110_t8 else None
                ),
                "wire_pre": wire_pre,
                "wire_post": wire_post,
                "counting_default": (
                    "auto: host <60MB (30 Mbp leg), device >=60MB (110 Mbp leg)"
                ),
                "full_110mbp_spread": spread(times_110, total_110),
                "full_30mbp_mbps": round(full_mbps, 2),
                "full_30mbp_vs_baseline": (
                    round(full_mbps / ref_full, 3) if ref_full else None
                ),
                "full_30mbp_spread": spread(times_f, total_bases),
                "extract_count_mbps": round(extract_mbps, 2),
                "extract_vs_baseline": (
                    round(extract_mbps / ref_extract, 3) if ref_extract else None
                ),
                "extract_spread": spread(times_x, total_bases),
                "extract_hostsort_mbps": round(xh_mbps, 2),
                "extract_hostsort_spread": spread(times_xh, total_bases),
                "counting_ab_attribution": ab_note,
                "kernel_check": check,
                "gfa_parity": parity,
                "stage_shares_110mbp": shares,
                "load_split_110mbp": load_split,
                "device_busy": device_busy,
                "baseline_threads": 4,
                "baseline_note": (
                    "vs_baseline = measured -t 4 reference (this host has 4 "
                    "cores); vs_baseline_t8 = Amdahl-extrapolated -t 8 "
                    "equivalent (README-prescribed config), fitted from "
                    "t=1/2/4 walls"
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
