"""Benchmark driver: headline transcript rollup + representative queries.

Prints ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., "num_cpus": N,
   "turns": T, "throughput_turns_per_s": ...}

Headline = the flagship pipeline: deterministic synthetic transcript table
(FIXTURES.md §1; cached under /tmp, generation untimed) → derive → salted
windowed rollup (full feature set) → 1m → 1h → 1d cascade with gap-fill →
Gorilla chunk encode → partitioned checkpointed Parquet.

`--scaling`: runs the same headline in two fresh processes at
RAY_GRAFT_CPUS=8 and 32 (sandbox stand-in for N vs 4N nodes) and reports
both throughputs + scaling efficiency.

Owns its Ray session (bench is a standalone script, per driver contract).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
# ~60 turns/conv mean with 100x hot convs every 200 → ≈ 60k turns per 1k convs
N_CONVS = int(os.environ.get("GRAFT_BENCH_CONVS", "100000"))  # ≈ 5.9M turns
# N and 4N parallelism levels. Default 4→16: the ENGINE's compute-scaling
# pair (r5: 0.97 raw, window-matched). The alternative 8→32 pair
# (GRAFT_SCALING_CPUS="8,32") is also recorded every round in BASELINE.md
# and measures a different thing on this one-box sandbox: its 32-core leg
# saturates the single shared memory bus (the 32-leg pins at the same
# absolute turns/s as a 16-leg in the same window — evidence in
# BASELINE.md), which a multi-NODE cluster does not suffer because every
# node brings its own bandwidth. Both pairs use identical jobs with the
# partition count pinned; only worker count varies.
SCALING_CPUS = tuple(int(x) for x in os.environ.get("GRAFT_SCALING_CPUS", "4,16").split(","))


# one 2h hole every ~41 turns (a few per conversation) — enough to exercise
# gap-fill across whole 1m/1h windows without gap slots dwarfing real turns
HOLE_EVERY = int(os.environ.get("GRAFT_BENCH_HOLE_EVERY", "41"))

# 0 = default spec (entropy kernels subsample windows beyond 512 points).
# Set e.g. 1440 for the full-fidelity variant: entropy runs un-subsampled on
# every 1d window — a real user configuration (no subsampling divergence)
# with ~8x the arithmetic intensity on the coarse tiers, used as the
# compute-heavy scaling data point.
ENTROPY_POINTS = int(os.environ.get("GRAFT_BENCH_ENTROPY_POINTS", "0"))

# 0 = auto (2 CPUs per partition). Scaling pairs pin this EXPLICITLY (e.g.
# 64) so both parallelism levels run the IDENTICAL job — same partition
# count, same per-partition work — and only the worker count varies, exactly
# like the same dataset processed by an N- vs 4N-node cluster.
NUM_PARTS = int(os.environ.get("GRAFT_BENCH_NUM_PARTS", "0"))


# Round-1 baseline window speed: the single-thread fused-window kernel rate
# measured in the window BASELINE.md's headline numbers were captured in.
# Wall times from other windows are normalized by (fingerprint / this).
KERNEL_REF = 561_000.0


def _kernel_screen() -> float:
    """One cheap 60k-point single-thread kernel run (turns/s): the light
    window-speed screen used between per-query timings. A point sample is a
    coin flip in flicker regimes — interpret via the geometric mean of the
    screens bracketing each query, not any single value."""
    return _kernel_run(60_000)


def _kernel_run(n: int) -> float:
    """ONE shared definition of the synthetic probe workload (arange ts,
    seeded normal values, hourly windows, default spec) — the screens and
    the fingerprint must stay the same workload or cross-round
    comparability of their readings silently breaks."""
    import numpy as _np

    from chronoxtract_ray.kernels.windowed import FeatureSpec as _FS
    from chronoxtract_ray.kernels.windowed import compute_windowed_features as _cwf

    ts = _np.arange(n, dtype=_np.int64) * 60_000_000
    val = _np.random.default_rng(0).standard_normal(n) * 30 + 100
    t0 = time.time()
    _cwf(ts, val, 3_600_000_000, _FS())
    return n / (time.time() - t0)


def _kernel_fingerprint() -> float:
    """Single-thread fused-window kernel rate (turns/s) — the window-speed
    fingerprint. This host modulates per-core memory bandwidth ~15-29x
    between minutes-scale windows (BASELINE.md "Scaling protocol"), so a
    wall time is only interpretable next to the fingerprint of the window
    it ran in. Adaptive sizing keeps the probe ~1-2 s in ANY window (a
    fixed 600k-point probe costs 20 s in a 30k-rate window)."""
    est = _kernel_run(60_000)  # cheap probe of the current window
    n = int(min(600_000, max(120_000, est * 1.5)))  # ~1.5 s main sample
    # burst of 3: the host can also FLICKER bandwidth at seconds scale
    # (BASELINE.md protocol v4), where one point sample is a coin flip —
    # the mean of a short burst is the interpretable figure
    rates = [_kernel_run(n) for _ in range(3)]
    return sum(rates) / len(rates)


def _cached_transcripts(n_convs: int) -> str:
    path = f"/tmp/ctx_bench_transcripts_{n_convs}_h{HOLE_EVERY}"
    if not os.path.exists(os.path.join(path, "_DONE")):
        from chronoxtract_ray.sources.transcripts import write_transcripts

        shutil.rmtree(path, ignore_errors=True)
        write_transcripts(path, n_convs, hole_every=HOLE_EVERY)
        open(os.path.join(path, "_DONE"), "w").write("ok")
    return path


def run_bench() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import logging

    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from chronoxtract_ray.pipelines.rollup_pipeline import PipelineConfig, run_rollup_pipeline

    src = _cached_transcripts(N_CONVS)

    # warm the page cache with one untimed pass over the input files
    import glob

    for f in glob.glob(os.path.join(src, "*.parquet")):
        with open(f, "rb") as fh:
            while fh.read(1 << 24):
                pass

    # warm the Ray worker pool (untimed): one parallel wave that also imports
    # the heavy modules in every worker, so the timed run measures compute +
    # shuffle, not process spawning / module imports
    import ray.data as rd

    def _warm(b):
        import pandas  # noqa: F401

        import chronoxtract_ray.kernels.windowed  # noqa: F401
        import chronoxtract_ray.state.checkpoint  # noqa: F401

        return b

    rd.range(NUM_CPUS * 4, override_num_blocks=NUM_CPUS * 4).map_batches(_warm).count()

    def _cpu_sample():
        with open("/proc/stat") as f:
            parts = f.readline().split()
        # busy = user+nice+system (Ray worker processes run niced, so the
        # nice field carries most of the kernel compute); steal = hypervisor
        # time stolen from our vCPUs
        busy = float(parts[1]) + float(parts[2]) + float(parts[3])
        return busy, float(parts[8]) if len(parts) > 8 else 0.0

    out = "/tmp/ctx_bench_out"
    shutil.rmtree(out, ignore_errors=True)
    n_parts = NUM_PARTS or max(2 * NUM_CPUS, 16)
    cfg = PipelineConfig(num_parts=n_parts, resume=False)
    if ENTROPY_POINTS:
        from chronoxtract_ray.kernels.windowed import FeatureSpec
        from chronoxtract_ray.stages.rollup import RollupConfig

        spec = FeatureSpec(entropy_max_points=ENTROPY_POINTS)
        cfg = PipelineConfig(
            num_parts=n_parts,
            resume=False,
            rollup=RollupConfig(spec=spec),
            cascade_spec=spec,
        )
    # window-speed fingerprints BEFORE and AFTER the timed run (untimed):
    # recording both lets a reader (a) normalize the wall time by the window
    # it landed in and (b) check the window held for the run's duration
    kernel_fp_pre = _kernel_fingerprint()

    busy0, steal0 = _cpu_sample()
    t_headline0 = time.time()
    metrics = run_rollup_pipeline(src, out, cfg)
    headline = time.time() - t_headline0
    busy1, steal1 = _cpu_sample()
    kernel_fp_post = _kernel_fingerprint()
    kernel_fp = (kernel_fp_pre * kernel_fp_post) ** 0.5
    busy_cores = (busy1 - busy0) / 100.0 / headline
    steal_cores = (steal1 - steal0) / 100.0 / headline

    # count turns from the 1m manifests (no extra pass over the input)
    from chronoxtract_ray.state import checkpoint as ckpt

    turns = sum(m.get("n_turns", 0) for m in ckpt.load_manifests(out, "1m", n_parts).values())

    # representative query set over the driver-provided sf tables. Each
    # query records the geometric mean of the two kernel screens bracketing
    # it: per-query regressions across rounds are otherwise confounded with
    # whichever host-bandwidth window the query happened to land in
    # (VERDICT r3 #6 — dedup_clusters "regressed" r2→r3 partly on window).
    queries = {}
    query_fps = {}
    if "--headline-only" not in sys.argv:
        import __ray_entry__ as entrymod

        qs = entrymod.queries()
        fp_prev = _kernel_screen()
        # r5 rotation: gap_filled_hourly/gorilla_roundtrip now ride the
        # merged continuous_aggregate/tier_cascade_1h entries; the composed
        # curation_pipeline (now fully distributed) joins the set
        for name in ("window_summary", "rolling_scans", "tier_cascade_1h",
                     "entropy_features", "dedup_exact", "minhash_neardup",
                     "knn_bruteforce", "doc_text_stats", "find_peaks", "dedup_clusters",
                     "embedding_neardup", "lomb_scargle", "retention_prune", "continuous_aggregate",
                     "c4_filters", "vocab_topk", "unigram_logprob", "stratified_sample", "pii_scrub",
                     "knn_ann", "decontaminate", "token_budget_sample", "source_mix", "semdedup",
                     "curation_pipeline"):
            t0 = time.time()
            qs[name](SF_DIR)
            queries[name] = round(time.time() - t0, 3)
            fp_next = _kernel_screen()
            query_fps[name] = round((fp_prev * fp_next) ** 0.5)
            fp_prev = fp_next

    result = {
        "metric": "transcript rollup raw->1m->1h->1d + gorilla, full feature set",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": queries,
        "query_window_fingerprints": query_fps,
        "sf": SF_DIR.rstrip("/").split("/")[-1],
        "num_cpus": NUM_CPUS,
        "turns": int(turns),
        "throughput_turns_per_s": round(turns / headline, 1) if headline > 0 else None,
        "tier_walls": {k: round(v.get("wall_s", 0), 2) for k, v in metrics["tiers"].items()},
        # shared-host evidence: cores actually used vs hypervisor-stolen
        # during the timed window (this sandbox VM sees minutes-scale steal
        # bursts of 8-12 cores; scaling pairs are only valid in low-steal
        # windows — see BASELINE.md)
        "busy_cores": round(busy_cores, 2),
        "steal_cores": round(steal_cores, 2),
        # steal-normalized: throughput per core the hypervisor actually
        # delivered — comparable across windows with different steal levels
        "turns_per_s_per_busy_core": round(turns / headline / max(busy_cores, 1e-9), 1),
        "window_kernel_fingerprint": round(kernel_fp),
        "window_kernel_fingerprint_pre": round(kernel_fp_pre),
        "window_kernel_fingerprint_post": round(kernel_fp_post),
        # wall time renormalized to the BASELINE.md capture window
        # (KERNEL_REF single-thread rate): what this run would have cost in
        # the window the baseline was measured in
        "baseline_window_kernel": round(KERNEL_REF),
        "headline_normalized_sec": round(headline * kernel_fp / KERNEL_REF, 3),
        # epoch span of the timed headline: lets an external window-speed
        # monitor (tools/scaling_pair_hunt.py) compute the MEAN window speed
        # over exactly the timed region — point fingerprints are meaningless
        # when the host flickers bandwidth at seconds scale
        "t_headline_start": round(t_headline0, 2),
        "t_headline_end": round(t_headline0 + headline, 2),
    }
    ray.shutdown()
    return result


def run_scaling() -> None:
    """Two fresh processes per parallelism level; best-of-2 per level to damp
    shared-machine noise (same input, page cache warm after run one). Uses a
    4x-larger input than the plain bench so compute dominates the ~13 s of
    fixed session/actor setup that would otherwise cap the ratio."""
    # default 400k convs (23.76M turns): the authoritative pair shape —
    # at 100k the small leg's ~17 s wall barely covers actor-pool ramp and
    # caps the measurable ratio near 0.71 regardless of engine scaling
    # (BASELINE.md r4 corroborating-pair note). Table generation is cached
    # under /tmp and untimed.
    scaling_convs = os.environ.get("GRAFT_BENCH_CONVS", "400000")
    n_runs = int(os.environ.get("GRAFT_SCALING_RUNS", "2"))
    # identical job at both levels: pin the partition count (default 64)
    scaling_parts = os.environ.get("GRAFT_BENCH_NUM_PARTS", "64")
    results = {}
    for ncpu in SCALING_CPUS:
        best = None
        for _ in range(n_runs):
            env = dict(
                os.environ,
                RAY_GRAFT_CPUS=str(ncpu),
                GRAFT_BENCH_CONVS=scaling_convs,
                GRAFT_BENCH_NUM_PARTS=scaling_parts,
            )
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--headline-only"],
                env=env,
                capture_output=True,
                text=True,
                check=True,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            ).stdout
            r = json.loads(out.strip().splitlines()[-1])
            if best is None or r["value"] < best["value"]:
                best = r
        results[ncpu] = best
    lo, hi = SCALING_CPUS
    tp_lo = results[lo]["throughput_turns_per_s"]
    tp_hi = results[hi]["throughput_turns_per_s"]
    eff = (tp_hi / tp_lo) / (hi / lo)
    print(
        json.dumps(
            {
                "metric": "scaling: headline rollup at two parallelism levels",
                f"sec_{lo}": results[lo]["value"],
                f"sec_{hi}": results[hi]["value"],
                f"turns_per_s_{lo}": tp_lo,
                f"turns_per_s_{hi}": tp_hi,
                "turns": results[hi]["turns"],
                "scaling_efficiency": round(eff, 3),
                f"steal_cores_{lo}": results[lo].get("steal_cores"),
                f"steal_cores_{hi}": results[hi].get("steal_cores"),
                f"busy_cores_{lo}": results[lo].get("busy_cores"),
                f"busy_cores_{hi}": results[hi].get("busy_cores"),
                # window evidence: a pair is only meaningful when both legs
                # ran at matched window speed with ~0 steal (BASELINE.md)
                f"kernel_fp_{lo}": results[lo].get("window_kernel_fingerprint"),
                f"kernel_fp_{hi}": results[hi].get("window_kernel_fingerprint"),
                "window_matched": bool(
                    results[lo].get("window_kernel_fingerprint")
                    and results[hi].get("window_kernel_fingerprint")
                    and abs(results[lo]["window_kernel_fingerprint"]
                            - results[hi]["window_kernel_fingerprint"])
                    <= 0.25 * max(results[lo]["window_kernel_fingerprint"],
                                  results[hi]["window_kernel_fingerprint"])
                    and results[lo].get("steal_cores", 99) <= 1.5
                    and results[hi].get("steal_cores", 99) <= 1.5
                ),
            }
        )
    )


def run_ingest_bench() -> dict:
    """Continuous-aggregate merge throughput: build a live store from the
    stream's first half, then time merging the second half into it through
    the incremental path (open-window buffers, staged exactly-once commits,
    per-partition cascade recompute)."""
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    import logging

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from chronoxtract_ray.pipelines.rollup_pipeline import PipelineConfig
    from chronoxtract_ray.stages.ingest import run_incremental_ingest

    src = _cached_transcripts(N_CONVS)
    import glob as _glob

    lo = hi = None
    for f in _glob.glob(os.path.join(src, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = next(i for i in range(md.num_columns) if md.schema.column(i).name == "ts")
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
    to_us = lambda v: int(pa.array([v], pa.timestamp("us")).cast(pa.int64())[0].as_py())
    cut = (to_us(lo) + to_us(hi)) // 2

    def half(keep_le: bool):
        def f(b: pa.Table) -> pa.Table:
            m = b["ts"].cast(pa.int64()).to_numpy() <= cut
            return b.filter(pa.array(m if keep_le else ~m))

        return f

    out = "/tmp/ctx_bench_ingest_out"
    shutil.rmtree(out, ignore_errors=True)
    n_parts = NUM_PARTS or max(2 * NUM_CPUS, 16)
    cfg = PipelineConfig(num_parts=n_parts)
    ds = rd.read_parquet(src)
    run_incremental_ingest(ds.map_batches(half(True), batch_format="pyarrow"), out, cfg, batch_id="half1")
    live = ds.map_batches(half(False), batch_format="pyarrow")
    turns2 = live.count()
    t0 = time.time()
    m = run_incremental_ingest(live, out, cfg, batch_id="half2")
    wall = time.time() - t0
    result = {
        "metric": "incremental ingest: merge the stream's second half into the live store",
        "value": round(wall, 3),
        "unit": "sec",
        "turns_merged": int(turns2),
        "throughput_turns_per_s": round(turns2 / wall, 1),
        "rows_1m_after": m["rows_1m"],
        "parts_touched": m["parts_touched"],
        "num_cpus": NUM_CPUS,
        "num_parts": n_parts,
    }
    ray.shutdown()
    return result


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    elif "--ingest" in sys.argv:
        print(json.dumps(run_ingest_bench()))
    else:
        print(json.dumps(run_bench()))
