#!/usr/bin/env python
"""Benchmark harness: headline queries + end-to-end ingest throughput.

Runs at ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:
``{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}``

* Each headline query is executed to completion (count/collect) and
  timed wall-clock.
* ``ingest_e2e`` additionally drives the full pipeline — chunker →
  canonical checksum → ordered ACK-gated in-process sink — and the
  companion key ``ingest_records_per_sec`` reports its throughput
  (BASELINE.md "Ingest throughput" row).

Set ``BENCH_ALL=1`` to time every registered query instead of the
headline set.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_ingestion_pimcore_spark import registry
from data_ingestion_pimcore_spark.session import get_spark

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_regional_revenue",
    "join_shuffle_hash",
    "join_broadcast_dim",
    "window_topk_per_group",
    "top10_orders",
    "agg_rollup",
    "ingest_chunk_manifest",
    "dedup_exact",
    "dedup_minhash_signatures",
    "dedup_ngram_jaccard",
    "sim_knn_bruteforce",
    "sim_knn_blocked",
    "text_stats",
    "text_fingerprint",
    "ts_session_window",
    "ts_asof_join",
    "ts_tumbling_window",
    "ts_stream_tumbling",
    "q17_small_quantity_revenue",
    "q18_large_orders",
    "join_salted_skew",
    "sim_knn_ivf",
    "text_chunk_udtf",
    "dedup_embedding_cosine",
    "q7_nation_volume",
    "q21_waiting_suppliers",
    # round-3 additions: epoch'd byte chunker, real-codec multimodal,
    # O(log n) connected components, sequence packing
    "ingest_chunk_by_bytes",
    "mm_feature_extract",
    "dedup_connected_components_star",
    "text_pack_sequences",
    # round-3 second wave: training-data sampling/split, storage
    # layout, incremental dedup, deterministic sketch, LATERAL
    "reshape_split_train_val",
    "reshape_shuffle_global",
    "layout_zorder",
    "dedup_minhash_incremental",
    "agg_distinct_hashsampled",
    "join_lateral_topk",
    # round-3 third wave: statistical/graph analytics, SCD2, and
    # character-level dedup
    "stats_regression_by_group",
    "stats_histogram",
    "graph_triangle_count",
    "ingest_scd2_history",
    "dedup_substring_exact",
    "dedup_containment",
    # round-3 fourth wave: interpolation, funnel, CDC + incremental
    # view maintenance, rolling order statistics
    "ts_interpolate_linear",
    "ts_funnel_pattern",
    "ingest_cdc_diff",
    "ingest_incremental_agg",
    "window_rolling_median",
    "sim_knn_pq",
    "agg_median_twopass",
    "ts_retention_cohorts",
    "ts_anomaly_zscore",
    "stats_skew_kurtosis",
    # round-3 fifth wave: iterative graph ops, perceptual image dedup,
    # corpus-LM scoring, bitmap exact-distinct, data-quality gate
    "graph_pagerank",
    "graph_bfs_hops",
    "mm_image_ahash",
    "text_unigram_lm_score",
    "agg_bitmap_distinct",
    "profile_dq_rules",
    # round-3 sixth wave: late-interaction retrieval, rolling uniques,
    # PIT lookup, DS-shaped analytics, Hilbert layout, basket mining
    "sim_maxsim_late_interaction",
    "ts_sliding_distinct_users",
    "ingest_scd2_pit_lookup",
    "dsq_rollup_topk",
    "layout_hilbert",
    "stats_market_basket",
    "text_bpe_merge_candidates",
    # round-4 additions: pure-JVM chunking (the scale path next to the
    # UDTF extension demo), Count-Min sketch, watermark late-data
    # drop, bloom-prefiltered join
    "text_chunk_windows",
    "stats_countmin_heavy_hitters",
    "ts_stream_late_drop",
    "join_bloom_prefilter",
    "mm_mp4_demux",
    "mm_webm_demux",
    # round-4 second wave: hypothesis tests, EWMA recency, SemDeDup
    "stats_chi_square",
    "stats_ks_test",
    "ts_ewma_recent",
    "dedup_semantic_clusters",
    "ts_changepoint_cusum",
    "stats_benford_digits",
    "mm_audio_vad",
    # surfaced by the round-4 BENCH_ALL sweep as a hidden 12 s outlier
    # (codegen-budget blowout), reworked; benched so it stays visible
    "dedup_embedding_lsh",
    # round-5 additions: Merkle reconciliation, skyline, interval
    # overlap join, Gini, rectangular Hilbert, single-scan ACF rework
    "ingest_checksum_reconcile",
    "skyline_pareto_front",
    "join_interval_overlap",
    "stats_gini_coefficient",
    "layout_hilbert_rect",
    "ts_autocorrelation",
    # round-4 third wave: drift gate, LTTB downsampling, nearest as-of,
    # spherical k-means
    "stats_tv_drift",
    "ts_downsample_lttb",
    "ts_asof_join_nearest",
    "sim_kmeans_lloyd",
    # round-4 fourth wave: hypothesis tests, bootstrap, link
    # prediction, video dedup, dimensional repair
    "stats_mann_whitney_u",
    "stats_bootstrap_ci",
    "stats_ab_ztest",
    "stats_pareto_share",
    "ts_autocorrelation",
    "graph_assortativity",
    "graph_common_neighbors",
    "mm_video_dedup",
    "ingest_late_arriving_dim",
    "ts_seasonal_naive_backtest",
    "ts_peak_detection",
    # round-4 fifth wave: trend/transition features, LSH evaluation,
    # dataset cards
    "ts_rolling_slope",
    "ts_markov_transitions",
    "dedup_lsh_eval_report",
    "curation_dataset_card",
    # round-5 iterative graph + curation additions (benched so the
    # broadcast-LPA and k-core early-stop reworks stay visible)
    "graph_label_propagation",
    "graph_k_core",
    "dedup_entity_resolution",
    "text_remove_boilerplate",
    # round-6 additions: BM25 retrieval, Gopher corpus filters,
    # radius similarity search, Welch's t-test
    "text_bm25_topk",
    "text_gopher_quality_filters",
    "sim_range_search",
    "stats_welch_ttest",
    "agg_audience_overlap",
    # round-8 additions: hard-negative mining, hybrid RRF retrieval,
    # MMR diverse selection
    "sim_hard_negatives",
    "text_hybrid_rrf_topk",
    "sim_mmr_diverse_topk",
]


_REF_CHUNK = 4000


def _ref_loop_blob(sf_dir: str) -> bytes:
    """The reference's input format for the bench table: ONE JSON array
    of lineitem records (the reference ingests giant-array JSON files).
    Building it is untimed setup — the reference is handed this file on
    disk; the timed loop below starts at the parse, which IS part of
    the reference's per-request work (ijson streaming; one-shot orjson
    here is strictly generous to the reference)."""
    import orjson
    import pyarrow.parquet as pq

    rows = pq.read_table(f"{sf_dir.rstrip('/')}/lineitem.parquet").to_pylist()
    return orjson.dumps(rows, default=str)


def _ref_loop_once(blob: bytes) -> float:
    """One reference-equivalent parse-inclusive run (BASELINE.md
    'Measured' table, row 2): single thread, per record byte-measure +
    chunk accumulate (4000), per chunk canonical sort-keys JSON +
    sha256, then the consumer contract's re-parse + canonical re-dump +
    re-hash (CV2/CV3 — the same validation the engine's in-process
    sink performs). Returns records/sec. Running it INSIDE every bench
    session makes the 2× bar ratio noise-immune: numerator and
    denominator see the same co-tenant load (round-6 verdict item 2 —
    cross-session ratios on this ±40% container were unfalsifiable)."""
    import hashlib

    import orjson

    t0 = time.time()
    records = orjson.loads(blob)  # parse-inclusive input read
    n = len(records)
    for i in range(0, n, _REF_CHUNK):
        chunk = records[i : i + _REF_CHUNK]
        for r in chunk:  # per-record byte measure (reference C2)
            len(orjson.dumps(r, default=str))
        body = orjson.dumps(chunk, option=orjson.OPT_SORT_KEYS, default=str)
        digest = hashlib.sha256(body).hexdigest()
        # consumer side: re-parse + canonical re-dump + checksum verify
        re_digest = hashlib.sha256(
            orjson.dumps(
                orjson.loads(body), option=orjson.OPT_SORT_KEYS, default=str
            )
        ).hexdigest()
        assert re_digest == digest
    return n / (time.time() - t0)


def bench_ingest_e2e(
    spark, sf_dir: str
) -> tuple[float, float, list[float], int, list[float], list[float]]:
    """lineitem → canonicalize → chunk(4000) → checksum → ACK sink.
    Returns (median_sec, cold_sec, sorted engine rec/s runs,
    total_records, sorted ref-loop rec/s runs, sorted paired ratios)."""
    import tempfile

    from data_ingestion_pimcore_spark.config import IngestRequest
    from data_ingestion_pimcore_spark.pipeline import ingest
    from data_ingestion_pimcore_spark.sink import ChunkValidator
    from data_ingestion_pimcore_spark.state import IngestionStateStore

    li = spark.read.parquet(f"{sf_dir.rstrip('/')}/lineitem.parquet")
    req = IngestRequest(
        file_path=f"{sf_dir}/lineitem.parquet",
        file_type="parquet",
        chunk_size_by_records=4000,
        re_ingestion=True,  # fresh ingestion_id per bench run
        order_cols=("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"),
    )
    def run_once() -> tuple[float, int]:
        state = IngestionStateStore(tempfile.mktemp(suffix=".parquet"))
        validator = ChunkValidator(retain_records=False)
        t0 = time.time()
        summary = ingest(spark, req, li, state, validator)
        dt = time.time() - t0
        assert summary.status == "COMPLETED", summary
        return dt, summary.total_records

    # Service-startup warm-up (pipeline.warm_ingest): spins up the
    # Python worker pool + Arrow paths on a 64-row ingestion, exactly
    # what a long-running ingestion service does at boot. "cold" is
    # then the first FULL-SIZE ingestion a warmed service receives —
    # the production cold-request number.
    from data_ingestion_pimcore_spark.pipeline import warm_ingest

    warm_ingest(spark, like=li, like_order_cols=req.order_cols)
    # First full execution still JIT-compiles this plan's codegen; the
    # steady state a long-running service sees is summarized over THREE
    # follow-up runs. Single readings on this co-tenant container swing
    # ±40% (BENCH_r05 vs its same-round sweep), so the headline is the
    # MEDIAN of three with the min/max band recorded alongside —
    # a regression is real only when the bands separate. The
    # reference-equivalent loop runs INTERLEAVED (engine, reference,
    # engine, reference, ...) so both medians sample the same co-tenant
    # window and the bar ratio is falsifiable in-session.
    blob = _ref_loop_blob(sf_dir)
    _ref_loop_once(blob)  # warm the parser/allocator like the engine's cold run
    cold, _ = run_once()
    # Ref samples BRACKET each engine run (ref, engine, ref): an engine
    # run takes ~3x a ref run, so a co-tenant burst that hits one engine
    # run almost always hits its surrounding refs too — the PAIRED
    # ratio (mean of the bracketing refs / that engine run) cancels the
    # burst, where two independently-computed medians would not.
    runs, ref_runs, ratios = [], [_ref_loop_once(blob)], []
    for _ in range(3):
        runs.append(run_once())
        ref_runs.append(_ref_loop_once(blob))
        eng = runs[-1][1] / runs[-1][0]
        ratios.append(((ref_runs[-2] + ref_runs[-1]) / 2) / eng)
    total = runs[0][1]
    rps = sorted(r[1] / r[0] for r in runs)
    dt = sorted(r[0] for r in runs)[1]
    return dt, cold, rps, total, sorted(ref_runs), sorted(ratios)


_CONC_SCRIPT = r"""
import json, subprocess, sys, tempfile, threading, time
sys.path.insert(0, {repo!r})
from data_ingestion_pimcore_spark.session import get_spark
from data_ingestion_pimcore_spark.config import IngestRequest
from data_ingestion_pimcore_spark.pipeline import ingest, warm_ingest
from data_ingestion_pimcore_spark.sink import HttpTransport
from data_ingestion_pimcore_spark.state import IngestionStateStore

N, TRIALS = {n_conc}, {trials}
sf_dir = {sf_dir!r}
procs, urls = [], []
for _ in range(N):
    p = subprocess.Popen(
        [sys.executable, "-m", "data_ingestion_pimcore_spark.consumer_server"],
        stdout=subprocess.PIPE, text=True, cwd={repo!r})
    port = p.stdout.readline().split()[1]
    procs.append(p)
    urls.append("http://127.0.0.1:" + port + "/callback")
try:
    spark = get_spark("bench-conc")
    spark.sparkContext.setLogLevel("ERROR")
    li = spark.read.parquet(sf_dir.rstrip("/") + "/lineitem.parquet")
    order = ("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")

    def run_one(i, slot, results):
        req = IngestRequest(
            file_path=sf_dir + "/lineitem.parquet#conc" + str(i),
            file_type="parquet", chunk_size_by_records=4000,
            re_ingestion=True, order_cols=order)
        state = IngestionStateStore(tempfile.mktemp(suffix=".parquet"))
        t0 = time.time()
        s = ingest(spark, req, li, state, HttpTransport(urls[slot]))
        assert s.status == "COMPLETED", s
        results[i] = (time.time() - t0, s.total_records)

    warm_ingest(spark, like=li, like_order_cols=order)
    res = {{}}
    run_one(900, 0, res)  # discarded: JIT + heap growth
    singles = []
    for j in range(2):  # in-probe single-ingestion baseline, same transport
        res = {{}}
        run_one(901 + j, 0, res)
        singles.append(res[901 + j][1] / res[901 + j][0])
    single = sorted(singles)[len(singles) // 2]

    aggs = []
    # Trial 0 is DISCARDED, mirroring the single-side protocol (one
    # JIT/heap-growth run, then measured runs): the first concurrent
    # trial grows the Python worker pool from one ingestion's width to
    # N of them and JIT-compiles the interleaved paths — it read ~4x
    # low (86k vs 351-362k) before warm-up was symmetric.
    for t in range(TRIALS + 1):
        results = {{}}
        threads = [
            threading.Thread(target=run_one, args=(t * N + i, i, results))
            for i in range(N)
        ]
        t0 = time.time()
        [th.start() for th in threads]
        [th.join() for th in threads]
        wall = time.time() - t0
        # a thread that died (consumer crash, rejected chunk) must fail
        # the probe loudly, never silently under-report the aggregate
        assert len(results) == N, sorted(results)
        if t > 0:
            aggs.append(sum(r[1] for r in results.values()) / wall)
    print(json.dumps({{"single_http": singles, "agg_runs": sorted(aggs)}}))
finally:
    for p in procs:
        p.terminate()
"""


def bench_ingest_concurrent(
    sf_dir: str, n_conc: int = 4, trials: int = 3
) -> dict | None:
    """N simultaneous ingestions (distinct ingestion_ids, distinct
    state stores, ONE SparkSession), each POSTing to its OWN consumer
    subprocess over real HTTP — the reference's parallel unit
    (`app/controllers/ingestion_controllers.py:47-51`: one background
    task per request, the consumer an external service whose CV1–CV5
    validation burns ITS cpu, not the producer's). Upstreams
    parallelize across each other on the shared executor pool while
    each contract-serialized drain overlaps the others' compute — the
    second scaling axis claimed in BASELINE.md.

    Runs in a FRESH subprocess JVM (same reason as the 10x probe:
    measured in the main session after the e2e runs it inherits
    accumulated JVM state that depressed the first in-session reading
    ~30%), and measures its OWN single-ingestion baseline over the
    SAME HTTP+consumer-process transport — the scaling ratio is
    apples-to-apples within one JVM and one co-tenant window. Returns
    None on failure (a scale probe must never fail the whole bench)."""
    import subprocess

    repo = os.path.dirname(os.path.abspath(__file__))
    script = _CONC_SCRIPT.format(
        repo=repo, sf_dir=sf_dir, n_conc=n_conc, trials=trials
    )
    try:
        out = subprocess.run(
            [sys.executable, "-c", script],
            capture_output=True,
            text=True,
            timeout=900,
        )
        for line in reversed(out.stdout.splitlines()):
            if line.startswith("{"):
                d = json.loads(line)
                aggs = [float(v) for v in d["agg_runs"]]
                singles = sorted(float(v) for v in d["single_http"])
                single = singles[len(singles) // 2]
                return {
                    "runs": aggs,
                    "median": aggs[len(aggs) // 2],
                    "single_http": single,
                    "n_conc": n_conc,
                }
        return None
    except Exception:
        return None


_TEN_X_SCRIPT = r"""
import functools, json, sys, tempfile, time
sys.path.insert(0, {repo!r})
from data_ingestion_pimcore_spark.session import get_spark
from data_ingestion_pimcore_spark.config import IngestRequest
from data_ingestion_pimcore_spark.pipeline import ingest
from data_ingestion_pimcore_spark.sink import ChunkValidator
from data_ingestion_pimcore_spark.state import IngestionStateStore
from pyspark.sql import functions as F

spark = get_spark("bench10x")
spark.sparkContext.setLogLevel("ERROR")
li = spark.read.parquet({src!r})
parts = [
    li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * 100_000_000))
    for i in range(10)
]
big_path = {big_path!r}
functools.reduce(lambda a, b: a.unionByName(b), parts).repartition(32) \
    .write.parquet(big_path)
big = spark.read.parquet(big_path)
req = IngestRequest(
    file_path=big_path, file_type="parquet", chunk_size_by_records=4000,
    re_ingestion=True,
    order_cols=("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"),
)

def run_once():
    state = IngestionStateStore(tempfile.mktemp(suffix=".parquet"))
    t0 = time.time()
    s = ingest(spark, req, big, state, ChunkValidator(retain_records=False))
    dt = time.time() - t0
    assert s.status == "COMPLETED", s
    return s.total_records / dt

# In-probe reference loop (bench._ref_loop_once on the 1x blob): the
# loop's per-record work is size-independent, so measuring it on the
# 1x input prices the SAME co-tenant window as the 10x engine runs at
# a tenth of the wall cost — the 10x bar ratio stays in-session.
import bench as _bench
blob = _bench._ref_loop_blob({sf_dir!r})
_bench._ref_loop_once(blob)
run_once()  # discarded: pays JIT + heap growth, exactly like the sf cold run
runs, refs, ratios = [], [_bench._ref_loop_once(blob)], []
for _ in range(3):
    runs.append(run_once())
    refs.append(_bench._ref_loop_once(blob))
    ratios.append(((refs[-2] + refs[-1]) / 2) / runs[-1])
print(json.dumps(
    {{"rps10x_runs": runs, "ref10x_runs": refs, "ratio10x_runs": ratios}}))
"""


def bench_ingest_10x(
    sf_dir: str,
) -> tuple[list[float], list[float], list[float]] | None:
    """Scale check: the same pipeline at 10× the bench rows (distinct
    keys per replica). Fixed costs (sampling, job launch, drain-job
    scheduling, first-batch latency) amortize with size, so steady-
    state rec/s RISES toward the single-consumer validation ceiling
    (BASELINE.md) — the number that shows the upstream parallelizes
    and only the contract-mandated sequential edge remains.

    Runs in a FRESH subprocess JVM: measured in the main session the
    run inherits accumulated JVM state (broadcast blocks, shuffle
    files, GC debt) that slows it ~2×, the same effect that makes the
    sf ingest run first. Methodology mirrors the sf metric: one
    discarded full run (JIT + heap growth), then THREE measured runs
    returned sorted (caller reports median + min/max band — single
    readings have swung ±40% with co-tenant load, BENCH_r05 vs its
    same-round sweep). Returns None (metric omitted) if the
    subprocess fails — a scale probe must never fail the whole
    bench."""
    import shutil
    import subprocess
    import tempfile

    repo = os.path.dirname(os.path.abspath(__file__))
    big_dir = tempfile.mkdtemp(prefix="bench10x_")
    script = _TEN_X_SCRIPT.format(
        repo=repo,
        src=f"{sf_dir.rstrip('/')}/lineitem.parquet",
        big_path=f"{big_dir}/li10x.parquet",
        sf_dir=sf_dir,
    )
    try:
        out = subprocess.run(
            [sys.executable, "-c", script],
            capture_output=True,
            text=True,
            # co-tenant bursts have stretched the probe past 540 s;
            # losing the metric costs more than the extra wait
            timeout=900,
        )
        for line in reversed(out.stdout.splitlines()):
            if line.startswith("{"):
                d = json.loads(line)
                return (
                    sorted(float(v) for v in d["rps10x_runs"]),
                    sorted(float(v) for v in d["ref10x_runs"]),
                    sorted(float(v) for v in d["ratio10x_runs"]),
                )
        return None
    except Exception:
        return None
    finally:
        shutil.rmtree(big_dir, ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Untimed warmup: first Spark job pays JVM JIT + vectorized-reader
    # class loading (~6 s) that every later query then skips; measure
    # the engine, not one-time class loading. The applyInPandas probe
    # additionally spins up the Python worker pool + Arrow serializer
    # classes that the ingest pipeline and pandas-UDF queries share —
    # a long-running service pays both exactly once.
    li = spark.read.parquet(f"{sf_dir.rstrip('/')}/lineitem.parquet")
    li.groupBy("l_returnflag").count().count()
    import pandas as _pd

    (
        li.limit(256)
        .groupBy("l_returnflag")
        .applyInPandas(
            lambda pdf: _pd.DataFrame({"n": [len(pdf)]}), schema="n long"
        )
        .count()
    )

    timings: dict[str, float] = {}

    # Ingest e2e runs FIRST: it is the measurement most sensitive to
    # accumulated JVM state (broadcast blocks, shuffle files, GC debt
    # from dozens of prior queries made it read 3x slower than the same
    # pipeline in a fresh session, even after clearCache + System.gc).
    ingest_sec, ingest_cold, rps_runs, _, ref_runs, ratios = bench_ingest_e2e(
        spark, sf_dir
    )
    timings["ingest_e2e"] = round(ingest_sec, 3)
    timings["ingest_e2e_cold"] = round(ingest_cold, 3)
    # Median of 3 + min/max band (rps_runs comes back sorted): the
    # median is the headline; the band is what makes cross-round
    # regression detection possible on a ±40% co-tenant container —
    # a change is real only when the bands don't overlap.
    timings["ingest_records_per_sec"] = round(rps_runs[1], 1)
    timings["ingest_records_per_sec_min"] = round(rps_runs[0], 1)
    timings["ingest_records_per_sec_max"] = round(rps_runs[-1], 1)
    # In-session bar (round-6 verdict item 2): the reference-equivalent
    # parse-inclusive loop ran BRACKETING each engine run, and
    # bar_ratio is the MEDIAN of the three paired ratios — numerator
    # and denominator of each pair saw the same co-tenant window, so
    # the ratio is noise-immune where cross-session comparisons (and
    # even same-session unpaired medians) are not. Bar: ratio < 2.0.
    import statistics

    # ref_runs holds FOUR sorted samples (initial bracket + one per
    # engine run) — statistics.median averages the middle two instead
    # of picking the upper-middle element (which biased high).
    timings["ref_loop_rps"] = round(statistics.median(ref_runs), 1)
    timings["ref_loop_rps_min"] = round(ref_runs[0], 1)
    timings["ref_loop_rps_max"] = round(ref_runs[-1], 1)
    timings["bar_ratio"] = round(ratios[1], 3)
    timings["bar_ratio_min"] = round(ratios[0], 3)
    timings["bar_ratio_max"] = round(ratios[-1], 3)
    print(
        f"# ingest_e2e: {ingest_sec:.2f}s median / {ingest_cold:.2f}s cold "
        f"({rps_runs[1]:,.0f} rec/s median, band "
        f"[{rps_runs[0]:,.0f}, {rps_runs[-1]:,.0f}]); ref loop "
        f"{timings['ref_loop_rps']:,.0f} rec/s → paired bar_ratio "
        f"{timings['bar_ratio']:.2f} "
        f"[{ratios[0]:.2f}, {ratios[-1]:.2f}]",
        file=sys.stderr,
    )
    conc = bench_ingest_concurrent(sf_dir)
    if conc is not None:
        timings["ingest_concurrent_4x"] = round(conc["median"], 1)
        timings["ingest_concurrent_4x_min"] = round(conc["runs"][0], 1)
        timings["ingest_concurrent_4x_max"] = round(conc["runs"][-1], 1)
        timings["ingest_single_http"] = round(conc["single_http"], 1)
        # scaling vs the IN-PROBE single baseline: same JVM, same
        # transport (HTTP + consumer process), same co-tenant window
        timings["ingest_concurrent_scaling"] = round(
            conc["median"] / conc["single_http"], 3
        )
        print(
            f"# ingest_concurrent_4x: {conc['median']:,.0f} rec/s aggregate "
            f"over {conc['n_conc']} simultaneous ingestions, band "
            f"[{conc['runs'][0]:,.0f}, {conc['runs'][-1]:,.0f}]; in-probe "
            f"single {conc['single_http']:,.0f} rec/s → "
            f"{timings['ingest_concurrent_scaling']:.2f}x scaling",
            file=sys.stderr,
        )
    rps10 = bench_ingest_10x(sf_dir)
    if rps10 is not None:
        runs10, ref10, ratio10 = rps10
        timings["ingest_records_per_sec_10x"] = round(runs10[1], 1)
        timings["ingest_records_per_sec_10x_min"] = round(runs10[0], 1)
        timings["ingest_records_per_sec_10x_max"] = round(runs10[-1], 1)
        timings["ref_loop_rps_10x"] = round(statistics.median(ref10), 1)
        timings["bar_ratio_10x"] = round(ratio10[1], 3)
        timings["bar_ratio_10x_min"] = round(ratio10[0], 3)
        timings["bar_ratio_10x_max"] = round(ratio10[-1], 3)
        print(
            f"# ingest_10x: {runs10[1]:,.0f} rec/s median at 10x rows, band "
            f"[{runs10[0]:,.0f}, {runs10[-1]:,.0f}]; in-probe ref loop "
            f"{timings['ref_loop_rps_10x']:,.0f} rec/s → paired bar_ratio_10x "
            f"{timings['bar_ratio_10x']:.2f} "
            f"[{ratio10[0]:.2f}, {ratio10[-1]:.2f}]",
            file=sys.stderr,
        )
        # Headline ORDER (round-7 verdict item 7): the 10x paired
        # ratio is the scale-representative figure — the 1x ratio is
        # dominated by fixed costs (Arrow protocol + job gaps) that
        # amortize with size and vanish on a real cluster; both are
        # emitted, the 10x leads.
        print(
            f"# HEADLINE bar: 10x paired ratio "
            f"{timings['bar_ratio_10x']:.2f} (scale-representative) | "
            f"1x paired ratio {timings['bar_ratio']:.2f} "
            f"(fixed-cost-dominated at bench size; see BASELINE.md "
            f"decomposition)",
            file=sys.stderr,
        )

    all_q = registry.all_queries()
    names = sorted(all_q) if os.environ.get("BENCH_ALL") else HEADLINE
    # Two FULL passes, min per query: co-tenant CPU bursts on this
    # shared container only ever ADD time, so the min is the least-noisy
    # estimator — and because a burst spans minutes, back-to-back reruns
    # of one query would both sit inside it; separating the attempts by
    # a whole pass means a burst must last the entire bench to skew a
    # query's min.
    for _pass in range(2):
        for name in names:
            q = all_q[name]
            t0 = time.time()
            df = q.fn(spark, sf_dir)
            n = df.count()
            dt = round(time.time() - t0, 3)
            if name not in timings or dt < timings[name]:
                timings[name] = dt
            if _pass:
                print(f"# {name}: {timings[name]:.2f}s ({n} rows)", file=sys.stderr)

    _NON_TIMING = (
        "ingest_records_per_sec",
        "ingest_records_per_sec_min",
        "ingest_records_per_sec_max",
        "ingest_records_per_sec_10x",
        "ingest_records_per_sec_10x_min",
        "ingest_records_per_sec_10x_max",
        "ingest_e2e_cold",
        "ingest_concurrent_4x",
        "ingest_concurrent_4x_min",
        "ingest_concurrent_4x_max",
        "ingest_single_http",
        "ingest_concurrent_scaling",
        "ref_loop_rps",
        "ref_loop_rps_min",
        "ref_loop_rps_max",
        "ref_loop_rps_10x",
        "bar_ratio",
        "bar_ratio_min",
        "bar_ratio_max",
        "bar_ratio_10x",
        "bar_ratio_10x_min",
        "bar_ratio_10x_max",
    )
    total = round(
        sum(v for k, v in timings.items() if k not in _NON_TIMING), 3
    )
    # Round-over-round comparability: the headline set grows every
    # round, which inflates headline_total_sec. core_total_sec sums
    # the FIXED round-1 query set only, so it is the number to compare
    # across BENCH_r{N}.json files.
    _CORE = {
        "ingest_e2e", "q1_pricing_summary", "q3_shipping_priority",
        "q5_regional_revenue", "join_shuffle_hash", "join_broadcast_dim",
        "window_topk_per_group", "top10_orders", "agg_rollup",
        "ingest_chunk_manifest", "dedup_exact", "dedup_minhash_signatures",
        "dedup_ngram_jaccard", "sim_knn_bruteforce", "sim_knn_blocked",
        "text_stats", "text_fingerprint", "ts_session_window",
        "ts_asof_join", "ts_tumbling_window", "ts_stream_tumbling",
        "q17_small_quantity_revenue", "q18_large_orders",
        "join_salted_skew", "sim_knn_ivf", "text_chunk_udtf",
        "dedup_embedding_cosine", "q7_nation_volume", "q21_waiting_suppliers",
    }
    core = round(sum(v for k, v in timings.items() if k in _CORE), 3)
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    full = {
        "metric": "headline_total_sec",
        "value": total,
        "unit": "sec",
        "core_total_sec": core,
        "queries": timings,
        "sf": sf_val,
    }
    # The driver captures only a ~2000-char TAIL of bench output;
    # round 3's grown per-query dict pushed the single JSON line past
    # that window and the driver recorded parsed=null. So: the full
    # detail goes out FIRST (and to logs/bench_full.json for local
    # diffing), and the LAST line — the one guaranteed inside any tail
    # capture — is a compact summary whose per-query dict is restricted
    # to the fixed round-1 core set (~1 kB, stable size across rounds).
    print(json.dumps(full))
    try:
        os.makedirs("logs", exist_ok=True)
        with open("logs/bench_full.json", "w") as f:
            json.dump(full, f)
    except OSError:
        pass
    compact_q = {k: v for k, v in timings.items() if k in _CORE}
    for extra in (
        "ingest_records_per_sec",
        "ingest_records_per_sec_min",
        "ingest_records_per_sec_max",
        "ingest_records_per_sec_10x",
        "ingest_records_per_sec_10x_min",
        "ingest_records_per_sec_10x_max",
        "ingest_concurrent_4x",
        "ingest_concurrent_scaling",
        "ref_loop_rps",
        "ref_loop_rps_10x",
        "bar_ratio",
        "bar_ratio_min",
        "bar_ratio_max",
        "bar_ratio_10x",
        "bar_ratio_10x_min",
        "bar_ratio_10x_max",
    ):
        if extra in timings:
            compact_q[extra] = timings[extra]
    sys.stdout.flush()
    print(
        json.dumps(
            {
                "metric": "headline_total_sec",
                "value": total,
                "unit": "sec",
                "core_total_sec": core,
                "queries": compact_q,
                "sf": sf_val,
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
