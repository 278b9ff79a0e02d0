"""WatDiv workload at reference scale.

The reference's SPARQL signal runs the WatDiv stress workload against a
10M-triple generated corpus with a 30s per-query timeout
(crux-bench/src/crux/bench/watdiv_crux.clj:22-27). This harness runs the
repo's 59-instance template workload (tests/test_watdiv.py — same
families, paper-schema corpus, no vendored WatDiv artifacts) at >=1M
triples, through BOTH compilers (sparql_to_datalog and the
independently hand-compiled Datalog), asserting full row-set agreement
per instance and recording wall clock per query.

Usage: python tools/watdiv_scale.py [n_users] [rows|counts]
  n_users: default 32000 ≈ 1.05M triples (310000 ≈ 10M, reference scale)
  mode:    'rows' (default) compares FULL row sets; 'counts' compares
           result counts — what watdiv_crux.clj itself records — and
           keeps the comparison distributed (no driver collect of
           multi-million-row results at 10M).
Writes WATDIV_SCALE.json (rows mode) / WATDIV_SCALE_COUNTS.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"),
)

TIMEOUT_BAR = 30.0  # the reference's own per-query timeout


def main() -> None:
    n_users = int(sys.argv[1]) if len(sys.argv) > 1 else 32000
    mode = sys.argv[2] if len(sys.argv) > 2 else "rows"

    from test_watdiv import _IDS, PREFIXES, TEMPLATES  # noqa: E402

    from crux_spark import Catalog, get_spark
    from crux_spark.datalog import q
    from crux_spark.sources.loaders import pivot_triples
    from crux_spark.sources.sparql import sparql_to_datalog
    from crux_spark.sources.watdiv import watdiv_df

    spark = get_spark("watdiv-scale")
    t0 = time.perf_counter()
    tri = watdiv_df(spark, n_users)
    n_triples = tri.count()
    wide = pivot_triples(tri).repartition(32).localCheckpoint()
    n_entities = wide.count()
    t_build = time.perf_counter() - t0
    cat = Catalog(spark)
    cat.add_documents("watdiv", wide)
    print(
        f"# corpus: {n_triples} triples, {n_entities} entities, "
        f"built in {t_build:.1f}s",
        file=sys.stderr,
    )

    results = {}
    disagreements = []
    over_bar = []
    for (fam, builder, args), qid in zip(TEMPLATES, _IDS):
        sparql, datalog = builder(*args)
        t1 = time.perf_counter()
        sdf = q(cat, sparql_to_datalog(PREFIXES + sparql))
        if mode == "counts":
            got = sdf.count()
        else:
            got = {tuple(r) for r in sdf.collect()}
        dt_sparql = time.perf_counter() - t1
        t2 = time.perf_counter()
        hdf = q(cat, datalog)
        exp = hdf.count() if mode == "counts" else {tuple(r) for r in hdf.collect()}
        dt_hand = time.perf_counter() - t2
        agree = got == exp
        if not agree:
            disagreements.append(qid)
        if max(dt_sparql, dt_hand) > TIMEOUT_BAR:
            over_bar.append(qid)
        n_rows = got if mode == "counts" else len(got)
        results[qid] = {
            "rows": n_rows,
            "agree": agree,
            "sparql_s": round(dt_sparql, 2),
            "hand_s": round(dt_hand, 2),
        }
        print(
            f"# {qid}: rows={n_rows} agree={agree} "
            f"sparql={dt_sparql:.2f}s hand={dt_hand:.2f}s",
            file=sys.stderr,
        )
        # unpin dead per-query checkpoint blocks between instances
        # (bench.py's cleanup): without this, closure checkpoints
        # accumulate across 59 instances and the heavyweights at the
        # tail run under memory pressure — observed as a 6x wall blowup
        # on a re-execution of the IDENTICAL plan
        del sdf, hdf
        import gc

        gc.collect()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass

    out = {
        "n_users": n_users,
        "mode": mode,
        "n_triples": n_triples,
        "n_entities": n_entities,
        "build_s": round(t_build, 1),
        "instances": len(results),
        "disagreements": disagreements,
        "over_30s": over_bar,
        "total_sparql_s": round(sum(r["sparql_s"] for r in results.values()), 1),
        "results": results,
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "WATDIV_SCALE_COUNTS.json" if mode == "counts" else "WATDIV_SCALE.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "results"}))


if __name__ == "__main__":
    main()
