#!/usr/bin/env python
"""spark-submit entry point for the engine (north rule: "launches via
spark-submit --py-files on multi-executor clusters").

Usage (any Spark master — local[N], YARN, k8s; conf comes from spark-submit):

    PYZ=$(python -c "import sys; sys.path.insert(0,'.'); \
from horus_ner_spark.session import build_package_zip; print(build_package_zip())")

    spark-submit --master local[8] --py-files "$PYZ" submit_job.py \
        build --corpus /data/corpus.parquet --index /data/ix

    spark-submit --master local[8] --py-files "$PYZ" submit_job.py \
        query --index /data/ix --query "parse config" --lang python --k 10 \
        [--mode OR|AND|PHRASE|NEAR --slop 8] \
        [--export csv|json --out /data/results]

    spark-submit --master local[8] --py-files "$PYZ" submit_job.py \
        merge --segments /data/ix_a /data/ix_b --out /data/ix_merged

    spark-submit ... submit_job.py \
        serve --index /data/ix [--segments /data/seg0/ix /data/seg1/ix] \
        --port 8765

Each subcommand prints one JSON line with its result summary; ``query``
additionally prints one JSON line per result row.  ``serve`` starts the
always-on HTTP daemon (horus_ner_spark/daemon.py) and blocks — it never
touches the SparkSession (serving is the pyarrow data plane; a fleet of
serve processes shares index files on common storage while Spark remains
the build plane).  Iceberg catalogs plug in via HORUS_TABLE_FORMAT +
--conf (see horus_ner_spark/catalog.py).
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    p = argparse.ArgumentParser(prog="horus-ner-spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    b = sub.add_parser("build", help="SPIMI build (or resume) an index")
    b.add_argument("--corpus", required=True)
    b.add_argument("--index", required=True)
    q = sub.add_parser("query", help="BM25 top-k over a built index")
    q.add_argument("--index", required=True)
    q.add_argument("--query", required=True)
    q.add_argument("--lang", default="python")
    q.add_argument("--k", type=int, default=10)
    q.add_argument("--mode", default="OR",
                   choices=["OR", "AND", "PHRASE", "NEAR"])
    q.add_argument("--slop", type=int, default=8,
                   help="NEAR window span in tokens")
    q.add_argument("--exclude", default="",
                   help="NOT terms: drop docs containing any of these")
    q.add_argument("--syntax", action="store_true",
                   help="treat --query as freeform query syntax "
                        '("phrase", a AND b, a NEAR/3 b, -term, lang:xx); '
                        "overrides --mode/--lang/--slop/--exclude")
    q.add_argument("--export", choices=["csv", "json"],
                   help="also write results via the export sinks")
    q.add_argument("--out", help="export directory (required with --export)")
    m = sub.add_parser("merge", help="sort-merge index segments")
    m.add_argument("--segments", nargs="+", required=True)
    m.add_argument("--out", required=True)
    s = sub.add_parser("serve", help="always-on HTTP BM25 daemon (no Spark)")
    s.add_argument("--index", help="one built index dir")
    s.add_argument("--segments", nargs="+",
                   help="live tier set (oldest first) instead of --index")
    s.add_argument("--host", default="0.0.0.0")
    s.add_argument("--port", type=int, default=8765)
    s.add_argument("--corpus", help="source corpus table path; enables "
                                    '{"snippets": true} on /search')
    args = p.parse_args()

    if args.cmd == "serve":
        if bool(args.index) == bool(args.segments):
            p.error("serve needs exactly one of --index / --segments")
        from horus_ner_spark.daemon import ServeDaemon

        d = ServeDaemon(
            args.index or args.segments, host=args.host, port=args.port,
            corpus=args.corpus,
        ).start()
        print(json.dumps({"cmd": "serve", "host": d.host, "port": d.port,
                          "n_docs": d.server.n_docs}), flush=True)
        try:
            while True:
                time.sleep(3600)
        except KeyboardInterrupt:
            d.shutdown()
        return

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.getOrCreate()  # all conf from spark-submit
    spark.sparkContext.setLogLevel("ERROR")

    from horus_ner_spark.index.build import IndexPaths, build_index
    from horus_ner_spark.index.manifest import Manifest
    from horus_ner_spark.index.merge import merge_indexes
    from horus_ner_spark.index.query import bm25_wand

    t0 = time.perf_counter()
    if args.cmd == "build":
        paths = build_index(spark, args.corpus, args.index)
        totals = {
            s: (Manifest(args.index).read_stage(s) or {}).get("totals", {})
            for s in ("docs", "tf", "stats", "term_stats", "postings")
        }
        print(json.dumps({
            "cmd": "build", "index": paths.root,
            "elapsed_s": round(time.perf_counter() - t0, 3), "totals": totals,
        }))
    elif args.cmd == "query":
        if args.syntax:
            from horus_ner_spark.index.qsyntax import parse_query

            pq = parse_query(args.query, default_lang=args.lang,
                             default_slop=args.slop)
            if pq.mode != "BOOL" and pq.filters:
                # loud, not silent: the flat bulk kernels have no
                # metadata-filter path (serve and bm25_bool do)
                p.error(
                    "repo:/path: filters on the bulk CLI need a "
                    "parenthesized boolean query (routed via bm25_bool) "
                    "or the serve daemon"
                )
            qdict = {"query_id": 0, "query_text": pq.query_text,
                     "lang": pq.lang, "k": args.k, "mode": pq.mode,
                     "slop": pq.slop, "exclude": pq.exclude}
        else:
            qdict = {"query_id": 0, "query_text": args.query,
                     "lang": args.lang, "k": args.k, "mode": args.mode,
                     "slop": args.slop, "exclude": args.exclude}
        if qdict["mode"] == "BOOL":
            # parenthesized boolean query -> the set-algebra bulk twin
            # (bm25_wand rejects mode=BOOL loudly; this is its router)
            from horus_ner_spark.index.query import bm25_bool

            rdf = bm25_bool(
                spark, IndexPaths(args.index), qdict["query_text"],
                qdict["lang"], qdict["k"],
                filters=dict(pq.filters) or None,
            ).selectExpr("0 as query_id", "rank", "doc_id", "score")
        else:
            if "*" in qdict["query_text"] or "*" in (qdict.get("exclude") or ""):
                # prefix wildcards: expand against the term dictionary
                # before the bulk path (which tokenizes, and tokenizing
                # strips '*')
                from horus_ner_spark.index.query import rewrite_prefix_queries

                [qdict] = rewrite_prefix_queries(
                    spark, IndexPaths(args.index), [qdict]
                )
            rdf = bm25_wand(spark, IndexPaths(args.index), [qdict])
        res = rdf.collect()  # single execution; export re-uses the rows
        if args.export:
            if not args.out:
                p.error("--export requires --out")
            from horus_ner_spark.sources.feature_csv import (
                write_csv_export,
                write_json_export,
            )

            out_df = spark.createDataFrame(res, rdf.schema)
            if args.export == "csv":
                write_csv_export(out_df, args.out)
            else:
                write_json_export(out_df, args.out)
        for r in res:
            print(json.dumps({"rank": r["rank"], "doc_id": r["doc_id"], "score": r["score"]}))
        print(json.dumps({
            "cmd": "query", "mode": qdict["mode"], "n_results": len(res),
            "export": args.export, "out": args.out,
            "elapsed_s": round(time.perf_counter() - t0, 3),
        }))
    else:
        out = merge_indexes(spark, [IndexPaths(s) for s in args.segments], args.out)
        print(json.dumps({
            "cmd": "merge", "out": out.root, "n_segments": len(args.segments),
            "elapsed_s": round(time.perf_counter() - t0, 3),
        }))
    spark.stop()


if __name__ == "__main__":
    main()
