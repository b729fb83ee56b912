#!/usr/bin/env python
"""One-off: measure WAND decoded-postings ratio (sub-range vs block-max)
on a fresh index at BENCH_CORPUS_SF over the reference query set + hot-3.
Same counting logic as bench.py's wand_decode block."""
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CORPUS_SF = float(os.environ.get("BENCH_CORPUS_SF", "0.1"))


def main():
    from horus_ner_spark.corpus import query_set, write_corpus
    from horus_ner_spark.functions.tokenizer import tokenize
    from horus_ner_spark.index.build import build_index
    from horus_ner_spark.index.query import (
        _SUB_COLS, _wand_one_query, DECODE_STATS, read_corpus_stats,
    )
    from horus_ner_spark.index.serve import IndexServer
    from horus_ner_spark.session import get_spark

    spark = get_spark("decode-ratio", cores="16", shuffle_partitions=16)
    work = f"/tmp/horus_ratio_sf{CORPUS_SF}"
    shutil.rmtree(work, ignore_errors=True)
    corpus_path = write_corpus(spark, work, sf=CORPUS_SF)
    paths = build_index(spark, corpus_path, f"{work}/ix")
    server = IndexServer(paths.root)

    stats_row = read_corpus_stats(paths)
    n_docs_i, avgdl_f = int(stats_row["n_docs"]), float(stats_row["avgdl"])
    kernel_cols = [
        "term", "min_doc_id", "max_doc_id", "n_postings",
        "block_max_tfnorm", "doc_ids_vb", "tfs_vb", "doclens_vb",
        "sub_min_doc_ids", "sub_max_tfnorms",
    ]
    top3 = [
        r["term"]
        for r in spark.read.parquet(paths.term_stats)
        .orderBy("df", ascending=False).limit(3).collect()
    ]
    term_sets = [sorted(set(top3))] + [
        ts for q in query_set()
        if (ts := sorted(set(tokenize(q["query_text"], q.get("lang", "python")))))
    ]
    total_post = dec_sub = dec_blk = 0
    for terms in term_sets:
        dfs, blocks = server._fetch(terms, kernel_cols)
        tb = {t: blocks[blocks["term"] == t]
              for t in terms if (blocks["term"] == t).any()}
        if not tb:
            continue
        total_post += sum(int(b["n_postings"].sum()) for b in tb.values())
        DECODE_STATS.update(blocks=0, postings=0)
        _wand_one_query(tb, dfs, 10, n_docs_i, avgdl_f)
        dec_sub += DECODE_STATS["postings"]
        stripped = {t: b.drop(columns=list(_SUB_COLS)) for t, b in tb.items()}
        DECODE_STATS.update(blocks=0, postings=0)
        _wand_one_query(stripped, dfs, 10, n_docs_i, avgdl_f)
        dec_blk += DECODE_STATS["postings"]
    print({
        "total_postings": total_post,
        "decoded_subblock": dec_sub,
        "decoded_blockmax": dec_blk,
        "ratio_subblock": round(dec_sub / total_post, 4),
        "ratio_blockmax": round(dec_blk / total_post, 4),
    })
    spark.stop()


if __name__ == "__main__":
    main()
