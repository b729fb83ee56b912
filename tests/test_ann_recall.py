"""IVF ANN quality: recall@10 of the k-means-centroid IVF path vs the exact
brute-force baseline, reported per query (SURVEY follow-up to the round-1
first-8-vectors quantizer stub)."""

from horus_ner_spark.ops.catalog_text import (
    ann_cosine_topk,
    ann_ivf_kmeans_topk,
    ann_ivf_topk,
)

SF_DIR = "/root/testdata/sf0.001"


def _topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["vec_id"])
    return out


def test_ivf_kmeans_recall_at_10(spark):
    exact = _topk_sets(ann_cosine_topk(spark, SF_DIR))
    learned = _topk_sets(ann_ivf_kmeans_topk(spark, SF_DIR))
    stub = _topk_sets(ann_ivf_topk(spark, SF_DIR))
    recalls = {}
    for qid, truth in exact.items():
        recalls[qid] = len(learned.get(qid, set()) & truth) / len(truth)
    mean_recall = sum(recalls.values()) / len(recalls)
    stub_recall = sum(
        len(stub.get(q, set()) & t) / len(t) for q, t in exact.items()
    ) / len(exact)
    print(f"recall@10 kmeans-IVF={mean_recall:.2f} stub-IVF={stub_recall:.2f}")
    # nprobe=2 of 8 cells scans ~25% of the collection; on isotropic
    # synthetic vectors that bounds recall well below 1.0 — require the
    # learned quantizer to be usable and no worse than the stub
    assert mean_recall >= 0.4, recalls
    assert mean_recall >= stub_recall - 0.15
