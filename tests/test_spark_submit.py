"""Real spark-submit --py-files launch (north-rule launch mode): build an
index then query it, each in a fresh spark-submit JVM, with the package
shipped ONLY via --py-files (cwd pointed away from the repo so nothing
resolves by accident)."""

import json
import os
import subprocess
import sys

import pytest

from horus_ner_spark.corpus import gen_corpus_pandas
from horus_ner_spark.session import build_package_zip

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT), reason="no spark-submit")
def test_spark_submit_build_then_query(tmp_path):
    corpus = tmp_path / "corpus.parquet"
    gen_corpus_pandas(sf=0.001).iloc[:200].to_parquet(corpus, index=False)
    pyz = build_package_zip(str(tmp_path / "pkg.zip"))
    env = {**os.environ, "PYSPARK_PYTHON": sys.executable,
           "PYSPARK_DRIVER_PYTHON": sys.executable}

    def submit(*job_args):
        out = subprocess.run(
            [SPARK_SUBMIT, "--master", "local[4]", "--py-files", pyz,
             "--conf", "spark.ui.enabled=false",
             "--conf", "spark.sql.shuffle.partitions=4",
             os.path.join(REPO, "submit_job.py"), *job_args],
            capture_output=True, text=True, timeout=420, cwd=str(tmp_path), env=env,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        return [json.loads(l) for l in out.stdout.splitlines()
                if l.startswith("{")]

    built = submit("build", "--corpus", str(corpus), "--index", str(tmp_path / "ix"))
    assert built[-1]["cmd"] == "build"
    assert built[-1]["totals"]["postings"]["postings_emitted"] > 0

    res = submit("query", "--index", str(tmp_path / "ix"),
                 "--query", "parseConfig", "--lang", "python")
    assert res[-1]["cmd"] == "query" and res[-1]["n_results"] > 0
    assert res[0]["rank"] == 1 and isinstance(res[0]["doc_id"], int)


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT), reason="no spark-submit")
def test_spark_submit_phrase_query_with_csv_export(tmp_path):
    corpus = tmp_path / "corpus.parquet"
    gen_corpus_pandas(sf=0.001).iloc[:200].to_parquet(corpus, index=False)
    pyz = build_package_zip(str(tmp_path / "pkg.zip"))
    env = {**os.environ, "PYSPARK_PYTHON": sys.executable,
           "PYSPARK_DRIVER_PYTHON": sys.executable}

    def submit(*job_args):
        out = subprocess.run(
            [SPARK_SUBMIT, "--master", "local[4]", "--py-files", pyz,
             "--conf", "spark.ui.enabled=false",
             "--conf", "spark.sql.shuffle.partitions=4",
             os.path.join(REPO, "submit_job.py"), *job_args],
            capture_output=True, text=True, timeout=420, cwd=str(tmp_path), env=env,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        return [json.loads(l) for l in out.stdout.splitlines()
                if l.startswith("{")]

    submit("build", "--corpus", str(corpus), "--index", str(tmp_path / "ix"))
    res = submit("query", "--index", str(tmp_path / "ix"),
                 "--query", "parse_config", "--lang", "python",
                 "--mode", "PHRASE", "--export", "csv",
                 "--out", str(tmp_path / "res_csv"))
    assert res[-1]["mode"] == "PHRASE" and res[-1]["export"] == "csv"
    # exported CSV re-reads to exactly the printed rows
    import glob

    files = glob.glob(str(tmp_path / "res_csv" / "*.csv"))
    assert files
    lines = []
    for f in files:
        with open(f) as fh:
            lines.extend(fh.read().splitlines())
    header = "query_id,rank,doc_id,score"
    assert header in lines
    data = [l for l in lines if l and l != header]
    assert len(data) == res[-1]["n_results"]


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT), reason="no spark-submit")
def test_spark_submit_bool_query_syntax(tmp_path):
    """CLI --syntax with a parenthesized boolean query routes through
    bm25_bool (bm25_wand rejects mode=BOOL loudly)."""
    corpus = tmp_path / "corpus.parquet"
    gen_corpus_pandas(sf=0.001).iloc[:200].to_parquet(corpus, index=False)
    pyz = build_package_zip(str(tmp_path / "pkg.zip"))
    env = {**os.environ, "PYSPARK_PYTHON": sys.executable,
           "PYSPARK_DRIVER_PYTHON": sys.executable}

    def submit(*job_args):
        out = subprocess.run(
            [SPARK_SUBMIT, "--master", "local[4]", "--py-files", pyz,
             "--conf", "spark.ui.enabled=false",
             "--conf", "spark.sql.shuffle.partitions=4",
             os.path.join(REPO, "submit_job.py"), *job_args],
            capture_output=True, text=True, timeout=420, cwd=str(tmp_path),
            env=env,
        )
        return out

    out = submit("build", "--corpus", str(corpus),
                 "--index", str(tmp_path / "ix"))
    assert out.returncode == 0, out.stderr[-2000:]

    out = submit("query", "--index", str(tmp_path / "ix"),
                 "--query", "(cache OR buffer) AND NOT mutex", "--syntax")
    assert out.returncode == 0, out.stderr[-2000:]
    rows = [json.loads(l) for l in out.stdout.splitlines()
            if l.startswith("{")]
    assert rows[-1]["cmd"] == "query" and rows[-1]["mode"] == "BOOL"
    assert rows[-1]["n_results"] > 0 and rows[0]["rank"] == 1

    # filters on a flat bulk query: loud argparse error, not silent OR
    out = submit("query", "--index", str(tmp_path / "ix"),
                 "--query", "repo:org1/proj1 cache", "--syntax")
    assert out.returncode != 0
    assert "boolean" in (out.stderr or "") or "boolean" in (out.stdout or "")
