"""Serve daemon e2e: HTTP answers over a built index are identical to the
library surface; latency accounting works; errors don't kill the daemon."""

import json
import urllib.error
import urllib.request

import pytest

from horus_ner_spark.corpus import query_set
from horus_ner_spark.daemon import ServeDaemon
from horus_ner_spark.index.serve import IndexServer


def _post(port, path, obj):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=30) as r:
        return r.status, json.loads(r.read())


def _get(port, path):
    with urllib.request.urlopen(
        f"http://127.0.0.1:{port}{path}", timeout=30
    ) as r:
        return r.status, json.loads(r.read())


def test_daemon_matches_library_and_tracks_latency(spark, sf001_index):
    _cp, paths = sf001_index
    daemon = ServeDaemon(paths.root).start()
    try:
        lib = IndexServer(paths.root)
        qs = query_set()
        for q in qs[:4]:
            code, resp = _post(
                daemon.port, "/search",
                {"query_text": q["query_text"], "lang": q["lang"],
                 "k": q["k"]},
            )
            assert code == 200
            want = [
                {"rank": int(r.rank), "doc_id": int(r.doc_id),
                 "score": float(r.score)}
                for r in lib.search(
                    q["query_text"], q["lang"], q["k"]
                ).itertuples()
            ]
            assert resp["results"] == want
            assert resp["latency_ms"] > 0
        # batch surface
        code, resp = _post(daemon.port, "/search_batch", {"queries": qs})
        assert code == 200 and len(resp["results"]) > 0
        # phrase mode through HTTP
        code, resp = _post(
            daemon.port, "/search",
            {"query_text": "parse_config", "lang": "python", "k": 5,
             "mode": "PHRASE"},
        )
        assert code == 200
        # unknown path surfaces a 404 without killing the daemon
        with pytest.raises(urllib.error.HTTPError) as exc:
            _post(daemon.port, "/nope", {})
        assert exc.value.code == 404
        # stats: p50/p99 over everything served so far
        code, stats = _get(daemon.port, "/stats")
        assert code == 200
        assert stats["queries_served"] == 6
        assert stats["n_docs"] == daemon.server.n_docs > 0
        assert 0 < stats["p50_ms"] <= stats["p99_ms"]
    finally:
        daemon.shutdown()
    # post-shutdown the summary is still readable
    assert daemon.latency_summary()["queries_served"] >= 6


def test_daemon_result_cache_single_flight(spark, sf001_index):
    """Round-4 serving feature: /search runs through a single-flight LRU
    request cache — repeats are hits with identical payloads, concurrent
    duplicates coalesce onto one kernel pass, and a failing query neither
    poisons the cache nor kills the daemon."""
    import threading

    _cp, paths = sf001_index
    daemon = ServeDaemon(paths.root).start()
    try:
        q = {"query_text": "parse config file", "lang": "python", "k": 5}
        _code, first = _post(daemon.port, "/search", q)
        _code, second = _post(daemon.port, "/search", q)
        assert second["results"] == first["results"]
        _code, stats = _get(daemon.port, "/stats")
        assert stats["result_cache_hits"] >= 1
        assert stats["result_cache_misses"] == 1
        # different k = different key = a real kernel pass
        _code, smaller = _post(daemon.port, "/search", {**q, "k": 2})
        assert smaller["results"] == first["results"][:2]
        _code, stats = _get(daemon.port, "/stats")
        assert stats["result_cache_misses"] == 2

        # concurrent duplicates of a FRESH key: one leader computes, the
        # rest wait on it — misses for the key advance by exactly 1
        fresh = {"query_text": "tokenize stream", "lang": "python", "k": 7}
        results, errs = [], []

        def hit():
            try:
                results.append(_post(daemon.port, "/search", fresh)[1])
            except Exception as exc:  # pragma: no cover - surfaced below
                errs.append(exc)

        threads = [threading.Thread(target=hit) for _ in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errs and len(results) == 8
        assert all(r["results"] == results[0]["results"] for r in results)
        _code, stats = _get(daemon.port, "/stats")
        assert stats["result_cache_misses"] == 3  # fresh key computed once
        assert stats["result_cache_hit_rate"] > 0.5

        # failure path: bad mode is a 400 every time (never cached as a
        # result), and the daemon keeps serving afterwards
        for _ in range(2):
            with pytest.raises(urllib.error.HTTPError) as exc:
                _post(daemon.port, "/search", {**q, "mode": "NOPE"})
            assert exc.value.code == 400
        _code, alive = _post(daemon.port, "/search", q)
        assert alive["results"] == first["results"]
    finally:
        daemon.shutdown()


def test_submit_job_serve_subcommand(spark, sf001_index):
    """CLI lifecycle surface: `submit_job.py serve` starts the daemon
    (Spark-free), prints its JSON banner, and answers HTTP queries."""
    import os
    import subprocess
    import sys
    import time

    _cp, paths = sf001_index
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.Popen(
        [sys.executable, os.path.join(repo, "submit_job.py"),
         "serve", "--index", paths.root, "--host", "127.0.0.1", "--port", "0"],
        stdout=subprocess.PIPE, text=True, cwd=repo,
    )
    try:
        banner = json.loads(proc.stdout.readline())
        assert banner["cmd"] == "serve" and banner["n_docs"] > 0
        deadline = time.monotonic() + 30
        while True:
            try:
                code, resp = _post(
                    banner["port"], "/search",
                    {"query_text": "parse config", "lang": "python", "k": 5},
                )
                break
            except OSError:
                if time.monotonic() > deadline:
                    raise
                time.sleep(0.2)
        assert code == 200 and len(resp["results"]) > 0
    finally:
        proc.terminate()
        proc.wait(timeout=15)


def test_daemon_worker_pool_matches_inprocess(spark, sf001_index):
    """Round-4 serving scale-out: ``workers=N`` scores cache-missing
    /search requests on spawn-context worker processes (one IndexServer
    per worker, own GIL) — results must be byte-identical to the
    in-process kernel across modes, concurrent DISTINCT queries must all
    be served, and the request cache still works in front of the pool."""
    import threading

    _cp, paths = sf001_index
    pooled = ServeDaemon(paths.root, workers=2).start()
    inproc = ServeDaemon(paths.root).start()
    try:
        probes = [
            {"query_text": q["query_text"], "lang": q["lang"], "k": q["k"]}
            for q in query_set()[:3]
        ] + [
            {"query_text": "parse_config", "lang": "python", "k": 5,
             "mode": "PHRASE"},
            {"query_text": "parse config", "lang": "python", "k": 5,
             "mode": "NEAR", "slop": 4},
        ]
        for probe in probes:
            code_p, got = _post(pooled.port, "/search", probe)
            code_i, want = _post(inproc.port, "/search", probe)
            assert code_p == code_i == 200
            assert got["results"] == want["results"]

        # concurrent DISTINCT keys: no single-flight coalescing applies,
        # so every request is a real kernel pass — the pool must serve
        # all of them (in-process these serialize on the GIL)
        distinct = [
            {"query_text": f"stream batch {w}", "lang": "python", "k": 3}
            for w in ("iterator", "buffer", "codec", "merge",
                      "window", "schema", "filter", "join")
        ]
        results, errs = [], []

        def hit(p):
            try:
                results.append(_post(pooled.port, "/search", p))
            except Exception as exc:  # pragma: no cover - surfaced below
                errs.append(exc)

        threads = [threading.Thread(target=hit, args=(p,)) for p in distinct]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errs and len(results) == len(distinct)
        assert all(code == 200 for code, _ in results)

        _code, stats = _get(pooled.port, "/stats")
        assert stats["workers"] == 2
        # errors still surface as client 400s, not worker crashes
        with pytest.raises(urllib.error.HTTPError) as exc:
            _post(pooled.port, "/search", {"query_text": "x", "k": 5,
                                           "mode": "NOPE"})
        assert exc.value.code == 400
        _code, alive = _post(pooled.port, "/search", probes[0])
        assert alive["results"]  is not None
    finally:
        pooled.shutdown()
        inproc.shutdown()


def test_daemon_rejects_oversized_k(spark, sf001_index):
    """k is part of the cache key AND the retained payload, so an
    unbounded client-chosen k would let one client pin gigabytes in the
    LRU; the daemon rejects k outside [1, _MAX_K] with a 400 and keeps
    serving."""
    _cp, paths = sf001_index
    daemon = ServeDaemon(paths.root).start()
    try:
        q = {"query_text": "spark session", "lang": "python"}
        for bad_k in (0, -5, 10_000_000):
            with pytest.raises(urllib.error.HTTPError) as exc:
                _post(daemon.port, "/search", {**q, "k": bad_k})
            assert exc.value.code == 400
        code, ok = _post(daemon.port, "/search", {**q, "k": 1000})
        assert code == 200 and "results" in ok
    finally:
        daemon.shutdown()


def test_workers_auto_resolution(tmp_path, monkeypatch):
    """"auto" resolves to 0 below the size gate and min(cores, 8) above
    it — pure function, no daemon start needed."""
    import horus_ner_spark.daemon as dm

    small = tmp_path / "small_ix"
    small.mkdir()
    (small / "postings.parquet").write_bytes(b"x" * 1024)
    assert dm._resolve_workers("auto", str(small)) == 0
    assert dm._resolve_workers(0, str(small)) == 0
    assert dm._resolve_workers(4, str(small)) == 4

    monkeypatch.setattr(dm, "_AUTO_POOL_MIN_BYTES", 512)
    import os

    want = min(os.cpu_count() or 1, dm._AUTO_POOL_MAX_WORKERS)
    assert dm._resolve_workers("auto", str(small)) == want
    # segment-list form sums across directories
    assert dm._resolve_workers("auto", [str(small), str(small)]) == want


def test_daemon_auto_small_index_stays_inprocess(spark, sf001_index):
    """The sf0.001 index is far below the gate: auto must stay in-process
    (workers == 0) and answer identically to the explicit default."""
    _cp, paths = sf001_index
    daemon = ServeDaemon(paths.root, workers="auto").start()
    try:
        assert daemon.workers == 0 and daemon._pool is None
        code, resp = _post(
            daemon.port, "/search",
            {"query_text": "parse config", "lang": "python", "k": 5},
        )
        assert code == 200
        lib = IndexServer(paths.root)
        want = [
            {"rank": int(r.rank), "doc_id": int(r.doc_id),
             "score": float(r.score)}
            for r in lib.search("parse config", "python", 5).itertuples()
        ]
        assert resp["results"] == want and len(want) > 0
    finally:
        daemon.shutdown()
