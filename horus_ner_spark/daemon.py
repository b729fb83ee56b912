"""Always-on query daemon — the engine's third lifecycle surface.

The reference ships three entry points: batch feature extraction, model
training, and an always-on REST annotator that answers one request at a
time from pre-loaded state (reference: webservice/rest.py:16-21,47-61 — a
Flask app with one global extractor built at import).  The first two map
to build_index/submit_job; this module completes the map (SURVEY.md §3):
a thin HTTP front end over :class:`IndexServer`, stdlib-only
(ThreadingHTTPServer), holding the tiny corpus stats + LRU term cache in
process and reading only pruned postings per query.  ``/search`` results
are additionally served through a single-flight LRU request cache
(:class:`_ResultCache`): the index behind a daemon is immutable for its
lifetime, so hot repeated queries cost one scoring pass total, and
concurrent duplicates coalesce onto one leader instead of stampeding the
GIL-bound kernel.

Endpoints (JSON over HTTP):

- ``POST /search``  {"query_text": ..., "lang": "python", "k": 10,
  "mode": "OR"|"AND"|"PHRASE"|"NEAR", "slop": 8,
  "exclude": "noise terms", "positions": false,
  "snippets": false, "context": 1, "facets": ["lang", "repo"]} ->
  {"results": [{rank, doc_id, score}], "latency_ms": float,
  "facets": [{facet, value, n_docs}]? — counts over the FULL match
  set, OR/AND only}.
  Alternatively {"q": '<freeform>', "k": 10} with the minimal query
  syntax (``"exact phrase"``, ``a AND b``, ``a NEAR/3 b``,
  ``lang:python`` — see index/qsyntax.py); parsed to the same enum
  dispatch, rank-identical to the explicit form.
- ``POST /search_batch``  {"queries": [{query_id, query_text, lang, k}]}
  -> {"results": [...], "latency_ms": float}
- ``GET /stats`` -> corpus stats + served-query latency summary
  (count, p50_ms, p99_ms) — the numbers BENCH.md's serve section reports.

The daemon is deliberately a LIBRARY class (start()/shutdown(), ephemeral
port) so tests and deployments both drive it; ``python -m
horus_ner_spark.daemon <index_dir> [port]`` runs it standalone.  A fleet
of these processes against the same index files on shared storage is the
serving plane; Spark remains the build plane (serve.py's design note).
"""

from __future__ import annotations

import json
import threading
import time
from collections import OrderedDict, deque
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from horus_ner_spark.index.qsyntax import parse_query
from horus_ner_spark.index.serve import IndexServer

# one IndexServer per worker process (set by _worker_init under the
# ProcessPoolExecutor's spawn context; never used in the parent)
_WORKER_SRV: IndexServer | None = None


def _worker_init(index_dir) -> None:
    global _WORKER_SRV
    _WORKER_SRV = IndexServer(index_dir)


def _worker_search(qt: str, lang: str, k: int, mode: str, slop: int,
                   exclude: str = "", positions: bool = False,
                   filters: tuple = ()) -> list:
    return _WORKER_SRV.search(
        qt, lang, k, mode, slop=slop, exclude_text=exclude,
        with_positions=positions, filters=dict(filters) or None,
    ).to_dict(orient="records")


# workers="auto" gate: below this on-disk index size the in-process kernel
# answers cold misses in single-digit ms and spawn-pool IPC would only add
# overhead; above it, concurrent DISTINCT queries serialize on the GIL and
# the worker pool wins 4-7x (serve_pool_bench.py, BENCH.md)
_AUTO_POOL_MIN_BYTES = 64 << 20
_AUTO_POOL_MAX_WORKERS = 8


def _resolve_workers(workers, index_dir) -> int:
    """Resolve the ``workers`` ctor arg: an int passes through; ``"auto"``
    picks ``min(cores, 8)`` when the on-disk index exceeds the size gate,
    else 0 (in-process)."""
    if workers != "auto":
        return int(workers)
    import os

    total = 0
    dirs = index_dir if isinstance(index_dir, (list, tuple)) else [index_dir]
    for d in dirs:
        for root, _sub, files in os.walk(str(d)):
            for f in files:
                try:
                    total += os.path.getsize(os.path.join(root, f))
                except OSError:
                    pass
    if total < _AUTO_POOL_MIN_BYTES:
        return 0
    return min(os.cpu_count() or 1, _AUTO_POOL_MAX_WORKERS)

# latency window: enough for a faithful p99, bounded so an always-on
# daemon never grows memory with query count
_LAT_WINDOW = 100_000

# request-cache capacity: one daemon serves one immutable segment set, so
# a completed result never invalidates; the bound is purely memory
# (k <= _MAX_K rows per entry, enforced below — without the k bound a
# client-chosen k would control how many bytes each LRU entry pins)
_RESULT_CACHE_CAP = 4096

# serving-path bound on requested top-k: caps both per-request scoring
# work and the retained size of a cache entry
_MAX_K = 1000


class _ResultCache:
    """Single-flight LRU request cache over an immutable index.

    The daemon's IndexServer is constructed once over a fixed segment set
    and the index files never mutate underneath it (compaction writes NEW
    directories; a daemon is restarted to adopt them — serve.py's design
    note), so identical requests are pure and cacheable for the daemon's
    lifetime.  Two serving-scale behaviors, mirroring a search engine's
    shard request cache:

    - LRU over completed results: a hot query replayed by many clients is
      computed once, then served from memory.
    - single-flight (dogpile protection): concurrent requests for the SAME
      key while it is being computed wait on one leader instead of each
      burning a GIL-bound scoring pass.

    The cache lives at the HTTP layer, NOT in IndexServer, so library-mode
    latency measurements (bench serve_cold/serve_warm) keep measuring the
    scoring kernel itself.
    """

    def __init__(self, capacity: int = _RESULT_CACHE_CAP) -> None:
        self._cap = capacity
        self._lock = threading.Lock()
        self._done: OrderedDict[tuple, list] = OrderedDict()
        self._inflight: dict[tuple, threading.Event] = {}
        self.hits = 0
        self.misses = 0

    def get_or_compute(self, key: tuple, compute) -> list:
        while True:
            with self._lock:
                if key in self._done:
                    self.hits += 1
                    self._done.move_to_end(key)
                    return self._done[key]
                ev = self._inflight.get(key)
                if ev is None:
                    ev = self._inflight[key] = threading.Event()
                    self.misses += 1
                    break
            # another thread is computing this key: wait, then re-check
            # (the leader may have failed, in which case we take over)
            ev.wait()
        try:
            val = compute()
        except BaseException:
            with self._lock:
                self._inflight.pop(key, None)
            ev.set()  # wake waiters so one of them retries as leader
            raise
        with self._lock:
            self._done[key] = val
            while len(self._done) > self._cap:
                self._done.popitem(last=False)
            self._inflight.pop(key, None)
        ev.set()
        return val


def _percentile(sorted_vals: list[float], q: float) -> float:
    if not sorted_vals:
        return 0.0
    i = min(len(sorted_vals) - 1, max(0, round(q * (len(sorted_vals) - 1))))
    return sorted_vals[int(i)]


class ServeDaemon:
    """HTTP front end over one IndexServer (single dir or segment list)."""

    def __init__(
        self,
        index_dir: str | list[str],
        host: str = "127.0.0.1",
        port: int = 0,
        workers: int | str = 0,
        corpus: str | None = None,
    ) -> None:
        """``workers`` > 0 scores cache-missing ``/search`` requests on a
        pool of WORKER PROCESSES (spawn context), one IndexServer per
        worker over the same immutable index files.  The in-process kernel
        is GIL-bound, so a thread-per-request daemon serializes CONCURRENT
        DISTINCT queries no matter how many HTTP threads it has — the
        request cache only absorbs repeats.  Worker processes each own a
        GIL, giving real core-parallel cold-miss serving; the single-flight
        cache still coalesces duplicate keys onto one worker call.  The
        default 0 keeps everything in-process (tests, single-user CLI).

        Spawn (not fork) so a daemon hosted inside a Spark driver never
        forks py4j/JVM state; workers lazily re-import the package and
        mmap their own pyarrow readers.

        ``workers="auto"`` resolves via :func:`_resolve_workers`: 0 for a
        small index (in-process is faster than pool IPC), ``min(cores, 8)``
        once the on-disk index passes the size gate."""
        workers = _resolve_workers(workers, index_dir)
        self.server = IndexServer(index_dir)
        # corpus table path enables {"snippets": true} on /search; snippet
        # extraction is top-k-bounded so it runs in the parent process
        # even when a worker pool scores the query
        self.corpus = corpus
        self._pool = None
        if workers > 0:
            import multiprocessing as mp
            from concurrent.futures import ProcessPoolExecutor

            self._pool = ProcessPoolExecutor(
                max_workers=workers,
                mp_context=mp.get_context("spawn"),
                initializer=_worker_init,
                initargs=(index_dir,),
            )
        self.workers = workers
        self._latencies_ms: deque[float] = deque(maxlen=_LAT_WINDOW)
        self._served = 0
        self._lock = threading.Lock()
        self._results = _ResultCache()
        daemon = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet; latency is tracked instead
                pass

            def _reply(self, code: int, obj: dict) -> None:
                body = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path != "/stats":
                    return self._reply(404, {"error": "unknown path"})
                s = daemon.latency_summary()
                hits, misses = (
                    daemon.server.cache_hits, daemon.server.cache_misses
                )
                self._reply(
                    200,
                    {
                        "n_docs": daemon.server.n_docs,
                        "avgdl": daemon.server.avgdl,
                        "workers": daemon.workers,
                        "lru_hits": hits,
                        "lru_misses": misses,
                        "lru_hit_rate": round(hits / (hits + misses), 4)
                        if hits + misses
                        else 0.0,
                        "decoded_hits": daemon.server.decoded_hits,
                        "decoded_misses": daemon.server.decoded_misses,
                        "decoded_postings": daemon.server._decoded_postings,
                        "decoded_pos_postings": (
                            daemon.server._decoded_pos_postings
                        ),
                        "result_cache_hits": daemon._results.hits,
                        "result_cache_misses": daemon._results.misses,
                        "result_cache_hit_rate": round(
                            daemon._results.hits
                            / (daemon._results.hits + daemon._results.misses),
                            4,
                        )
                        if daemon._results.hits + daemon._results.misses
                        else 0.0,
                        **s,
                    },
                )

            def do_POST(self):
                n = int(self.headers.get("Content-Length") or 0)
                try:
                    req = json.loads(self.rfile.read(n) or b"{}")
                except json.JSONDecodeError:
                    return self._reply(400, {"error": "bad json"})
                t0 = time.monotonic()
                facet_rows = None
                try:
                    if self.path == "/search":
                        k = int(req.get("k", 10))
                        if not 1 <= k <= _MAX_K:
                            return self._reply(
                                400,
                                {"error": f"k must be in [1, {_MAX_K}]"},
                            )
                        if "q" in req:
                            # freeform syntax ("phrase", AND, NEAR/3,
                            # lang:) — parsed in the parent to the same
                            # enum dispatch, so cache keys and worker
                            # calls are identical to the explicit API
                            p = parse_query(
                                str(req["q"]),
                                default_lang=req.get("lang", "python"),
                                default_slop=int(req.get("slop", 8)),
                            )
                            qt, lang = p.query_text, p.lang
                            mode, slop = p.mode, p.slop
                            exclude = p.exclude
                            filters = p.filters
                        else:
                            qt = req.get("query_text", "")
                            lang = req.get("lang", "python")
                            mode = req.get("mode", "OR")
                            slop = int(req.get("slop", 8))
                            exclude = str(req.get("exclude", ""))
                            # {"filters": {"repo": ..., "path": ...}} —
                            # no str() coercion: a non-string value is a
                            # client error (400 via ValueError), never a
                            # silently-empty result
                            raw = req.get("filters") or {}
                            if not isinstance(raw, dict) or not all(
                                isinstance(c, str) and isinstance(v, str)
                                for c, v in raw.items()
                            ):
                                raise ValueError(
                                    "filters must be an object of "
                                    "string column -> string value"
                                )
                            filters = tuple(sorted(raw.items()))
                        positions = bool(req.get("positions", False))
                        if daemon._pool is not None:
                            compute = lambda: daemon._pool.submit(  # noqa: E731
                                _worker_search, qt, lang, k, mode, slop,
                                exclude, positions, filters,
                            ).result()
                        else:
                            compute = lambda: daemon.server.search(  # noqa: E731
                                qt, lang, k, mode, slop=slop,
                                exclude_text=exclude,
                                with_positions=positions,
                                filters=dict(filters) or None,
                            ).to_dict(orient="records")
                        records = daemon._results.get_or_compute(
                            (qt, lang, k, mode, slop, exclude, positions,
                             filters),
                            compute,
                        )
                        if req.get("snippets"):
                            if not daemon.corpus:
                                raise ValueError(
                                    "snippets need the daemon started "
                                    "with a corpus table path (--corpus)"
                                )
                            sn = daemon.server.snippets(
                                qt, [r["doc_id"] for r in records],
                                daemon.corpus, lang=lang,
                                context=int(req.get("context", 1)),
                            )
                            by_doc = {
                                int(s.doc_id): {
                                    "line_no": int(s.line_no),
                                    "n_query_terms": int(s.n_query_terms),
                                    "snippet": s.snippet,
                                }
                                for s in sn.itertuples()
                            }
                            records = [
                                {**r, **by_doc.get(int(r["doc_id"]), {})}
                                for r in records
                            ]
                        facet_by = req.get("facets")
                        if facet_by:
                            # facet counts over the FULL match set (not
                            # the k hits) — counted in the parent from
                            # in-memory doc-values; cached like results
                            # (pure function of the immutable index)
                            fkey = ("facets", qt, lang, mode, exclude,
                                    tuple(facet_by), filters)
                            facet_rows = daemon._results.get_or_compute(
                                fkey,
                                lambda: daemon.server.facets(
                                    qt, lang, mode=mode,
                                    by=tuple(facet_by),
                                    exclude_text=exclude,
                                    filters=dict(filters) or None,
                                ).to_dict(orient="records"),
                            )
                    elif self.path == "/search_batch":
                        # batch is the bulk surface; callers vary payloads,
                        # so it goes straight to the kernel uncached
                        records = daemon.server.search_batch(
                            req.get("queries", [])
                        ).to_dict(orient="records")
                    else:
                        return self._reply(404, {"error": "unknown path"})
                except (ValueError, FileNotFoundError, RuntimeError) as exc:
                    # client/operator error (bad mode/slop, fuzzy sidecar
                    # missing or stale): precise message, 400 — these
                    # carry no internal state beyond the index root the
                    # operator already knows
                    return self._reply(400, {"error": str(exc)})
                except Exception:  # surface generically, don't kill the
                    # daemon — and never echo internals to network peers
                    # (exception text can leak paths/config); full trace
                    # goes to the server log instead
                    import traceback

                    traceback.print_exc()
                    return self._reply(500, {"error": "internal error"})
                ms = (time.monotonic() - t0) * 1000.0
                with daemon._lock:
                    daemon._latencies_ms.append(ms)
                    daemon._served += 1
                resp = {
                    "results": records,
                    "latency_ms": round(ms, 3),
                }
                if facet_rows is not None:
                    resp["facets"] = facet_rows
                self._reply(200, resp)

        class Server(ThreadingHTTPServer):
            # default backlog (5) drops connections under concurrent load
            # now that cached answers return in microseconds — clients see
            # kernel RSTs once the accept queue overflows
            request_queue_size = 128

        self._httpd = Server((host, port), Handler)
        self.host, self.port = self._httpd.server_address[:2]
        self._thread: threading.Thread | None = None

    def start(self) -> "ServeDaemon":
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    def shutdown(self) -> None:
        self._httpd.shutdown()
        if self._thread is not None:
            self._thread.join(timeout=10)
        self._httpd.server_close()
        if self._pool is not None:
            self._pool.shutdown(wait=False, cancel_futures=True)

    def latency_summary(self) -> dict:
        """p50/p99 over the trailing latency window (bounded deque), plus
        the all-time served count."""
        with self._lock:
            lats = sorted(self._latencies_ms)
            served = self._served
        return {
            "queries_served": served,
            "p50_ms": _percentile(lats, 0.50),
            "p99_ms": _percentile(lats, 0.99),
        }


def main(argv: list[str]) -> None:
    """``python -m horus_ner_spark.daemon <index_dir> [port] [--host H]
    [--workers N]``.

    ``--workers`` defaults to ``auto``: a size-gated ``min(cores, 8)``
    worker pool for cold-miss parallelism on real indexes, in-process for
    small ones (``--workers 0`` forces in-process).

    Binds loopback by default — the daemon is unauthenticated, so exposing
    it must be an explicit operator decision (``--host 0.0.0.0``), never
    the default posture."""
    rest = list(argv)
    host = "127.0.0.1"
    if "--host" in rest:
        i = rest.index("--host")
        host = rest[i + 1]
        del rest[i : i + 2]
    workers: int | str = "auto"  # CLI default: size-gated pool
    if "--workers" in rest:
        i = rest.index("--workers")
        workers = int(rest[i + 1])
        del rest[i : i + 2]
    index_dir = rest[0]
    port = int(rest[1]) if len(rest) > 1 else 8765
    d = ServeDaemon(index_dir, host=host, port=port, workers=workers).start()
    print(
        f"serving {index_dir} on {host}:{d.port} (workers={d.workers})",
        flush=True,
    )
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        d.shutdown()


if __name__ == "__main__":
    import sys

    main(sys.argv[1:])
