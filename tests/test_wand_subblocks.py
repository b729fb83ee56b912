"""Layout v6 impact-isolating sub-range metadata: WAND stays
rank-identical while decoding strictly fewer postings than with
block-granular maxima alone (round-3 verdict #3, tightened in round 4 —
variable-count ranges whose boundaries isolate the top-impact postings;
range maxima are derived in the kernel, not stored).

Pure-kernel test: posting blocks are synthesized through the real
encode_run (the same function the build/merge/prune pipelines call), so
the sub_* columns here are exactly what a v6 index stores.
"""

import numpy as np
import pandas as pd

from horus_ner_spark.index.build import SUB_BLOCKS_MAX, encode_run
from horus_ner_spark.index.query import (
    _SUB_COLS,
    DECODE_STATS,
    _exhaustive_one_query,
    _wand_one_query,
)


def _mk_blocks(term: str, n: int, seed: int, spike_every: int) -> pd.DataFrame:
    rng = np.random.RandomState(seed)
    ids = np.unique(
        rng.randint(0, np.int64(1) << 62, size=2 * n, dtype=np.int64)
    )
    doc_ids = np.sort(ids[:n])
    assert len(doc_ids) == n
    tfs = rng.randint(1, 4, size=n).astype(np.int64)
    # sparse high-impact spikes: a block-granular max is poisoned by one
    # spike per 128 postings; sub-granular maxima stay tight elsewhere
    tfs[rng.randint(0, spike_every, size=n) == 0] = 60
    doclens = rng.randint(50, 500, size=n).astype(np.int64)
    rows = encode_run(
        term, 0, doc_ids, tfs, doclens,
        b"", np.zeros(n + 1, dtype=np.int64), avgdl=200.0, block_size=128,
    )
    return pd.DataFrame(rows)


def test_encode_run_empty_run_yields_no_blocks():
    # an empty posting run (prune with keep_fraction=0 dropping a whole
    # term) must yield zero blocks, not crash the v6 sub-range kernel's
    # concatenation (regression: post-v6 review finding)
    e = np.empty(0, dtype=np.int64)
    rows = encode_run(
        "gone", 0, e, e, e,
        b"", np.zeros(1, dtype=np.int64), avgdl=200.0, block_size=128,
    )
    assert rows == []


def test_subblock_metadata_shape():
    b = _mk_blocks("t", 300, seed=1, spike_every=50)
    assert all(
        1 <= len(x) <= SUB_BLOCKS_MAX for x in b["sub_min_doc_ids"]
    )
    # full 128-posting blocks spend most of the budget (16 ranges minus
    # boundary collisions between isolation cuts and the grid)
    full = b[b["n_postings"] == 128]
    assert (full["sub_min_doc_ids"].map(len) >= SUB_BLOCKS_MAX - 4).all()
    for _, r in b.iterrows():
        mins = list(r["sub_min_doc_ids"])
        assert mins[0] == r["min_doc_id"]
        assert mins[-1] <= r["max_doc_id"]
        assert mins == sorted(set(mins))  # strictly increasing
        assert max(r["sub_max_tfnorms"]) == r["block_max_tfnorm"]
        # v6 stores no range maxima: the kernel derives them from
        # sub_min + the block max (ranges tile the block span)
        assert "sub_max_doc_ids" not in b.columns
        # the isolated top-impact posting is a single-posting range:
        # its bound equals the block max while its neighbours' bounds
        # stay strictly below (the whole point of isolation)
        tfns = list(r["sub_max_tfnorms"])
        if len(tfns) >= SUB_BLOCKS_MAX - 4:
            j = tfns.index(max(tfns))
            others = tfns[:j] + tfns[j + 1:]
            assert max(others) < r["block_max_tfnorm"] or (
                tfns.count(r["block_max_tfnorm"]) > 1  # tied spikes
            )


def _run_both(blocks, term_df, k, n_docs, avgdl):
    """(results, decoded postings) with sub metadata vs stripped to
    block-granular metadata."""
    DECODE_STATS.update(blocks=0, postings=0)
    got_sub = _wand_one_query(blocks, term_df, k, n_docs, avgdl)
    dec_sub = DECODE_STATS["postings"]
    stripped = {t: b.drop(columns=list(_SUB_COLS)) for t, b in blocks.items()}
    DECODE_STATS.update(blocks=0, postings=0)
    got_blk = _wand_one_query(stripped, term_df, k, n_docs, avgdl)
    dec_blk = DECODE_STATS["postings"]
    return got_sub, dec_sub, got_blk, dec_blk


def test_wand_subblocks_rank_identical_two_terms():
    blocks = {
        "alpha": _mk_blocks("alpha", 20_000, seed=7, spike_every=100),
        "beta": _mk_blocks("beta", 3_000, seed=8, spike_every=100),
    }
    term_df = {t: int(b["n_postings"].sum()) for t, b in blocks.items()}
    truth = _exhaustive_one_query(blocks, term_df, 10, 2_000_000, 200.0)
    got_sub, dec_sub, got_blk, dec_blk = _run_both(
        blocks, term_df, 10, 2_000_000, 200.0
    )
    assert got_sub == truth == got_blk
    assert dec_sub <= dec_blk


def test_wand_virtual_cursor_skips_decode_hot_list():
    """Top-k over one hot list: failed-bound skips must not decode the
    landing block (the metadata sub/block mins are exact first-doc ids, so
    the cursor advances virtually) — decode count collapses to roughly the
    blocks whose bound beats the final threshold."""
    blocks = {"alpha": _mk_blocks("alpha", 50_000, seed=7, spike_every=100)}
    term_df = {"alpha": 50_000}
    truth = _exhaustive_one_query(blocks, term_df, 10, 2_000_000, 200.0)
    got_sub, dec_sub, got_blk, dec_blk = _run_both(
        blocks, term_df, 10, 2_000_000, 200.0
    )
    assert got_sub == truth == got_blk
    # with ~18% of blocks bounding above the final threshold, decoded
    # postings must be a small fraction of the list, on both layouts
    assert dec_blk < 0.3 * 50_000
    assert dec_sub <= dec_blk


def test_wand_subblocks_fewer_decodes_two_terms():
    """Rare-AND-hot query: the pivot stream comes from the rare term; the
    hot term's (sub-)bound decides decode-vs-skip at each pivot.  A block
    max is poisoned by one spike in its 128 postings, a sub max only by
    one in its 32 — sub-granular bounds must decode strictly less."""
    import pandas as pd

    from horus_ner_spark.index.codec import decode_block

    beta = _mk_blocks("beta", 50_000, seed=7, spike_every=100)
    bd = np.concatenate(
        [decode_block(bytes(d), bytes(t))[0]
         for d, t in zip(beta["doc_ids_vb"], beta["tfs_vb"])]
    )
    rng = np.random.RandomState(11)
    pick = np.sort(rng.choice(bd, size=1500, replace=False))
    # constant tf/doclen -> the rare term's bound is exactly its
    # contribution, so the skip decision isolates the hot term's bound
    ones = np.ones(1500, dtype=np.int64)
    alpha = pd.DataFrame(
        encode_run("alpha", 0, pick, ones, 200 * ones,
                   b"", np.zeros(1501, dtype=np.int64), 200.0, 128)
    )
    blocks = {"alpha": alpha, "beta": beta}
    term_df = {"alpha": 1500, "beta": 50_000}
    truth = _exhaustive_one_query(blocks, term_df, 10, 2_000_000, 200.0)
    got_sub, dec_sub, got_blk, dec_blk = _run_both(
        blocks, term_df, 10, 2_000_000, 200.0
    )
    assert got_sub == truth == got_blk
    # the whole point: sub-granular bounds decode strictly less
    assert dec_sub < dec_blk, (dec_sub, dec_blk)


def _mk_overlapping_blocks(trial: int):
    """Small seeded indexes over a SHARED doc pool: many cursor ties at
    tiny block_size, the shape that exposed the lazy-cursor skip-clamp
    livelock (clamping at a cursor TIED at the pivot forced one-doc_id
    steps while pending cursors re-parked at each fake bound)."""
    rng = np.random.RandomState(trial)
    pool = np.unique(
        rng.randint(0, np.int64(1) << 62, size=600, dtype=np.int64)
    )[:300]
    blocks = {}
    for t in range(5):
        n = rng.randint(20, 250)
        pick = np.sort(rng.choice(pool, size=min(n, len(pool)), replace=False))
        tfs = rng.randint(1, 6, size=len(pick)).astype(np.int64)
        dls = rng.randint(50, 500, size=len(pick)).astype(np.int64)
        blocks[f"t{t}"] = pd.DataFrame(encode_run(
            f"t{t}", 0, pick, tfs, dls,
            b"", np.zeros(len(pick) + 1, dtype=np.int64),
            avgdl=200.0, block_size=8,
        ))
    return blocks


def test_wand_no_livelock_on_tied_lazy_cursors():
    """Differential fuzz vs the exhaustive kernel.  Seeds 25/37/46/49
    livelocked before the skip clamp was moved to the first cursor
    STRICTLY past the pivot; a 20 s alarm turns any regression into a
    loud failure instead of a hung suite."""
    import signal

    def _boom(signum, frame):  # pragma: no cover - fires only on regression
        raise TimeoutError("WAND kernel livelocked (skip-clamp regression)")

    old = signal.signal(signal.SIGALRM, _boom)
    try:
        for trial in (25, 37, 46, 49, 86, 107, 154, 0, 1, 2, 3):
            blocks = _mk_overlapping_blocks(trial)
            term_df = {t: int(b["n_postings"].sum()) for t, b in blocks.items()}
            truth = _exhaustive_one_query(blocks, term_df, 3, 2_000_000, 200.0)
            signal.alarm(20)
            got = _wand_one_query(blocks, term_df, 3, 2_000_000, 200.0)
            signal.alarm(0)
            assert got == truth, f"trial {trial}"
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


def test_wand_wide_differential_fuzz():
    """Breadth fuzz vs the exhaustive kernel: negative doc_ids, 1-7 terms,
    k 1-25, block sizes 8-128, impact spikes, and exclude (stale-dup)
    sets.  300 trials of this generator ran clean offline; the committed
    subset keeps suite time bounded while pinning every parameter axis."""
    import signal

    from horus_ner_spark.index.query import _exhaustive_one_query

    def _boom(signum, frame):  # pragma: no cover - fires only on regression
        raise TimeoutError("WAND kernel hung in wide fuzz")

    old = signal.signal(signal.SIGALRM, _boom)
    try:
        for trial in range(50):
            rng = np.random.RandomState(10_000 + trial)
            bs = int(rng.choice([8, 16, 32, 128]))
            nterms = int(rng.randint(1, 8))
            k = int(rng.choice([1, 3, 10, 25]))
            pool = np.unique(rng.randint(
                -(np.int64(1) << 62), np.int64(1) << 62,
                size=rng.randint(50, 1200), dtype=np.int64,
            ))
            blocks, present = {}, []
            for t in range(nterms):
                n = int(rng.randint(5, max(6, len(pool))))
                pick = np.sort(
                    rng.choice(pool, size=min(n, len(pool)), replace=False)
                )
                tfs = rng.randint(1, 8, size=len(pick)).astype(np.int64)
                if rng.rand() < 0.3:
                    tfs[rng.randint(0, len(pick))] = 100
                dls = rng.randint(20, 800, size=len(pick)).astype(np.int64)
                blocks[f"t{t}"] = pd.DataFrame(encode_run(
                    f"t{t}", 0, pick, tfs, dls,
                    b"", np.zeros(len(pick) + 1, dtype=np.int64), 200.0, bs,
                ))
                present.append(pick)
            term_df = {
                t: int(b["n_postings"].sum()) for t, b in blocks.items()
            }
            exclude = None
            if rng.rand() < 0.5:
                allp = np.unique(np.concatenate(present))
                exclude = np.sort(rng.choice(
                    allp, size=min(len(allp), rng.randint(1, 30)),
                    replace=False,
                ))
            truth = _exhaustive_one_query(
                blocks, term_df, k, 2_000_000, 200.0, exclude=exclude
            )
            signal.alarm(15)
            got = _wand_one_query(
                blocks, term_df, k, 2_000_000, 200.0, exclude=exclude
            )
            signal.alarm(0)
            assert got == truth, f"trial {trial}"
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)
