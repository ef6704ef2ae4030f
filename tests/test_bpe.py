"""Distributed BPE trainer/encoder vs a pure-Python Sennrich reference.

The reference implements the pinned contract exactly: codepoint symbols
+ terminal </w>, greedy left-to-right merge application, best pair =
(count DESC, left ASC, right ASC), stop below min_pair_count.
"""

from __future__ import annotations

import re
from collections import Counter

import pytest

from influxdb_iox_spark.pipeline.bpe import (
    END,
    bpe_encode,
    bpe_token_stats,
    train_bpe,
)


def _words(text):
    return [w for w in re.split(r"[^0-9a-zÀ-￿]+", text.lower()) if w]


def _ref_train(texts, n_merges, min_pair_count=2):
    freqs = Counter()
    for t in texts:
        freqs.update(_words(t))
    words = {w: list(w) + [END] for w in freqs}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for w, syms in words.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += freqs[w]
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_count:
            break
        (l, r) = best[0]
        merges.append((l, r))
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges, words


TEXTS = [
    "low lower lowest low low",
    "new newer newest new new new",
    "the newest lowest widest",
    "wide wider widest wide",
]


def test_trainer_matches_reference(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    want, _ = _ref_train(TEXTS, 12)
    got = train_bpe(df, n_merges=12)
    assert got == want
    assert len(got) > 4  # the corpus genuinely supports many merges


def test_trainer_stops_at_min_pair_count(spark):
    df = spark.createDataFrame(
        [(1, "ab cd ef")], "doc_id long, text string"
    )
    # Every pair occurs once: nothing reaches min_pair_count=2.
    assert train_bpe(df, n_merges=5) == []


def test_encode_matches_reference_segmentation(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    merges, ref_words = _ref_train(TEXTS, 12)
    enc = bpe_encode(df, merges).collect()
    by_doc: dict[int, list[str]] = {}
    for r in sorted(enc, key=lambda r: (r.doc_id, r.pos)):
        by_doc.setdefault(r.doc_id, []).append(r.piece)
        assert r.pos == len(by_doc[r.doc_id]) - 1  # dense 0-based positions
    for i, t in enumerate(TEXTS):
        want = [p for w in _words(t) for p in ref_words[w]]
        assert by_doc[i] == want, f"doc {i}"


def test_token_stats(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    merges, ref_words = _ref_train(TEXTS, 8)
    got = {r.doc_id: (r.n_words, r.n_pieces) for r in bpe_token_stats(df, merges).collect()}
    for i, t in enumerate(TEXTS):
        ws = _words(t)
        assert got[i] == (len(ws), sum(len(ref_words[w]) for w in ws))


def test_unicode_words_segment_by_codepoint(spark):
    texts = ["中文 中文 中文字", "中文 字典 字典"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    want, ref_words = _ref_train(texts, 4)
    got = train_bpe(df, n_merges=4)
    assert got == want
    enc = bpe_encode(df, got).collect()
    pieces0 = [r.piece for r in sorted(enc, key=lambda r: (r.doc_id, r.pos)) if r.doc_id == 0]
    assert pieces0 == [p for w in _words(texts[0]) for p in ref_words[w]]


def test_validation(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        train_bpe(df, n_merges=0)
    with pytest.raises(ValueError):
        train_bpe(df, n_merges=1, min_pair_count=0)


def test_randomized_corpora_match_reference(spark):
    """Seeded-random sweep: small-alphabet corpora make merge ties and
    overlapping pairs (aa,aa in aaaa) common — exactly where greedy
    application and tie-breaking can drift from the reference."""
    import random

    for seed in (0, 1, 2):
        rng = random.Random(seed)
        texts = [
            " ".join(
                "".join(rng.choice("ab") for _ in range(rng.randrange(1, 7)))
                for _ in range(rng.randrange(1, 12))
            )
            for _ in range(rng.randrange(2, 6))
        ]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        want_merges, ref_words = _ref_train(texts, 8)
        got = train_bpe(df, n_merges=8)
        assert got == want_merges, f"seed={seed} texts={texts}"
        enc = bpe_encode(df, got).collect()
        by_doc = {}
        for r in sorted(enc, key=lambda r: (r.doc_id, r.pos)):
            by_doc.setdefault(r.doc_id, []).append(r.piece)
        for i, t in enumerate(texts):
            want = [p for w in _words(t) for p in ref_words[w]]
            assert by_doc.get(i, []) == want, f"seed={seed} doc={i}"


def test_incremental_matches_recount_path(spark):
    """The round-13 incremental-delta trainer must produce the IDENTICAL
    merge list as the recount-every-round twin — including on
    overlap-heavy small-alphabet corpora where neighbor-patching
    shortcuts go wrong (the diff-whole-words delta must not).  Also
    exercised with min_pair_count=1 (train-to-exhaustion) and with a
    checkpoint cadence of 1."""
    import random

    for seed in (0, 1, 2, 3):
        rng = random.Random(100 + seed)
        texts = [
            " ".join(
                "".join(rng.choice("abc") for _ in range(rng.randrange(1, 8)))
                for _ in range(rng.randrange(1, 10))
            )
            for _ in range(rng.randrange(2, 6))
        ]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        mpc = 1 if seed % 2 else 2
        inc = train_bpe(
            df, n_merges=12, min_pair_count=mpc, checkpoint_every=1
        )
        rec = train_bpe(
            df, n_merges=12, min_pair_count=mpc, incremental=False
        )
        assert inc == rec, f"seed={seed} texts={texts}"


def test_incremental_matches_recount_batched(spark):
    """batch_k>1 under the incremental counts: same symbol-disjoint
    selection semantics as the recount path on a corpus where the
    count table is deep enough that both see the same candidates."""
    df = spark.createDataFrame(
        [(0, "low lower lowest low low new newer newest new" )],
        "doc_id long, text string",
    )
    inc = train_bpe(df, n_merges=10, batch_k=3)
    rec = train_bpe(df, n_merges=10, batch_k=3, incremental=False)
    assert inc == rec


def test_gate_query_matches_reference_on_real_testdata(spark):
    """doc_bpe_token_stats is the suite's one rows-only driver row (the
    iterative trainer is non-SQL-expressible); this pins the exact gate
    shape — train 24 merges on even-id docs, stats over all — against
    the pure-Python reference on the real sf0.001 corpus."""
    import __spark_entry__ as E
    import duckdb

    sf = "/root/testdata/sf0.001"
    got = {
        r.doc_id: (r.n_words, r.n_pieces)
        for r in E.queries()["doc_bpe_token_stats"](spark, sf).collect()
    }
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf}/documents.parquet'"
    ).fetchall()
    texts = {i: t for i, t in rows}
    merges, ref_words = _ref_train(
        [t for i, t in texts.items() if i % 2 == 0], 24
    )
    # Re-segment ALL docs' words under the learned merges.
    def seg(w):
        syms = list(w) + [END]
        for (l, r) in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    want = {}
    for i, t in texts.items():
        ws = _words(t)
        if ws:
            want[i] = (len(ws), sum(len(seg(w)) for w in ws))
    assert got == want


def test_save_load_round_trip(spark, tmp_path):
    from influxdb_iox_spark.pipeline.bpe import load_bpe, save_bpe

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    merges = train_bpe(df, n_merges=8)
    save_bpe(merges, str(tmp_path / "tok"))
    assert load_bpe(str(tmp_path / "tok")) == merges


def test_batched_trainer(spark):
    """batch_k>1 (the opt-in fast trainer): symbol-disjoint merges per
    round.  Where no cross-pair interference is possible the batched
    result EQUALS exact training; where merges interact it may reorder
    (the documented divergence) but must stay deterministic, respect
    n_merges, and produce merges the encoder can apply."""
    # Single repeated word: each round has exactly one viable pair, so
    # batched == exact regardless of k.
    solo = spark.createDataFrame([(1, "ab ab ab")], "doc_id long, text string")
    assert train_bpe(solo, n_merges=2, batch_k=4) == train_bpe(solo, n_merges=2)

    texts = ["aa aa aa bb bb bb cc cc dd dd", "aa bb cc dd ee ff"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    fast = train_bpe(df, n_merges=4, batch_k=4)
    assert fast == train_bpe(df, n_merges=4, batch_k=4)  # deterministic
    assert len(fast) == 4
    # The learned merges drive the encoder without error and reduce the
    # piece count versus raw characters.
    stats = {r.doc_id: r.n_pieces for r in bpe_token_stats(df, fast).collect()}
    raw = {r.doc_id: r.n_pieces for r in bpe_token_stats(df, []).collect()}
    assert all(stats[i] < raw[i] for i in stats)
    # Batched still respects n_merges and validates batch_k.
    assert len(train_bpe(df, n_merges=2, batch_k=8)) == 2
    with pytest.raises(ValueError):
        train_bpe(df, n_merges=2, batch_k=0)
