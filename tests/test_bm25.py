"""BM25 retrieval (pipeline/search.py) vs a pure-Python reference."""

from __future__ import annotations

import math
import re

import pytest

from influxdb_iox_spark.pipeline.search import (
    N_BUCKETS,
    bm25_topk,
    build_bm25_index,
    load_bm25,
    save_bm25,
)


def _toks(text):
    return [t for t in re.split(r"[^0-9a-z]+", text.lower()) if t]


def _ref_bm25(docs, query, k1=1.2, b=0.75):
    toked = {i: _toks(t) for i, t in docs.items()}
    toked = {i: t for i, t in toked.items() if t}
    n = len(toked)
    avgdl = sum(len(t) for t in toked.values()) / n
    dfreq = {}
    for t in set(q for ts in toked.values() for q in ts):
        dfreq[t] = sum(1 for ts in toked.values() if t in ts)
    out = {}
    for i, ts in toked.items():
        s = 0.0
        for q in set(query):
            tf = ts.count(q)
            if not tf:
                continue
            idf = math.log(1 + (n - dfreq[q] + 0.5) / (dfreq[q] + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(ts) / avgdl))
        if s > 0:
            out[i] = round(s * 1e6) / 1e6
    return out


DOCS = {
    1: "the quick brown fox jumps over the lazy dog",
    2: "the dog barks at the other dog all night",
    3: "foxes are quick; dogs are lazy",
    4: "completely unrelated text about spark shuffles",
    5: "",
}


@pytest.fixture(scope="module")
def index(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in DOCS.items()], "doc_id long, text string"
    )
    return build_bm25_index(df)


def test_scores_match_reference(spark, index):
    postings, dfreq, meta = index
    query = ["quick", "dog", "dog", "missingterm"]
    got = {
        r.doc_id: r.bm25
        for r in bm25_topk(postings, dfreq, meta, query, k=10).collect()
    }
    want = _ref_bm25(DOCS, query)
    assert set(got) == set(want)
    for i in want:
        assert got[i] == pytest.approx(want[i], abs=2e-6)


def test_ranking_and_k(spark, index):
    postings, dfreq, meta = index
    top1 = bm25_topk(postings, dfreq, meta, ["dog"], k=1).collect()
    assert len(top1) == 1 and top1[0].doc_id == 2  # tf=3 wins
    top2 = bm25_topk(postings, dfreq, meta, ["quick", "fox"], k=2).collect()
    assert [r.doc_id for r in top2] == sorted(
        _ref_bm25(DOCS, ["quick", "fox"]),
        key=lambda i: (-_ref_bm25(DOCS, ["quick", "fox"])[i], i),
    )[:2]


def test_empty_doc_excluded_from_stats(index):
    _, _, meta = index
    assert meta["n_docs"] == 4  # doc 5 is token-less


def test_save_load_round_trip_and_pruning(spark, index, tmp_path):
    postings, dfreq, meta = index
    save_bm25(postings, dfreq, meta, str(tmp_path / "idx"))
    p2, d2, m2 = load_bm25(spark, str(tmp_path / "idx"))
    assert m2["n_docs"] == meta["n_docs"]
    got = {
        r.doc_id: r.bm25
        for r in bm25_topk(p2, d2, m2, ["dog", "quick"], k=10).collect()
    }
    want = _ref_bm25(DOCS, ["dog", "quick"])
    for i in want:
        assert got[i] == pytest.approx(want[i], abs=2e-6)
    # Partition pruning: the scan must touch only the query terms' hash
    # buckets (constant-folded xxhash64 literals), not all of them.
    q = bm25_topk(p2, d2, m2, ["dog"], k=3)
    plan = q._jdf.queryExecution().executedPlan().toString()
    import re as _re

    m = _re.search(r"partitions read[^\d]*(\d+)", plan)
    if m:  # formatted detail available
        assert int(m.group(1)) <= 2
    n_parts = len(
        [
            f
            for f in (tmp_path / "idx" / "postings").glob("bucket=*")
        ]
    )
    assert n_parts > 2  # the index genuinely has more buckets than read


def test_validation(spark, index):
    postings, dfreq, meta = index
    with pytest.raises(ValueError):
        bm25_topk(postings, dfreq, meta, [], k=3)
    with pytest.raises(ValueError):
        bm25_topk(postings, dfreq, meta, ["dog"], k=0)
    with pytest.raises(ValueError):
        bm25_topk(postings, dfreq, {"n_docs": 0, "total_len": 0}, ["dog"])


def test_incremental_update_equals_rebuild(spark, tmp_path):
    from influxdb_iox_spark.pipeline.search import update_bm25
    import os

    a = {i: t for i, t in DOCS.items() if i <= 3}
    b = {10: "a brand new dog document", 11: "quick quick updates arrive"}
    df_a = spark.createDataFrame(list(a.items()), "doc_id long, text string")
    df_b = spark.createDataFrame(list(b.items()), "doc_id long, text string")
    df_ab = spark.createDataFrame(
        list({**a, **b}.items()), "doc_id long, text string"
    )

    inc = str(tmp_path / "inc")
    p, d, m = build_bm25_index(df_a)
    save_bm25(p, d, m, inc)
    before = {
        e: sorted(os.listdir(tmp_path / "inc" / "postings" / e))
        for e in os.listdir(tmp_path / "inc" / "postings")
        if e.startswith("bucket=")
    }
    m2 = update_bm25(spark, inc, df_b)

    full = build_bm25_index(df_ab)
    assert m2 == full[2]
    pi, di, mi = load_bm25(spark, inc)
    key = lambda r: (r.term, r.doc_id)
    assert sorted(
        ((r.term, r.doc_id, r.tf, r.dl) for r in pi.collect())
    ) == sorted((r.term, r.doc_id, r.tf, r.dl) for r in full[0].collect())
    assert sorted((r.term, r.df) for r in di.collect()) == sorted(
        (r.term, r.df) for r in full[1].collect()
    )
    # Same query answers as a fresh rebuild.
    q = ["dog", "quick"]
    got = {r.doc_id: r.bm25 for r in bm25_topk(pi, di, mi, q, k=10).collect()}
    want = {
        r.doc_id: r.bm25
        for r in bm25_topk(full[0], full[1], full[2], q, k=10).collect()
    }
    assert got == want
    # Untouched bucket partitions kept their original files (the rewrite
    # was scoped by dynamic partition overwrite, not a full rewrite).
    new_terms = {
        t for ts in (b[k].split() for k in b) for t in ts
    }
    touched_rows = full[0].sparkSession.createDataFrame(
        [(t,) for t in new_terms], "term string"
    ).selectExpr(f"cast(pmod(xxhash64(term), {N_BUCKETS}) as int) b").collect()
    touched = {r.b for r in touched_rows}
    untouched = [
        e for e in before if int(e.split("=")[1]) not in touched
    ]
    assert untouched, "fixture must leave some buckets untouched"
    after = {
        e: sorted(os.listdir(tmp_path / "inc" / "postings" / e))
        for e in os.listdir(tmp_path / "inc" / "postings")
        if e.startswith("bucket=")
    }
    for e in untouched:
        assert after[e] == before[e], f"untouched bucket {e} was rewritten"


def test_update_is_idempotent_under_replay(spark, tmp_path):
    from influxdb_iox_spark.pipeline.search import update_bm25

    df_a = spark.createDataFrame(
        [(i, t) for i, t in DOCS.items() if i <= 3],
        "doc_id long, text string",
    )
    df_b = spark.createDataFrame(
        [(10, "a brand new dog document")], "doc_id long, text string"
    )
    path = str(tmp_path / "idx")
    p, d, m = build_bm25_index(df_a)
    save_bm25(p, d, m, path)
    m1 = update_bm25(spark, path, df_b)
    snap1 = {
        "post": sorted(
            (r.term, r.doc_id, r.tf, r.dl)
            for r in load_bm25(spark, path)[0].collect()
        ),
        "df": sorted((r.term, r.df) for r in load_bm25(spark, path)[1].collect()),
        "meta": m1,
    }
    # Replay the same batch: everything must be byte-identical.
    m2 = update_bm25(spark, path, df_b)
    assert m2 == m1
    assert sorted(
        (r.term, r.doc_id, r.tf, r.dl)
        for r in load_bm25(spark, path)[0].collect()
    ) == snap1["post"]
    assert sorted(
        (r.term, r.df) for r in load_bm25(spark, path)[1].collect()
    ) == snap1["df"]


def test_delete_equals_rebuild_and_clears_empty_buckets(spark, tmp_path):
    from influxdb_iox_spark.pipeline.search import delete_from_bm25
    import os

    # doc 4's vocabulary is disjoint from the others, so deleting it
    # empties some buckets — the dynamic-overwrite edge.
    keep = {i: t for i, t in DOCS.items() if i in (1, 2)}
    full = {**keep, 4: DOCS[4]}
    df_full = spark.createDataFrame(list(full.items()), "doc_id long, text string")
    df_del = spark.createDataFrame([(4, DOCS[4])], "doc_id long, text string")
    df_keep = spark.createDataFrame(list(keep.items()), "doc_id long, text string")

    path = str(tmp_path / "idx")
    save_bm25(*build_bm25_index(df_full), path)
    m = delete_from_bm25(spark, path, df_del)
    want_p, want_d, want_m = build_bm25_index(df_keep)
    assert m == want_m
    # replay BEFORE loading (a rewrite invalidates previously-loaded
    # frames' file lists): deleting again must be a no-op
    m2 = delete_from_bm25(spark, path, df_del)
    assert m2 == m
    pi, di, mi = load_bm25(spark, path)
    assert sorted(
        (r.term, r.doc_id, r.tf, r.dl) for r in pi.collect()
    ) == sorted((r.term, r.doc_id, r.tf, r.dl) for r in want_p.collect())
    assert sorted((r.term, r.df) for r in di.collect()) == sorted(
        (r.term, r.df) for r in want_d.collect()
    )
    # no stale bucket dir holds doc 4's unique terms
    got_terms = {r.term for r in pi.collect()}
    assert "spark" not in got_terms and "shuffles" not in got_terms
    # queries answer exactly like the rebuilt index
    got = {
        r.doc_id: r.bm25
        for r in bm25_topk(pi, di, mi, ["dog", "quick"], k=10).collect()
    }
    want = {
        r.doc_id: r.bm25
        for r in bm25_topk(want_p, want_d, want_m, ["dog", "quick"], k=10).collect()
    }
    assert got == want
