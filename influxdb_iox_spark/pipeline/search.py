"""BM25 full-text retrieval — the lexical twin of the ANN search path.

A training-data platform needs text retrieval next to embedding search
(contamination forensics, targeted corpus slicing, eval-set mining).
This is Okapi BM25 over an inverted-postings TABLE — the classic
search-engine layout re-expressed relationally, the way Lucene's
per-segment index becomes a distributed columnar dataset:

- **Build once**: ``build_bm25_index`` produces one postings DataFrame
  (term, doc, tf, dl) — document length DENORMALIZED onto every
  posting so query-time scoring never joins a doc-stats side table —
  plus a (term, df) document-frequency table and two corpus scalars
  (N, avgdl) in a tiny meta dict.  Persist with ``save_bm25`` /
  ``load_bm25``: postings are written **partitioned by a term hash
  bucket**, so a query's scan prunes to |query-terms| buckets instead
  of the whole index (the IVF-probe trick applied to text).
- **Query time**: filter postings to the query terms (partition-pruned
  + pushed down), broadcast-join the ≤|q|-row df slice, score each
  posting with the BM25 saturation formula, ONE doc-keyed aggregate,
  top-k via orderBy+limit (TakeOrderedAndProject: bounded heaps, never
  a global sort).

Scoring contract (engine-portable, DuckDB-oracle-paired):
idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5))  [the Lucene positive
variant], score(d) = Σ_t idf·tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)),
with integer tf/dl/df/N end-to-end and the final double rounded to
1e-6 (the repo's ln contract — the sum has ≤|q| terms, so ordering
drift is bounded and absorbed by the rounding).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from influxdb_iox_spark.pipeline.index_txn import maintenance_txn
from influxdb_iox_spark.pipeline.text import word_tokens

N_BUCKETS = 64  # term-hash partition fan-out of a persisted index


def build_bm25_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame, dict]:
    """(postings, dfreq, meta) — postings = (term, id, tf, dl);
    dfreq = (term, df); meta = {"n_docs": N, "total_len": L}
    (avgdl = L/N is derived at query time so the stored stats stay
    integers).  Documents with no tokens are excluded from N — they can
    never match, and counting them would deflate every idf."""
    toks = df.select(
        F.col(id_col), F.explode(word_tokens(F.col(text_col))).alias("term")
    )
    # ONE tokenize pass (round-16 optimization): every downstream frame
    # — doc lengths, postings, document frequencies, the corpus stats
    # row — derives from the per-(term, doc) tf aggregate, so the
    # corpus is tokenized and exploded once instead of four times (the
    # before-plan carried four scan→explode pipelines: dl, postings,
    # dfreq, and the eager stats collect each re-derived `toks`).  The
    # doc length is recovered exactly as sum(tf); the checkpoint rows
    # are (term, id, tf) — the index itself, the same rows the term
    # exchange already moves — and blocks are keyed to this RDD object,
    # so repeated invocations recompute (no cross-run result reuse).
    tf = (
        toks.groupBy("term", id_col)
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=True)
    )
    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    postings = tf.join(dl, id_col).select("term", id_col, "tf", "dl")
    dfreq = tf.groupBy("term").agg(
        F.count("*").alias("df")
    )
    stats = dl.agg(
        F.count("*").alias("n"), F.sum("dl").alias("l")
    ).collect()[0]
    meta = {"n_docs": int(stats["n"] or 0), "total_len": int(stats["l"] or 0)}
    return postings, dfreq, meta


def _id_col_of(postings: DataFrame) -> str:
    ids = [
        c for c in postings.columns
        if c not in ("term", "tf", "dl", "bucket")
    ]
    if len(ids) != 1:
        raise ValueError(f"cannot identify id column in {postings.columns}")
    return ids[0]


def _ibucket(col) -> F.Column:
    return F.pmod(F.xxhash64(col), F.lit(N_BUCKETS)).cast("int")


def save_bm25(
    postings: DataFrame, dfreq: DataFrame, meta: dict, path: str
) -> None:
    """Persist the index; postings partitioned by a term-hash bucket so
    query scans prune to the buckets of the query's own terms, plus a
    ``doclen/`` sidecar — (id, dl) partitioned by an ID-hash bucket —
    the authoritative which-ids-are-indexed map that lets the
    incremental maintainers probe any batch's ids by pruning to the
    batch's own id buckets instead of scanning every postings bucket."""
    bp = postings.withColumn(
        "bucket", F.pmod(F.xxhash64("term"), F.lit(N_BUCKETS)).cast("int")
    )
    bp.write.mode("overwrite").partitionBy("bucket").parquet(
        os.path.join(path, "postings")
    )
    id_col = _id_col_of(postings)
    dlen = (
        postings.select(id_col, "dl")
        .distinct()
        .withColumn("ibucket", _ibucket(F.col(id_col)))
    )
    dlen.write.mode("overwrite").partitionBy("ibucket").parquet(
        os.path.join(path, "doclen")
    )
    dfreq.write.mode("overwrite").parquet(os.path.join(path, "dfreq"))
    with open(os.path.join(path, "_bm25_meta.json"), "w") as f:
        # Schemas ride in the sidecar so loads are schema-explicit: an
        # EMPTY partitioned write (a fresh streaming bootstrap index)
        # leaves no data files to infer from.
        json.dump(
            {
                "kind": "bm25",
                "buckets": N_BUCKETS,
                "postings_schema": bp.schema.json(),
                "dfreq_schema": dfreq.schema.json(),
                "doclen_schema": dlen.schema.json(),
                **meta,
            },
            f,
        )


def _load_doclen(
    spark: SparkSession, path: str, meta: dict, postings: DataFrame
) -> DataFrame:
    """The (id, dl, ibucket) sidecar; a pre-sidecar index (older save
    layout) is adopted by bootstrapping it ONCE from a full postings
    scan — every later batch probes by id bucket."""
    from pyspark.sql.types import StructType

    dpath = os.path.join(path, "doclen")
    # _SUCCESS gates trust: a crash mid-bootstrap leaves a partial dir
    # that must be re-bootstrapped, not read as authoritative.
    if os.path.exists(os.path.join(dpath, "_SUCCESS")):
        r = spark.read
        if "doclen_schema" in meta:
            r = r.schema(
                StructType.fromJson(json.loads(meta["doclen_schema"]))
            )
        return r.parquet(dpath)
    id_col = _id_col_of(postings)
    dlen = (
        postings.select(id_col, "dl")
        .distinct()
        .withColumn("ibucket", _ibucket(F.col(id_col)))
        .localCheckpoint(eager=True)
    )
    dlen.write.mode("overwrite").partitionBy("ibucket").parquet(dpath)
    return dlen


def update_bm25(
    spark: SparkSession,
    path: str,
    new_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    guard=None,
    force: bool = False,
    writer: str | None = None,
) -> dict:
    """Fold a batch of documents into a persisted index without
    rebuilding it — the continuous-ingest twin of ``build_bm25_index``.

    Semantics: REPLACEMENT by id.  A batch id already in the index has
    its old postings dropped from the touched buckets and its stats
    subtracted before the new ones land, so replaying the SAME batch is
    a no-op (foreachBatch is at-least-once; every streaming effect in
    this repo is an idempotent replay).  The replacement is complete
    because a replayed doc's content is identical, so its terms hash to
    exactly the buckets being rewritten; for a CHANGED doc the contract
    is delete-then-add — and that contract is ENFORCED, not assumed: a
    replaced id whose indexed postings disagree with the batch (dl or
    any per-term tf) raises before anything is written, because its old
    terms outside the new term set would silently leak stale postings
    into untouched buckets.  The check is COMPLETE via the ``doclen``
    id-sidecar: the batch's ids are probed against it (pruned to the
    batch's own id-hash buckets), so a replaced id is detected even
    when its OLD terms hash to none of the touched postings buckets —
    such an id has zero old rows in the touched buckets, which is
    itself proof of changed content (identical content would land in
    exactly those buckets) and raises; ids that DO surface old rows get
    the full (term, tf) + dl comparison, and every NEW term's bucket is
    touched by construction.

    Concurrency: serialized through the index's writer claim
    (``pipeline.index_txn``) — ``begin()`` is taken before the index is
    read, so two concurrent updaters apply one-after-the-other instead
    of losing a batch; a crashed run leaves an intent marker the next
    run surfaces as ``IndexMaintenanceInterrupted`` (re-drive with
    ``force=True``; the fold is replay-idempotent).  ``writer=`` names
    a SINGLE logical owner (e.g. one streaming query per index): two
    live processes must never share a name — a dead incarnation's claim
    is self-succeeded once its heartbeat ages past the liveness grace.

    Cost model: the batch's postings land in the term buckets its OWN
    terms hash to, and ONLY those partitions rewrite (dynamic partition
    overwrite — for a small batch that is a handful of the 64 buckets,
    not the index); document frequencies for the affected TERMS are
    recomputed from the merged buckets (complete per term, since a
    term's postings all live in one bucket); dfreq and the meta sidecar
    are tiny and rewrite whole.  Returns the new meta.
    """
    with maintenance_txn(path, guard=guard, force=force, writer=writer) as txn:
        postings, dfreq, meta = load_bm25(spark, path)
        np_, _, nm = build_bm25_index(
            new_docs, id_col=id_col, text_col=text_col
        )
        np_ = np_.withColumn(
            "bucket", F.pmod(F.xxhash64("term"), F.lit(N_BUCKETS)).cast("int")
        ).localCheckpoint(eager=True)
        touched = [
            r["bucket"] for r in np_.select("bucket").distinct().collect()
        ]
        if not touched:
            return {
                "n_docs": int(meta["n_docs"]),
                "total_len": int(meta["total_len"]),
            }
        new_ids = np_.select(id_col).distinct()
        doclen = _load_doclen(spark, path, meta, postings)
        # Replaced-id probe via the id sidecar: prune to the batch ids'
        # OWN hash buckets — batch-proportional, never a full-index scan.
        ibs = [
            r["ibucket"]
            for r in new_ids.select(
                _ibucket(F.col(id_col)).alias("ibucket")
            ).distinct().collect()
        ]
        rep_dl = (
            doclen.filter(F.col("ibucket").isin(ibs))
            .join(F.broadcast(new_ids), id_col)
            .select(id_col, "dl")
            .localCheckpoint(eager=True)
        )
        old_touched = postings.filter(F.col("bucket").isin(touched))
        old_rep = old_touched.join(F.broadcast(new_ids), id_col)
        # Changed-content enforcement (see docstring): full-outer match
        # of old vs new postings for replaced ids on (id, term), PLUS
        # the sidecar completeness net — a replaced id with NO old rows
        # in the touched buckets has all its old terms elsewhere, which
        # is proof of changed content.
        # SKIPPED under force=True: a crash-interrupted run leaves a
        # batch PARTIALLY applied (dynamic overwrite commits partition
        # dirs one by one), so the re-drive legitimately sees its own
        # half-written postings — a false "changed content" positive;
        # force is the documented I-am-re-driving-that-batch switch and
        # the fold converges regardless.
        mismatch = [] if force else (
            old_rep.select(
                id_col, "term",
                F.col("tf").alias("tf_old"), F.col("dl").alias("dl_old"),
            )
            .join(
                np_.join(
                    F.broadcast(old_rep.select(id_col).distinct()), id_col
                ).select(
                    id_col, "term",
                    F.col("tf").alias("tf_new"), F.col("dl").alias("dl_new"),
                ),
                [id_col, "term"],
                "full_outer",
            )
            .filter(
                F.col("tf_old").isNull()
                | F.col("tf_new").isNull()
                | (F.col("tf_old") != F.col("tf_new"))
                | (F.col("dl_old") != F.col("dl_new"))
            )
            .select(id_col)
            .unionByName(  # indexed id invisible in touched buckets
                rep_dl.select(id_col).join(
                    old_rep.select(id_col).distinct(), id_col, "left_anti"
                )
            )
            .distinct()
            .limit(5)
            .collect()
        )
        if mismatch:
            ids = sorted(r[id_col] for r in mismatch)
            raise ValueError(
                f"update_bm25: batch content differs from the indexed "
                f"content for id(s) {ids} — replacement-by-id only covers "
                "identical replays; for changed documents call "
                "delete_from_bm25 with the OLD text, then update_bm25 "
                "with the new (old terms outside the new term set would "
                "otherwise leak stale postings)"
            )
        # Stats of batch ids already present (the replay / replacement
        # set), from the authoritative id sidecar — complete even for
        # ids whose old postings sit outside the touched buckets.
        replaced = rep_dl.agg(
            F.count("*").alias("n"), F.sum("dl").alias("l")
        ).collect()[0]
        merged = (
            old_touched.join(F.broadcast(new_ids), id_col, "left_anti")
            .unionByName(np_)
            .localCheckpoint(eager=True)  # breaks the self-overwrite cycle
        )
        affected_terms = np_.select("term").distinct()
        new_term_df = merged.join(
            F.broadcast(affected_terms), "term"
        ).groupBy("term").agg(F.count("*").alias("df"))
        new_dfreq = (
            dfreq.join(F.broadcast(affected_terms), "term", "left_anti")
            .unionByName(new_term_df)
            .localCheckpoint(eager=True)
        )
        merged_dlen = (
            doclen.filter(F.col("ibucket").isin(ibs))
            .join(F.broadcast(new_ids), id_col, "left_anti")
            .select(id_col, "dl", "ibucket")
            .unionByName(
                np_.select(id_col, "dl")
                .distinct()
                .withColumn("ibucket", _ibucket(F.col(id_col)))
            )
            .localCheckpoint(eager=True)
        )
        txn.mutating()
        prev = spark.conf.get(
            "spark.sql.sources.partitionOverwriteMode", "static"
        )
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            merged.write.mode("overwrite").partitionBy("bucket").parquet(
                os.path.join(path, "postings")
            )
            merged_dlen.write.mode("overwrite").partitionBy(
                "ibucket"
            ).parquet(os.path.join(path, "doclen"))
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        new_dfreq.write.mode("overwrite").parquet(os.path.join(path, "dfreq"))
        out = {
            "n_docs": int(meta["n_docs"]) - int(replaced["n"] or 0)
            + int(nm["n_docs"]),
            "total_len": int(meta["total_len"]) - int(replaced["l"] or 0)
            + int(nm["total_len"]),
        }
        with open(os.path.join(path, "_bm25_meta.json"), "w") as f:
            keep = {
                k: meta[k]
                for k in ("postings_schema", "dfreq_schema", "doclen_schema")
                if k in meta
            }
            # adopted legacy index: record the bootstrapped sidecar schema
            keep.setdefault("doclen_schema", merged_dlen.schema.json())
            json.dump(
                {"kind": "bm25", "buckets": N_BUCKETS, **keep, **out}, f
            )
        return out


def delete_from_bm25(
    spark: SparkSession,
    path: str,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    guard=None,
    force: bool = False,
    writer: str | None = None,
) -> dict:
    """Remove documents from a persisted index — the takedown path
    (eval-set contamination discovered post-index, right-to-be-forgotten).

    The document TEXT locates the buckets to rewrite (a doc's postings
    live exactly in its own terms' hash buckets — the same content-keyed
    contract as ``update_bm25``: pass the text as indexed).  Only those
    partitions rewrite; document frequencies for the affected terms are
    recomputed from the merged buckets, terms with no remaining postings
    vanish from dfreq; corpus stats subtract the deleted docs' indexed
    dl (read from the ``doclen`` id sidecar, so a drifted text column
    cannot corrupt the totals).  Deleting an absent id is a no-op, so
    replays are idempotent.  Serialized through the index's writer
    claim, like update (see ``pipeline.index_txn``); ``writer=`` names
    a single logical owner — two live processes must never share a
    name.  Returns the new meta.
    """
    with maintenance_txn(path, guard=guard, force=force, writer=writer) as txn:
        postings, dfreq, meta = load_bm25(spark, path)
        np_, _, _ = build_bm25_index(docs, id_col=id_col, text_col=text_col)
        np_ = np_.withColumn(
            "bucket", F.pmod(F.xxhash64("term"), F.lit(N_BUCKETS)).cast("int")
        ).localCheckpoint(eager=True)
        touched = [
            r["bucket"] for r in np_.select("bucket").distinct().collect()
        ]
        if not touched:
            return {
                "n_docs": int(meta["n_docs"]),
                "total_len": int(meta["total_len"]),
            }
        del_ids = np_.select(id_col).distinct()
        doclen = _load_doclen(spark, path, meta, postings)
        ibs = [
            r["ibucket"]
            for r in del_ids.select(
                _ibucket(F.col(id_col)).alias("ibucket")
            ).distinct().collect()
        ]
        # removed stats from the authoritative id sidecar (id-bucket
        # pruned), so a drifted text column cannot corrupt the totals
        removed = (
            doclen.filter(F.col("ibucket").isin(ibs))
            .join(F.broadcast(del_ids), id_col)
            .agg(F.count("*").alias("n"), F.sum("dl").alias("l"))
            .collect()[0]
        )
        old_touched = postings.filter(F.col("bucket").isin(touched))
        merged = old_touched.join(
            F.broadcast(del_ids), id_col, "left_anti"
        ).localCheckpoint(eager=True)
        merged_dlen = (
            doclen.filter(F.col("ibucket").isin(ibs))
            .join(F.broadcast(del_ids), id_col, "left_anti")
            .localCheckpoint(eager=True)
        )
        affected_terms = np_.select("term").distinct()
        new_term_df = merged.join(
            F.broadcast(affected_terms), "term"
        ).groupBy("term").agg(F.count("*").alias("df"))
        new_dfreq = (
            dfreq.join(F.broadcast(affected_terms), "term", "left_anti")
            .unionByName(new_term_df)
            .localCheckpoint(eager=True)
        )
        txn.mutating()
        prev = spark.conf.get(
            "spark.sql.sources.partitionOverwriteMode", "static"
        )
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            merged.write.mode("overwrite").partitionBy("bucket").parquet(
                os.path.join(path, "postings")
            )
            merged_dlen.write.mode("overwrite").partitionBy(
                "ibucket"
            ).parquet(os.path.join(path, "doclen"))
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        # Dynamic overwrite only replaces partitions the write PRODUCES: a
        # bucket left EMPTY by the deletion writes nothing and its stale
        # files would survive — clear those partition dirs explicitly
        # (Hadoop FS, so s3a/hdfs paths work like local ones).
        survived = {
            r["bucket"] for r in merged.select("bucket").distinct().collect()
        }
        jvm = spark._jvm
        for b in set(touched) - survived:
            jpath = jvm.org.apache.hadoop.fs.Path(
                os.path.join(path, "postings", f"bucket={b}")
            )
            fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
            fs.delete(jpath, True)
        survived_i = {
            r["ibucket"]
            for r in merged_dlen.select("ibucket").distinct().collect()
        }
        for b in set(ibs) - survived_i:
            jpath = jvm.org.apache.hadoop.fs.Path(
                os.path.join(path, "doclen", f"ibucket={b}")
            )
            fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
            fs.delete(jpath, True)
        new_dfreq.write.mode("overwrite").parquet(os.path.join(path, "dfreq"))
        out = {
            "n_docs": int(meta["n_docs"]) - int(removed["n"] or 0),
            "total_len": int(meta["total_len"]) - int(removed["l"] or 0),
        }
        with open(os.path.join(path, "_bm25_meta.json"), "w") as f:
            keep = {
                k: meta[k]
                for k in ("postings_schema", "dfreq_schema", "doclen_schema")
                if k in meta
            }
            keep.setdefault("doclen_schema", merged_dlen.schema.json())
            json.dump(
                {"kind": "bm25", "buckets": N_BUCKETS, **keep, **out}, f
            )
        return out


def load_bm25(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame, dict]:
    from pyspark.sql.types import StructType

    with open(os.path.join(path, "_bm25_meta.json")) as f:
        meta = json.load(f)
    pr = spark.read
    dr = spark.read
    if "postings_schema" in meta:
        pr = pr.schema(StructType.fromJson(json.loads(meta["postings_schema"])))
    if "dfreq_schema" in meta:
        dr = dr.schema(StructType.fromJson(json.loads(meta["dfreq_schema"])))
    return (
        pr.parquet(os.path.join(path, "postings")),
        dr.parquet(os.path.join(path, "dfreq")),
        meta,
    )


def bm25_topk(
    postings: DataFrame,
    dfreq: DataFrame,
    meta: dict,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k (id, bm25) for a bag of query terms.

    Repeated query terms count once (bag-of-terms query, the standard
    web-query semantics).  On a ``load_bm25`` index the term filter
    prunes partitions via the bucket column when present; on an
    in-memory index it pushes down to the scan either way.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    terms = sorted(set(query_terms))
    if not terms:
        raise ValueError("query_terms must be non-empty")
    n_docs, total_len = int(meta["n_docs"]), int(meta["total_len"])
    if n_docs <= 0:
        raise ValueError("empty index")
    avgdl = float(total_len) / float(n_docs)
    p = postings.filter(F.col("term").isin(terms))
    if "bucket" in postings.columns:
        # Loaded index: restrict to the query terms' hash buckets.  Each
        # comparison's right side is xxhash64 over a LITERAL — Catalyst
        # constant-folds it, so this prunes partitions at planning time
        # (asserted in tests), not per row.
        cond = None
        for t in terms:
            c = F.col("bucket") == F.pmod(
                F.xxhash64(F.lit(t)), F.lit(N_BUCKETS)
            ).cast("int")
            cond = c if cond is None else (cond | c)
        p = p.filter(cond)
    p = p.join(
        F.broadcast(dfreq.filter(F.col("term").isin(terms))), "term"
    )
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    tf = F.col("tf").cast("double")
    denom = tf + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl").cast("double") / F.lit(avgdl)
    )
    contrib = idf * tf * F.lit(k1 + 1.0) / denom
    return (
        p.select(F.col(id_col), contrib.alias("c"))
        .groupBy(id_col)
        .agg((F.round(F.sum("c") * 1_000_000) / 1_000_000).alias("bm25"))
        .orderBy(F.desc("bm25"), id_col)
        .limit(k)
    )
