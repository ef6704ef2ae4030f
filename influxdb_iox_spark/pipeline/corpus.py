"""Corpus-preparation operators for training-data pipelines.

Beyond the reference surface (which has no document pipeline); designed for
the 100 TB corpus case alongside pipeline/dedup.py:

- ``pack_shards``: assign documents to fixed-token-budget shards in a stable
  global order — the classic "pack the corpus into ~N-token training shards"
  step.  A naive ``SUM() OVER (ORDER BY …)`` running total collapses the
  whole table into ONE task; this implementation derives DETERMINISTIC
  logical partition ids from a quantile pass over the id column, computes
  per-partition running sums, and broadcasts the tiny prefix-offset table —
  a true two-pass algorithm with no materialization (the round-4 version
  localCheckpointed the whole corpus to pin a physical partitioning; the
  logical ids make every recomputation agree by construction).
- ``contamination_check``: n-gram overlap between a training corpus and an
  eval/benchmark set — exact (shingle equi-join on the n-gram string), the
  standard train/test leakage scan.  ``prefilter=True`` adds an EXACT
  hash-sketch prefilter: the gram-hash sets intersect first (longs, tiny),
  and the string-carrying join runs only over grams whose hash matched —
  orders of magnitude less shuffle when contamination is rare, identical
  results always.
- ``deterministic_sample``: per-stratum sampling by a cryptographic hash of
  the id — reproducible across engines and runs (unlike ``df.sampleBy``),
  so a sampled corpus can be re-derived bit-for-bit from the raw corpus.
  Keeps a row iff md5(id)'s leading 32 bits, as a fraction of 2^32, fall
  below the stratum's rate.  Small rate maps inline as a CASE chain;
  large ones broadcast-join a rates table (same selection either way).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import NumericType


def _running_token_totals(
    df: DataFrame,
    token_col: str,
    id_col: str,
    num_partitions: int | None,
) -> DataFrame:
    """Append ``__running`` — the INCLUSIVE global running sum of
    ``token_col`` in ``id_col`` order — without a single-task global
    window.

    Two passes, nothing materialized (for numeric ids): one
    ``approxQuantile`` pass yields explicit range boundaries, making the
    partition id a PURE FUNCTION of the id (the totals job and the
    returned plan agree on every row's partition without pinning); then
    per-partition window sums plus one O(partitions) driver collect of
    totals broadcast back as prefix offsets.  Non-numeric ids fall back to
    the pinned-physical path (repartitionByRange + spark_partition_id
    held stable by an eager localCheckpoint)."""
    spark = df.sparkSession
    n_parts = num_partitions or spark.sparkContext.defaultParallelism

    if isinstance(df.schema[id_col].dataType, NumericType):
        probs = [i / n_parts for i in range(1, n_parts)]
        # n_parts == 1 -> no interior boundaries; approxQuantile rejects an
        # empty probability list, and a single partition needs none.
        bounds = (
            df.stat.approxQuantile(id_col, probs, 1.0 / (100 * n_parts))
            if probs
            else []
        )
        pid = F.lit(0)
        for b in sorted(set(bounds)):  # duplicate quantiles collapse
            pid = pid + (F.col(id_col) > F.lit(b)).cast("int")
        # NULL ids: the > comparisons yield NULL -> NULL pid, which would
        # crash the driver-side sorted(sums); pin them to partition -1
        # (consistent with the window's nulls-first ordering within it)
        pid = F.when(F.col(id_col).isNull(), F.lit(-1)).otherwise(pid)
        # the window's partitionBy("__pid") supplies the (single) exchange;
        # no physical pre-partitioning needed since __pid is deterministic
        local_src = df.withColumn("__pid", pid)
    else:
        part = df.repartitionByRange(n_parts, F.col(id_col)).withColumn(
            "__pid", F.spark_partition_id()
        )
        # Pin the physical row-to-partition assignment before the two
        # consumers — see docstring.  localCheckpoint, not cache()
        # (SCALE.md: cache freezes pre-AQE plans).
        local_src = part.localCheckpoint(eager=True)

    w = (
        Window.partitionBy("__pid")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = local_src.withColumn(
        "__local", F.sum(F.col(token_col).cast("long")).over(w)
    )
    # per-partition totals -> prefix offsets (tiny: one row per partition)
    totals = local.groupBy("__pid").agg(F.max("__local").alias("__t")).collect()
    sums = {r["__pid"]: r["__t"] for r in totals}
    prefix, acc = {}, 0
    for pid_val in sorted(sums):
        prefix[pid_val] = acc
        acc += sums[pid_val]
    offsets = spark.createDataFrame(
        [(p, off) for p, off in prefix.items()], "__pid int, __prefix long"
    )
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn("__running", F.col("__local") + F.col("__prefix"))
        .drop("__pid", "__local", "__prefix")
    )


def pack_shards(
    df: DataFrame,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    shard_tokens: int = 100_000,
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign each row a ``shard_id`` so that consecutive documents (in
    ``id_col`` order) fill shards of ~``shard_tokens`` tokens.

    shard_id = floor((running_total - row_tokens) / shard_tokens): a shard
    boundary falls wherever the running total crosses a multiple of the
    budget, so every shard except possibly the last holds >= shard_tokens
    only if a single document overflows it (documents are never split).

    The distributed running sum is ``_running_token_totals`` (two passes,
    nothing materialized for numeric ids — see its docstring)."""
    out = _running_token_totals(df, token_col, id_col, num_partitions)
    return out.withColumn(
        "shard_id",
        F.floor(
            (F.col("__running") - F.col(token_col)) / F.lit(shard_tokens)
        ),
    ).drop("__running")


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Training-sequence packing map: where each document lands when the
    corpus is concatenated in ``id_col`` order and cut into fixed
    ``seq_len``-token sequences (documents DO cross sequence boundaries —
    the standard causal-LM packing, unlike ``pack_shards`` which never
    splits a document).

    Appends per document:

    - ``start_offset`` — global token offset of the document's first token
    - ``first_seq`` / ``last_seq`` — sequence ids the document touches
      (a zero-token document "lands" at its offset: first == last)
    - ``n_boundary_crossings`` — how many sequence cuts split the document

    The output is the manifest a sequence-writer job consumes: every
    (sequence id, contributing docs + token spans) is derivable from it
    with one range join, and the assignment is a pure function of the
    corpus order, so re-runs and backfills agree.  Cost = the same
    distributed running sum as ``pack_shards``; everything after is
    arithmetic on the running total.
    """
    out = _running_token_totals(df, token_col, id_col, num_partitions)
    start = F.col("__running") - F.col(token_col)
    first = F.floor(start / F.lit(seq_len))
    last_tok = F.greatest(F.col("__running") - 1, start)  # 0-token doc -> start
    last = F.floor(last_tok / F.lit(seq_len))
    return (
        out.withColumn("start_offset", start)
        .withColumn("first_seq", first)
        .withColumn("last_seq", last)
        .withColumn("n_boundary_crossings", (last - first).cast("long"))
        .drop("__running")
    )


def contamination_check(
    train_df: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 8,
    prefilter: bool = False,
) -> DataFrame:
    """Training documents sharing at least one ``shingle_n``-gram with any
    eval document: (train id, n_shared_shingles, n_eval_docs) per
    contaminated training doc.

    Exact (no lossy sketching): both sides explode to word n-grams and
    equi-join on the gram string.  At 100 TB the join shuffles on the gram
    — the inverted-index bound — and the eval side is typically small
    enough that Spark broadcasts it after aggregation.

    ``prefilter=True`` — the scale path — first intersects the two sides'
    DISTINCT gram-hash sets (xxhash64 longs; the eval side's distinct hash
    set is tiny and broadcasts), then runs the string-carrying join only
    over train grams whose HASH matched.  Because the final join still
    compares the gram strings, a 64-bit collision can only add a candidate
    that the string equality then rejects — results are IDENTICAL to the
    exact path while the wide shuffle shrinks from every train gram to the
    (rare) matched subset.  A MinHash-band prefilter was considered and
    rejected: banding bounds Jaccard similarity, but contamination is
    "shares ≥ 1 shingle" — a doc leaking a single benchmark sentence has
    near-zero Jaccard and would be silently missed.
    """
    from influxdb_iox_spark.pipeline.dedup import shingles

    tr = train_df.select(
        F.col(id_col).alias("train_id"),
        F.explode(shingles(F.col(text_col), shingle_n)).alias("gram"),
    )
    ev = eval_df.select(
        F.col(id_col).alias("eval_id"),
        F.explode(shingles(F.col(text_col), shingle_n)).alias("gram"),
    )
    if prefilter:
        tr = tr.withColumn("__gh", F.xxhash64("gram"))
        # The eval gram frame feeds TWO branches (the distinct-hash
        # broadcast and the string-carrying join) and is the small side
        # by contract (benchmark sets); materialize it once instead of
        # re-tokenizing the eval docs per branch (round-16 audit plan:
        # 8 document scans for this operator).
        ev = (
            ev.withColumn("__gh", F.xxhash64("gram"))
            .localCheckpoint(eager=True)
        )
        # Semi-join train grams DIRECTLY against the broadcast eval
        # hash set.  The previous `matched` intermediate (train-distinct
        # hashes ∩ eval-distinct hashes) filtered tr to exactly the same
        # rows — a semi-join against an intersection-with-the-left's-own-
        # key-set equals a semi-join against the right set — while
        # costing a full shuffle-distinct over every train gram plus a
        # second train tokenize.
        tr = tr.join(
            F.broadcast(ev.select("__gh").distinct()), "__gh", "left_semi"
        )
        joined = tr.join(ev, (tr["__gh"] == ev["__gh"]) & (tr["gram"] == ev["gram"]))
    else:
        joined = tr.join(ev, "gram")
    return (
        joined.groupBy("train_id")
        .agg(
            F.count("*").alias("n_shared_shingles"),
            F.count_distinct("eval_id").alias("n_eval_docs"),
        )
        # no ORDER BY here: a global sort of a corpus-sized result is the
        # caller's choice, not the operator's
    )


#: above this many strata the CASE chain becomes a broadcast-joined table
STRATA_CASE_CHAIN_MAX = 64


def deterministic_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Reproducible per-stratum sampling: keep a row iff the leading 32 bits
    of md5(id) — a uniform [0, 1) fraction — fall below its stratum's rate.

    md5 (not Spark's hash/xxhash64) so the SAME sample is derivable in any
    engine; the selection is a pure column predicate (no RNG state, no
    sampleBy), so re-running over a grown corpus keeps previously-selected
    rows selected.

    Up to ``STRATA_CASE_CHAIN_MAX`` strata inline as a CASE chain (zero
    join); beyond that — thousands of language/domain strata — the rates
    ship as a broadcast-joined table so the plan stays O(1) in strata
    count.  Both paths select identical rows.
    """
    frac = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("double")
        / F.lit(float(2**32))
    )
    if len(rates) <= STRATA_CASE_CHAIN_MAX:
        rate = F.lit(float(default_rate))
        for k, v in sorted(rates.items()):
            rate = F.when(F.col(strata_col) == k, F.lit(float(v))).otherwise(rate)
        return df.filter(frac < rate)
    spark = df.sparkSession
    rates_df = spark.createDataFrame(
        [(k, float(v)) for k, v in sorted(rates.items())],
        f"{strata_col} string, __rate double",
    )
    return (
        df.join(F.broadcast(rates_df), strata_col, "left")
        .filter(frac < F.coalesce(F.col("__rate"), F.lit(float(default_rate))))
        .drop("__rate")
        .select(*df.columns)
    )


def stratified_weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Top-``k`` documents PER STRATUM drawn without replacement with
    probability proportional to ``weight_col`` — the per-language /
    per-domain twin of ``dsir.dsir_resample``'s global Gumbel top-k
    (Efraimidis–Spirakis weighted reservoir, distributed formulation):
    key = ln(w) + Gumbel(0,1), keep each stratum's k largest keys.

    "Sample 100k docs per language, weighted by quality score" is the
    standard curriculum-mixing primitive; uniform per-stratum sampling
    (``deterministic_sample``) can't express the weighting, and the
    global resample can't express the quota.

    The Gumbel noise is a pure function of (seed, id) via the engine's
    portable md5 recipe (u = (h32 + 0.5)/2^32, g = −ln(−ln u)), so the
    draw is deterministic across runs, cluster layouts, and engines —
    DuckDB replays it bit-for-bit, making the operator oracle-pairable.
    Rows with NULL or non-positive weight are excluded (ln undefined) —
    matching the oracle's WHERE.

    Scale shape: one rank window partitioned BY STRATUM — parallelism
    is stratum count, and within a stratum the window's sort carries
    only (stratum, key, id).  A single monster stratum serializes into
    one task's sort — the same documented per-key floor as every
    per-series analytic (SCALE.md §r15); quota sampling cannot avoid
    ranking within the quota's scope."""
    from pyspark.sql import Window

    from influxdb_iox_spark.pipeline.randkeys import gumbel_key

    if k < 1:
        raise ValueError("k must be >= 1")
    key = gumbel_key(
        seed, F.col(id_col), F.log(F.col(weight_col).cast("double"))
    )
    w = Window.partitionBy(strata_col).orderBy(F.desc("__gkey"), id_col)
    return (
        df.filter(F.col(weight_col).cast("double") > 0)
        .withColumn("__gkey", key)
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__gkey", "__rk")
    )


def split_assign(
    df: DataFrame,
    splits: dict[str, float] | None = None,
    id_col: str = "doc_id",
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: each row gets a split
    label from the leading 32 bits of md5(salt ‖ id) against the
    cumulative split boundaries — a pure column expression, so the
    assignment is engine-portable (the DuckDB oracle derives identical
    labels), stable under corpus growth (a doc keeps its split forever —
    the property that prevents slow train/test leakage as snapshots
    roll), and shard-local (no shuffle, no RNG state, no sampleBy).

    ``salt`` decorrelates this hash from every other md5-keyed decision
    in the pipeline (``deterministic_sample``, ``shuffle_into_shards``):
    reusing the bare id hash would make "sampled at rate r" and "in
    train" correlated selections.  Fractions must sum to 1 (labels
    partition the corpus); order is lexicographic by label so the
    boundary layout is reproducible from the dict alone."""
    splits = splits or {"test": 0.05, "train": 0.9, "val": 0.05}
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    frac = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(float(2**32))
    )
    label = None
    cum = 0.0
    items = sorted(splits.items())
    for name, share in items[:-1]:
        cum += float(share)
        cond = frac < F.lit(cum)
        label = (
            F.when(cond, F.lit(name))
            if label is None
            else label.when(cond, F.lit(name))
        )
    label = (
        label.otherwise(F.lit(items[-1][0]))
        if label is not None
        else F.lit(items[-1][0])
    )
    return df.withColumn(out_col, label)


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    content_cols: tuple[str, ...] = ("text",),
) -> DataFrame:
    """Per-document status between two corpus snapshots: ``added``
    (id only in new), ``removed`` (only in old), ``changed`` (both,
    content fingerprint differs), ``unchanged`` — the primitive behind
    incremental re-processing (re-embed/re-score only added+changed,
    tombstone removed) and snapshot audits.

    Scale shape: content is md5-fingerprinted BEFORE the join, so the
    id-keyed full-outer shuffle moves (id, 32-byte fp) rows — never
    document bodies; at 100 TB the exchange is ~fingerprint-table
    sized.  md5 (not xxhash) keeps the fingerprint engine-portable, so
    the whole diff is oracle-pairable.  Multi-column content is joined
    with an \\x1f separator (never appears in text) before hashing;
    each column is NULL-coalesced to a distinct \\x00-sentinel first —
    concat_ws silently SKIPS NULLs, so without the sentinel ('a', NULL),
    (NULL, 'a') and ('a',) would all fingerprint identically and a
    change that nulls out or moves content between columns would read
    ``unchanged`` (round-15 advice)."""
    fp = F.md5(
        F.concat_ws(
            "\x1f",
            *[
                F.coalesce(F.col(c).cast("string"), F.lit("\x00null"))
                for c in content_cols
            ],
        )
    )
    o = old.select(F.col(id_col), fp.alias("__fp_old"))
    n = new.select(F.col(id_col), fp.alias("__fp_new"))
    j = o.join(n, id_col, "full_outer")
    status = (
        F.when(F.col("__fp_old").isNull(), F.lit("added"))
        .when(F.col("__fp_new").isNull(), F.lit("removed"))
        .when(F.col("__fp_old") != F.col("__fp_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(F.col(id_col), status.alias("status"))


def mixture_sample(
    df: DataFrame,
    weights: dict[str, float],
    budget_tokens: int,
    strata_col: str = "lang",
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
) -> tuple[DataFrame, dict[str, float]]:
    """Domain-mixture sampling: derive per-stratum rates so the selected
    corpus totals ~``budget_tokens`` tokens split across strata in
    proportion to ``weights``, then select with the same deterministic
    md5(id) predicate as deterministic_sample (re-runnable; previously
    selected docs stay selected when the corpus grows).

    The training-data "mixing" step: given target proportions (possibly
    temperature-flattened upstream), compute rate_s = min(1,
    budget*w_s/sum(w)/T_s) from one per-stratum token-sum aggregate
    (O(strata) driver rows).  A stratum with fewer tokens than its target
    caps at rate 1 and undershoots — deliberately NOT redistributed to
    other strata, which would change every other stratum's rate whenever
    one stratum grows (breaking re-runnability).  Expected sampled tokens
    per stratum ≈ rate_s * T_s (md5 is uniform and independent of token
    counts).

    Returns (sampled DataFrame, the computed rates) so callers can log or
    re-apply them.
    """
    total_w = sum(weights.values())
    if total_w <= 0:
        raise ValueError("weights must sum to a positive value")
    avail = {
        r[strata_col]: r["__t"]
        for r in df.groupBy(strata_col)
        .agg(F.sum(F.col(token_col).cast("long")).alias("__t"))
        .collect()
    }
    rates = {
        s: min(1.0, (budget_tokens * w / total_w) / avail[s])
        for s, w in weights.items()
        if avail.get(s)
    }
    return deterministic_sample(df, rates, strata_col, id_col), rates


def temperature_weights(
    df: DataFrame,
    alpha: float = 0.5,
    strata_col: str = "source",
    token_col: str | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Temperature-scaled mixture weights per stratum — the upstream of
    ``mixture_sample`` (the T5/multilingual-LM recipe): raw token shares
    p_s = T_s/ΣT get flattened to w_s = T_s^α / Σ T_j^α, boosting
    low-resource strata as α → 0 (α=1 is proportional, α=0 uniform).

    Returns (strata, n_docs, n_tokens, weight, epochs): ``weight`` is
    the training-mixture share; ``epochs`` = weight·ΣT/T_s is how many
    passes over the stratum a proportional sampler at that share
    implies (>1 flags upsampling/repetition of small strata).

    One hash aggregate (O(strata) rows) + a 1-row broadcast total —
    fully in-plan, no driver collect.  The default α=0.5 is spelled
    ``sqrt`` (IEEE-exact, so both engines agree bit-for-bit before the
    1e-6 rounding); other α use pow(), where the last-ulp is engine
    math-library territory and only the rounded outputs are contracted.
    ``token_col`` counts precomputed per-doc tokens; None tokenizes
    ``text_col`` with the standard word_tokens split."""
    from influxdb_iox_spark.pipeline.text import word_tokens

    if token_col is not None:
        toks = F.sum(F.col(token_col).cast("long"))
    else:
        toks = F.sum(F.size(word_tokens(F.col(text_col))).cast("long"))
    per = df.groupBy(strata_col).agg(
        F.count("*").alias("n_docs"), toks.alias("n_tokens")
    )
    scaled = (
        F.sqrt(F.col("n_tokens").cast("double"))
        if alpha == 0.5
        else F.pow(F.col("n_tokens").cast("double"), F.lit(float(alpha)))
    )
    per = per.withColumn("__sc", scaled)
    totals = per.agg(
        F.sum("__sc").alias("__z"), F.sum("n_tokens").alias("__tt")
    )
    micro = lambda c: F.round(c * 1_000_000) / 1_000_000
    return (
        per.crossJoin(F.broadcast(totals))  # 1-row totals, in-plan
        .select(
            strata_col,
            "n_docs",
            "n_tokens",
            micro(F.col("__sc") / F.col("__z")).alias("weight"),
            micro(
                (F.col("__sc") / F.col("__z"))
                * F.col("__tt").cast("double")
                / F.col("n_tokens").cast("double")
            ).alias("epochs"),
        )
    )


def shuffle_into_shards(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Deterministic global shuffle for training order: every document
    gets a (shard, pos) address that is a pure function of (seed, id) —
    the same permutation on every run, every cluster layout, every
    engine.  Reading shards 0..n−1 in pos order replays the shuffled
    corpus; a training job resumes from a (shard, pos) cursor with no
    driver state (the data-order reproducibility requirement of any
    training pipeline: re-runs and elastic restarts must see the same
    sample order).

    Mechanics: key = md5(seed ‖ ':' ‖ id) — a seeded, uniform,
    engine-portable hash; shard = int(first 8 hex chars) mod n_shards;
    pos = row_number within the shard ordered by (key, id).  The window
    partitions BY SHARD, so position assignment parallelizes across
    shards (never a global single-partition window); ties are impossible
    (the id is in the key and the tiebreak).  Output: id, shard, pos.
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    key = F.md5(
        F.concat(F.lit(str(seed)), F.lit(":"), F.col(id_col).cast("string"))
    )
    h32 = F.conv(F.substring(key, 1, 8), 16, 10).cast("long")
    base = df.select(
        F.col(id_col),
        key.alias("__key"),
        F.pmod(h32, F.lit(n_shards)).cast("int").alias("shard"),
    )
    w = Window.partitionBy("shard").orderBy("__key", id_col)
    return base.select(
        F.col(id_col),
        "shard",
        F.row_number().over(w).cast("long").alias("pos"),
    )
