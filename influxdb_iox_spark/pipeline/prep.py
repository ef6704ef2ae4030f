"""corpus_prep: the standard training-data preparation chain, one call.

The canonical pipeline every corpus paper describes (C4, Gopher,
RefinedWeb): quality gate → blocklist gate → exact dedup → repeated-span
(segment) removal → near-dup drop → deterministic sample — composed from
the tested operators with a per-stage survivor ledger so a run is
auditable.

Each stage is the existing operator (pipeline/text.py, pipeline/dedup.py,
pipeline/corpus.py); this module only sequences them and records counts.
Stages toggle off by passing None for their config — the chain is data,
like quality_filter's rules.

Scale shape: the gates are map-only codegen filters (no shuffle); exact
dedup is one digest shuffle; near-dup is the banded MinHash path; the
sample is a deterministic hash gate (no shuffle).  Counting survivors
costs one action per enabled stage — pass ``count_stages=False`` to run
the whole chain as one lazy plan and skip the ledger.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from influxdb_iox_spark.pipeline.dedup import (
    drop_exact_duplicates,
    drop_near_duplicates,
    near_duplicate_pairs_minhash,
)
from influxdb_iox_spark.pipeline.text import (
    DEFAULT_QUALITY_RULES,
    blocklist_filter,
    quality_filter,
)


@dataclass
class PrepReport:
    """Per-stage survivor counts (the dedup-audit ledger)."""

    stages: list[tuple[str, int]] = field(default_factory=list)

    def add(self, name: str, n: int) -> None:
        self.stages.append((name, n))

    def as_dict(self) -> dict[str, int]:
        return dict(self.stages)


def corpus_prep(
    df: DataFrame,
    quality_rules: list[tuple] | None = DEFAULT_QUALITY_RULES,
    blocklist: list[str] | None = None,
    exact_dedup: bool = True,
    segment_words: int | None = None,
    segment_delimiter: str | None = None,
    near_dup_threshold: float | None = None,
    sample_rate: float | None = None,
    sample_seed: str = "prep",
    text_col: str = "text",
    id_col: str = "doc_id",
    count_stages: bool = True,
) -> tuple[DataFrame, PrepReport]:
    """Run the prep chain; returns (surviving documents, ledger)."""
    from pyspark.sql import functions as F

    report = PrepReport()

    def record(name: str, out: DataFrame) -> DataFrame:
        if count_stages:
            report.add(name, out.count())
        return out

    out = record("input", df)
    if quality_rules is not None:
        out = record(
            "quality", quality_filter(out, rules=quality_rules, text_col=text_col)
        )
    if blocklist:
        out = record("blocklist", blocklist_filter(out, blocklist, text_col))
    if exact_dedup:
        out = record("exact_dedup", drop_exact_duplicates(out, text_col, id_col))
    if segment_words is not None or segment_delimiter is not None:
        # repeated-span removal (CCNet/RefinedWeb) BETWEEN exact and
        # near-dup: rewrites surviving docs without their boilerplate
        # spans, so the near-dup stage judges real content only
        from influxdb_iox_spark.pipeline.paragraph import dedup_segments

        scrubbed = dedup_segments(
            out,
            text_col,
            id_col,
            delimiter=segment_delimiter,
            words_per_segment=segment_words,
        ).select(id_col, text_col)
        out = record(
            "segment_dedup",
            out.drop(text_col).join(scrubbed, on=id_col),
        )
    if near_dup_threshold is not None:
        pairs = near_duplicate_pairs_minhash(
            out, text_col=text_col, id_col=id_col, threshold=near_dup_threshold
        )
        out = record("near_dup", drop_near_duplicates(out, pairs, id_col))
    if sample_rate is not None:
        # deterministic md5 gate (the stratified-sample primitive with one
        # stratum): survives re-runs and corpus growth unchanged
        gate = (
            F.conv(F.substring(F.md5(F.concat_ws("\x00", F.lit(sample_seed),
                                                 F.col(id_col).cast("string"))), 1, 8),
                   16, 10).cast("double") / F.lit(float(0xFFFFFFFF))
        )
        out = record("sample", out.filter(gate < F.lit(sample_rate)))
    return out, report
