"""Portable deterministic randomness — the md5-uniform / Gumbel recipe.

One spelling, shared by every operator that draws reproducible
pseudo-randomness from (seed, id) — ``dsir.dsir_resample`` and
``corpus.stratified_weighted_sample`` previously each spelled it
inline (round-16 review: the two copies must stay bit-identical for
their oracle twins to agree; a tweak to one would silently fork the
portable-randomness contract).

DuckDB twin of ``md5_uniform``::

    (CAST(('0x' || substr(md5('<seed>:' || CAST(id AS VARCHAR)), 1, 8))
          AS BIGINT) + 0.5) / 4294967296.0
"""

from __future__ import annotations

from pyspark.sql import functions as F


def md5_uniform(seed: int | str, id_col) -> F.Column:
    """Uniform (0, 1) double, a pure function of (seed, id): the
    leading 32 bits of md5(seed ':' id), centered (+0.5) so u is never
    exactly 0 or 1 — both log(u) and log(-log(u)) stay finite."""
    h32 = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(str(seed)), F.lit(":"), id_col.cast("string")
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    return (h32.cast("double") + F.lit(0.5)) / F.lit(float(2**32))


def gumbel_key(seed: int | str, id_col, log_weight) -> F.Column:
    """Efraimidis–Spirakis / Gumbel top-k key: ``log w + Gumbel(0,1)``
    with the Gumbel noise −ln(−ln u) derived from ``md5_uniform`` — the
    k largest keys are a weight-proportional sample without
    replacement, deterministically."""
    return log_weight - F.log(-F.log(md5_uniform(seed, id_col)))
