"""InfluxQL AST node types (public spec:
https://docs.influxdata.com/influxdb/v1/query_language/spec/).

Only plain-data dataclasses — parsing lives in parser.py, lowering in
planner.py."""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum


# -- expressions -------------------------------------------------------------


@dataclass(frozen=True)
class VarRef:
    """A column reference (tag or field; bare or double-quoted)."""

    name: str


@dataclass(frozen=True)
class Literal:
    """Number / string / duration / regex literal.

    kind: 'int' | 'float' | 'string' | 'duration' (value in ns) |
    'regex'."""

    kind: str
    value: object


@dataclass(frozen=True)
class Call:
    """Function call: aggregate, selector, or transform."""

    func: str  # lower-cased
    args: tuple  # VarRef | Literal | Call


@dataclass(frozen=True)
class BinaryExpr:
    """Condition-tree node for WHERE."""

    op: str  # '=' '!=' '>' '>=' '<' '<=' '=~' '!~' 'AND' 'OR'
    left: object
    right: object


# -- statements --------------------------------------------------------------


class FillOption(str, Enum):
    """GROUP BY fill() menu (spec: data exploration, GROUP BY time)."""

    NONE = "none"  # omit empty buckets (our default)
    NULL = "null"
    PREVIOUS = "previous"
    LINEAR = "linear"
    VALUE = "value"


@dataclass(frozen=True)
class Projection:
    expr: object  # VarRef | Call
    alias: str | None = None


@dataclass
class SelectStatement:
    projections: list[Projection]
    measurement: str | None  # single FROM name (None for sub/regex/multi)
    where: object | None = None  # BinaryExpr tree
    from_sub: object | None = None  # SelectStatement subquery FROM
    from_regex: str | None = None  # FROM /regex/ over measurement names
    from_names: list[str] | None = None  # FROM m1, m2, ... (multi)
    into: str | None = None  # SELECT ... INTO <measurement> writeback
    group_by_tags: list[str] = field(default_factory=list)
    group_by_time_ns: int | None = None
    group_by_offset_ns: int = 0
    fill: FillOption = FillOption.NONE
    fill_value: float | None = None
    order_desc: bool = False  # ORDER BY time DESC
    limit: int | None = None  # points per series
    offset: int = 0
    slimit: int | None = None  # series
    soffset: int = 0
    tz: str | None = None  # tz('Zone/Name'): zone-local buckets + output


@dataclass(frozen=True)
class ExplainStatement:
    """EXPLAIN [ANALYZE] <select> — the plan as rows (here: Catalyst's
    formatted physical plan, the engine-appropriate answer)."""

    select: "SelectStatement"
    analyze: bool = False


@dataclass(frozen=True)
class CreateDatabase:
    """CREATE DATABASE <name> [WITH ...] — client-library onboarding."""

    name: str


@dataclass(frozen=True)
class DropDatabase:
    """DROP DATABASE <name>."""

    name: str


@dataclass(frozen=True)
class CreateRetentionPolicy:
    """CREATE RETENTION POLICY <name> ON <db> DURATION d REPLICATION n
    [SHARD DURATION d] [DEFAULT].  Since round 12 the DURATION is parsed
    and ENFORCED (retention.py: chunk drops + a boundary tombstone);
    REPLICATION/SHARD DURATION remain accepted-and-ignored
    (single-tenant server; chunks are the shard-group analogue)."""

    name: str
    db: str
    #: ns; 0 = INF (keep forever).  None when the clause was omitted.
    duration_ns: int | None = None
    default: bool = False


@dataclass(frozen=True)
class AlterRetentionPolicy:
    """ALTER RETENTION POLICY <name> ON <db> [DURATION d] [DEFAULT] —
    DURATION/DEFAULT update the enforced policy (retention.py); other
    clauses accepted-and-ignored."""

    name: str
    db: str
    duration_ns: int | None = None
    default: bool = False


@dataclass(frozen=True)
class DropRetentionPolicy:
    """DROP RETENTION POLICY <name> ON <db> — accepted for client
    compatibility (same reason as ALTER)."""

    name: str
    db: str


@dataclass
class DropSeries:
    """DROP SERIES [FROM m [, m2] | /re/] [WHERE tag-conds] — stock 1.x:
    deletes whole series (all time).  WHERE is tag-only; time conditions
    are rejected at lowering (stock restriction)."""

    from_names: list[str] | None = None
    from_regex: str | None = None
    where: object | None = None


@dataclass(frozen=True)
class DropMeasurement:
    """DROP MEASUREMENT <name> — drop every chunk and the schema."""

    name: str


@dataclass(frozen=True)
class DropShard:
    """DROP SHARD <id> — the stock 1.x ops statement; a shard maps onto
    a chunk here (the SHOW SHARDS analogue), so this drops one chunk by
    id via the manifest tombstone path."""

    shard_id: int


@dataclass
class DeleteStatement:
    """DELETE [FROM m [, m2] | /re/] [WHERE conds] — stock 1.x delete.
    WHERE is restricted (tags + time only) and validated at lowering;
    no FROM means every measurement."""

    from_names: list[str] | None = None
    from_regex: str | None = None
    where: object | None = None  # BinaryExpr tree


@dataclass(frozen=True)
class CreateContinuousQuery:
    """CREATE CONTINUOUS QUERY <name> ON <db> [RESAMPLE [EVERY d] [FOR d]]
    BEGIN <select-into> END (stock 1.x continuous-query DDL)."""

    name: str
    db: str
    select: "SelectStatement"
    resample_every_ns: int | None = None
    resample_for_ns: int | None = None


@dataclass(frozen=True)
class DropContinuousQuery:
    """DROP CONTINUOUS QUERY <name> ON <db>."""

    name: str
    db: str


@dataclass(frozen=True)
class CreateSubscription:
    """CREATE SUBSCRIPTION "name" ON db.rp DESTINATIONS ALL|ANY 'url',…"""

    name: str
    db: str
    rp: str
    mode: str  # 'ALL' | 'ANY'
    destinations: tuple

@dataclass(frozen=True)
class DropSubscription:
    """DROP SUBSCRIPTION "name" ON db.rp."""

    name: str
    db: str
    rp: str


@dataclass(frozen=True)
class KillQuery:
    """KILL QUERY <qid> — cancel a tracked statement's Spark job group."""

    qid: int


@dataclass(frozen=True)
class CreateUser:
    """CREATE USER <name> WITH PASSWORD '<pw>' [WITH ALL PRIVILEGES]."""

    name: str
    password: str
    admin: bool = False


@dataclass(frozen=True)
class DropUser:
    """DROP USER <name>."""

    name: str


@dataclass(frozen=True)
class SetPassword:
    """SET PASSWORD FOR <name> = '<pw>'."""

    name: str
    password: str


@dataclass(frozen=True)
class GrantStatement:
    """GRANT READ|WRITE|ALL [PRIVILEGES] ON <db> TO <user>, or the
    cluster-admin form GRANT ALL [PRIVILEGES] TO <user> (db None)."""

    privilege: str  # 'read' | 'write' | 'all'
    db: str | None
    user: str


@dataclass(frozen=True)
class RevokeStatement:
    """REVOKE … ON <db> FROM <user> / REVOKE ALL [PRIVILEGES] FROM <user>."""

    privilege: str
    db: str | None
    user: str


@dataclass
class ShowStatement:
    """SHOW MEASUREMENTS | TAG KEYS | TAG VALUES | FIELD KEYS | SERIES |
    DATABASES | RETENTION POLICIES | CONTINUOUS QUERIES."""

    what: str  # 'measurements' | 'tag keys' | 'tag values' | 'field keys'
    #            | 'series' | 'databases' | 'retention policies'
    #            | 'continuous queries'
    measurement: str | None = None
    with_key: str | None = None  # SHOW TAG VALUES ... WITH KEY = <k>
    with_keys: list[str] | None = None  # ... WITH KEY IN (k1, k2)
    with_key_regex: str | None = None  # ... WITH KEY =~ /re/
    on_db: str | None = None  # SHOW RETENTION POLICIES ON <db>
    with_measurement: str | None = None  # SHOW MEASUREMENTS WITH MEASUREMENT =
    with_measurement_regex: str | None = None  # ... =~ /re/
    where: object | None = None  # SHOW ... WHERE (tag keys/values, series)
    limit: int | None = None
    offset: int = 0
    for_component: str | None = None  # SHOW STATS FOR '<component>'
    for_user: str | None = None  # SHOW GRANTS FOR <user>
    exact: bool = False  # SHOW <kind> EXACT CARDINALITY


@dataclass(frozen=True)
class Measurement:
    """Planner-side binding of a measurement name to a DataFrame and its
    iox-style column roles (the catalog entry the FROM clause resolves
    against)."""

    df: object  # pyspark DataFrame
    tags: tuple
    fields: tuple
    time_col: str = "time"
    #: optional (cells DataFrame, meta) series-cardinality rollup
    #: (pipeline/cardinality.py): SHOW SERIES CARDINALITY answers from
    #: it when the statement's WHERE is coverable; the EXACT keyword
    #: always rescans.
    series_rollup: object = None
