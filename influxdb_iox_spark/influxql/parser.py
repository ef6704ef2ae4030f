"""Hand-rolled InfluxQL lexer + recursive-descent parser for the SELECT /
SHOW subset this engine lowers (public spec:
https://docs.influxdata.com/influxdb/v1/query_language/spec/).

Supported grammar (case-insensitive keywords):

    select_stmt := SELECT projection (',' projection)* FROM measurement
                   [WHERE cond]
                   [GROUP BY group_item (',' group_item)* [FILL '(' fill ')']]
                   [ORDER BY time [ASC|DESC]]
                   [LIMIT n] [OFFSET n] [SLIMIT n] [SOFFSET n]
    projection  := expr [AS ident]
    expr        := mul_expr (('+'|'-') mul_expr)*          # arithmetic
    mul_expr    := unary (('*'|'/'|'%') unary)*
    unary       := '-' unary | '(' expr ')' | primary
    primary     := ident '(' expr_args ')' | ident | number
    cond        := disjunction of conjunctions of comparisons, parenthesized
    comparison  := operand ('='|'!='|'<>'|'>'|'>='|'<'|'<='|'=~'|'!~') operand
    operand     := ident | literal | time_expr
    time_expr   := NOW() [('+'|'-') duration] | duration | int | rfc3339 string
    group_item  := TIME '(' duration [',' duration] ')' | ident | '*'
    show_stmt   := SHOW MEASUREMENTS
                 | SHOW TAG KEYS [FROM measurement]
                 | SHOW TAG VALUES [FROM measurement] WITH KEY '=' ident
                 | SHOW FIELD KEYS [FROM measurement]

Durations: concatenated <int><unit> parts (e.g. ``1h30m``); units
ns, u, µ, ms, s, m, h, d, w (spec "durations").  Regexes are lexed only
where the grammar allows them (after =~ / !~ and as a FROM target is NOT
supported — measurement regexes are out of scope).
"""

from __future__ import annotations

import re

from influxdb_iox_spark.influxql.ast_nodes import (
    BinaryExpr,
    Call,
    AlterRetentionPolicy,
    CreateContinuousQuery,
    CreateDatabase,
    CreateRetentionPolicy,
    CreateSubscription,
    CreateUser,
    DeleteStatement,
    DropDatabase,
    DropContinuousQuery,
    DropMeasurement,
    DropShard,
    DropRetentionPolicy,
    DropSeries,
    DropSubscription,
    DropUser,
    ExplainStatement,
    FillOption,
    GrantStatement,
    KillQuery,
    Literal,
    Projection,
    RevokeStatement,
    SelectStatement,
    SetPassword,
    ShowStatement,
    VarRef,
)


class InfluxQLParseError(ValueError):
    pass


_DURATION_NS = {
    "ns": 1,
    "u": 1_000,
    "µ": 1_000,
    "ms": 1_000_000,
    "s": 1_000_000_000,
    "m": 60 * 1_000_000_000,
    "h": 3_600 * 1_000_000_000,
    "d": 86_400 * 1_000_000_000,
    "w": 7 * 86_400 * 1_000_000_000,
}

_DUR_PART = re.compile(r"(\d+)(ns|us|u|µ|ms|s|m|h|d|w)")

_TOKEN = re.compile(
    r"""\s*(?:
        (?P<dur>\d+(?:ns|us|u|µ|ms|h|d|w)(?:\d+(?:ns|us|u|µ|ms|s|m|h|d|w))*
              |\d+(?:s|m)(?:\d+(?:ns|us|u|µ|ms|s|m|h|d|w))+
              |\d+(?:s|m)(?![\d.eE]))   # lone Ns/Nm only when not a number
      | (?P<num>\d+\.\d+(?:[eE][+-]?\d+)?|\.\d+|\d+(?:[eE][+-]?\d+)?)
      | (?P<qident>"(?:[^"\\]|\\.)*")
      | (?P<str>'(?:[^'\\]|\\.)*')
      | (?P<ident>[A-Za-z_][A-Za-z0-9_.]*)
      | (?P<op><>|!=|>=|<=|=~|!~|::|[=<>(),*+\-/%.])
    )""",
    re.VERBOSE,
)


def duration_to_ns(text: str) -> int:
    """``1h30m`` → ns.  Raises on trailing garbage."""
    total, pos = 0, 0
    for m in _DUR_PART.finditer(text):
        if m.start() != pos:
            raise InfluxQLParseError(f"bad duration {text!r}")
        unit = m.group(2)
        unit = {"us": "u"}.get(unit, unit)
        total += int(m.group(1)) * _DURATION_NS[unit]
        pos = m.end()
    if pos != len(text) or total == 0 and text not in ("0ns",):
        if pos != len(text):
            raise InfluxQLParseError(f"bad duration {text!r}")
    return total


def _extract_regexes(text: str) -> tuple[str, list[str]]:
    """Replace each regex literal with a quoted marker string BEFORE
    lexing ('/' is ambiguous between regex delimiter and division, but
    the grammar only allows a regex right after ``=~`` / ``!~`` or as a
    ``FROM`` target).  Quote-aware, so an =~ inside a string literal is
    left alone.  ``\\/`` inside the regex unescapes to '/'; every other
    backslash passes through untouched (Rust-regex escapes, not string
    escapes)."""
    out: list[str] = []
    regs: list[str] = []
    i, n = 0, len(text)
    quote: str | None = None

    def take_regex(j: int) -> int:
        """Starting at whitespace-or-'/' position j, consume an optional
        /regex/ and append its marker; return the new position."""
        while j < n and text[j].isspace():
            j += 1
        if j >= n or text[j] != "/":
            return -1  # no regex: caller keeps scanning from i
        k = j + 1
        pat: list[str] = []
        closed = False
        while k < n:
            if text[k] == "\\" and k + 1 < n:
                if text[k + 1] == "/":
                    pat.append("/")
                else:
                    pat.append(text[k])
                    pat.append(text[k + 1])
                k += 2
                continue
            if text[k] == "/":
                k += 1
                closed = True
                break
            pat.append(text[k])
            k += 1
        if not closed:
            raise InfluxQLParseError("unterminated regex")
        out.append(f" '\x00{len(regs)}\x00' ")
        regs.append("".join(pat))
        return k

    while i < n:
        c = text[i]
        if quote:
            out.append(c)
            if c == "\\" and i + 1 < n:
                out.append(text[i + 1])
                i += 2
                continue
            if c == quote:
                quote = None
            i += 1
            continue
        if c in ("'", '"'):
            quote = c
            out.append(c)
            i += 1
            continue
        if text.startswith(("=~", "!~"), i):
            out.append(text[i : i + 2])
            i += 2
            j = take_regex(i)
            if j >= 0:
                i = j
            continue
        if (
            c in "Ff"
            and text[i : i + 4].upper() == "FROM"
            and (i == 0 or not (text[i - 1].isalnum() or text[i - 1] == "_"))
            and (
                i + 4 >= n
                or not (text[i + 4].isalnum() or text[i + 4] == "_")
            )
        ):
            out.append(text[i : i + 4])
            i += 4
            j = take_regex(i)
            if j >= 0:
                i = j
            continue
        out.append(c)
        i += 1
    return "".join(out), regs


class _Lexer:
    def __init__(self, text: str):
        self.text = text
        self.pos = 0
        self.toks: list[tuple[str, str]] = []
        self._lex()

    def _lex(self) -> None:
        pos = 0
        while pos < len(self.text):
            m = _TOKEN.match(self.text, pos)
            if not m or m.end() == m.start():
                rest = self.text[pos:].lstrip()
                if not rest:
                    break
                raise InfluxQLParseError(
                    f"unexpected input at {pos}: {rest[:20]!r}"
                )
            pos = m.end()
            for kind in ("dur", "num", "qident", "str", "ident", "op"):
                v = m.group(kind)
                if v is not None:
                    self.toks.append((kind, v))
                    break


class _Parser:
    def __init__(self, text: str):
        clean, self.regexes = _extract_regexes(text)
        self.text = clean
        self.toks = _Lexer(clean).toks
        self.i = 0

    # -- token helpers ------------------------------------------------------

    def _peek(self) -> tuple[str, str] | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def _next(self) -> tuple[str, str]:
        t = self._peek()
        if t is None:
            raise InfluxQLParseError("unexpected end of query")
        self.i += 1
        return t

    def _kw(self, *words: str) -> bool:
        """Consume the keyword sequence if present (case-insensitive)."""
        save = self.i
        for w in words:
            t = self._peek()
            if t is None or t[0] != "ident" or t[1].upper() != w:
                self.i = save
                return False
            self.i += 1
        return True

    def _expect_kw(self, *words: str) -> None:
        if not self._kw(*words):
            raise InfluxQLParseError(
                f"expected {' '.join(words)} near token {self.i}"
            )

    def _expect_op(self, op: str) -> None:
        t = self._next()
        if t != ("op", op):
            raise InfluxQLParseError(f"expected {op!r}, got {t[1]!r}")

    def _ident(self) -> str:
        kind, v = self._next()
        if kind == "ident":
            return v
        if kind == "qident":
            return re.sub(r"\\(.)", r"\1", v[1:-1])
        raise InfluxQLParseError(f"expected identifier, got {v!r}")

    def _int(self) -> int:
        kind, v = self._next()
        if kind != "num" or not re.fullmatch(r"\d+", v):
            raise InfluxQLParseError(f"expected integer, got {v!r}")
        return int(v)

    def _string(self) -> str:
        kind, v = self._next()
        if kind != "str":
            raise InfluxQLParseError(f"expected a string literal, got {v!r}")
        return re.sub(r"\\(.)", r"\1", v[1:-1])

    def _rp_clauses(self) -> tuple[int | None, bool]:
        """Retention-policy clause tail: ``DURATION <dur|INF>`` and
        ``DEFAULT`` are meaningful (returned); ``REPLICATION <n>`` and
        ``SHARD DURATION <dur>`` are accepted-and-ignored (single-tenant
        server; chunks are the shard-group analogue).  Stock treats both
        INF and 0 as keep-forever → 0 ns."""
        duration: int | None = None
        default = False
        while self._peek() is not None:
            if self._kw("DURATION"):
                t = self._next()
                if t[0] == "ident" and t[1].upper() == "INF":
                    duration = 0
                elif t[0] == "dur":
                    duration = duration_to_ns(t[1])
                elif t[0] == "num" and t[1] == "0":
                    duration = 0
                else:
                    raise InfluxQLParseError(
                        f"expected a duration or INF, got {t[1]!r}"
                    )
            elif self._kw("REPLICATION"):
                self._int()
            elif self._kw("SHARD", "DURATION"):
                self._next()
            elif self._kw("DEFAULT"):
                default = True
            else:
                raise InfluxQLParseError(
                    f"unexpected token {self._peek()[1]!r} in retention "
                    "policy clauses"
                )
        return duration, default

    # -- statements ---------------------------------------------------------

    def parse_statement(self):
        if self._kw("EXPLAIN"):
            analyze = self._kw("ANALYZE")
            self._expect_kw("SELECT")
            inner = self._select_core()
            if self._peek() is not None:
                raise InfluxQLParseError("trailing input after EXPLAIN")
            return ExplainStatement(inner, analyze=analyze)
        if self._kw("SELECT"):
            return self._select()
        if self._kw("SHOW"):
            return self._show()
        if self._kw("DELETE"):
            return self._delete()
        if self._kw("CREATE", "CONTINUOUS", "QUERY"):
            return self._create_cq()
        if self._kw("CREATE", "DATABASE"):
            name = self._ident()
            # WITH DURATION/REPLICATION/NAME ... : accepted and ignored
            # (retention is lifecycle-rule driven here); consume the rest
            if self._kw("WITH"):
                self.i = len(self.toks)
            if self._peek() is not None:
                raise InfluxQLParseError("trailing input after CREATE DATABASE")
            return CreateDatabase(name)
        if self._kw("DROP", "DATABASE"):
            name = self._ident()
            if self._peek() is not None:
                raise InfluxQLParseError("trailing input after DROP DATABASE")
            return DropDatabase(name)
        if self._kw("CREATE", "RETENTION", "POLICY"):
            name = self._ident()
            self._expect_kw("ON")
            db = self._ident()
            dur, default = self._rp_clauses()
            return CreateRetentionPolicy(name, db, dur, default)
        if self._kw("ALTER", "RETENTION", "POLICY"):
            name = self._ident()
            self._expect_kw("ON")
            db = self._ident()
            dur, default = self._rp_clauses()
            return AlterRetentionPolicy(name, db, dur, default)
        if self._kw("DROP", "RETENTION", "POLICY"):
            name = self._ident()
            self._expect_kw("ON")
            db = self._ident()
            if self._peek() is not None:
                raise InfluxQLParseError(
                    "trailing input after DROP RETENTION POLICY"
                )
            return DropRetentionPolicy(name, db)
        if self._kw("DROP", "SERIES"):
            d = self._delete()  # same FROM/WHERE grammar as DELETE
            return DropSeries(d.from_names, d.from_regex, d.where)
        if self._kw("DROP", "SHARD"):
            sid = self._int()
            if self._peek() is not None:
                raise InfluxQLParseError("trailing input after DROP SHARD")
            return DropShard(sid)
        if self._kw("DROP", "MEASUREMENT"):
            name = self._ident()
            if self._peek() is not None:
                raise InfluxQLParseError("trailing input after DROP")
            return DropMeasurement(name)
        if self._kw("DROP", "CONTINUOUS", "QUERY"):
            name = self._ident()
            self._expect_kw("ON")
            db = self._ident()
            if self._peek() is not None:
                raise InfluxQLParseError("trailing input after DROP")
            return DropContinuousQuery(name, db)
        if self._kw("CREATE", "USER"):
            name = self._ident()
            self._expect_kw("WITH", "PASSWORD")
            pw = self._string()
            admin = bool(self._kw("WITH", "ALL", "PRIVILEGES"))
            if self._peek() is not None:
                raise InfluxQLParseError("trailing input after CREATE USER")
            return CreateUser(name, pw, admin)
        if self._kw("DROP", "USER"):
            name = self._ident()
            if self._peek() is not None:
                raise InfluxQLParseError("trailing input after DROP USER")
            return DropUser(name)
        if self._kw("SET", "PASSWORD"):
            self._expect_kw("FOR")
            name = self._ident()
            self._expect_op("=")
            pw = self._string()
            if self._peek() is not None:
                raise InfluxQLParseError("trailing input after SET PASSWORD")
            return SetPassword(name, pw)
        if self._kw("GRANT"):
            return self._grant_revoke(grant=True)
        if self._kw("REVOKE"):
            return self._grant_revoke(grant=False)
        if self._kw("CREATE", "SUBSCRIPTION"):
            name = self._ident()
            self._expect_kw("ON")
            db, rp = self._db_dot_rp()
            self._expect_kw("DESTINATIONS")
            if self._kw("ALL"):
                mode = "ALL"
            elif self._kw("ANY"):
                mode = "ANY"
            else:
                raise InfluxQLParseError("expected DESTINATIONS ALL or ANY")
            dests = [self._string()]
            while self._peek() == ("op", ","):
                self.i += 1
                dests.append(self._string())
            if self._peek() is not None:
                raise InfluxQLParseError(
                    "trailing input after CREATE SUBSCRIPTION"
                )
            return CreateSubscription(name, db, rp, mode, tuple(dests))
        if self._kw("DROP", "SUBSCRIPTION"):
            name = self._ident()
            self._expect_kw("ON")
            db, rp = self._db_dot_rp()
            if self._peek() is not None:
                raise InfluxQLParseError(
                    "trailing input after DROP SUBSCRIPTION"
                )
            return DropSubscription(name, db, rp)
        if self._kw("KILL", "QUERY"):
            qid = self._int()
            if self._peek() is not None:
                raise InfluxQLParseError("trailing input after KILL QUERY")
            return KillQuery(qid)
        raise InfluxQLParseError(
            "expected SELECT, SHOW, DELETE, CREATE/DROP DDL, GRANT/REVOKE "
            "or SET PASSWORD"
        )

    def _db_dot_rp(self) -> tuple[str, str]:
        """``db.rp`` — either two (possibly quoted) identifiers joined by
        '.', or one bare ident token that lexed WITH the dot (the lexer
        admits dots inside bare identifiers)."""
        first = self._ident()
        if self._peek() == ("op", "."):
            self.i += 1
            return first, self._ident()
        if "." in first:
            db, _, rp = first.partition(".")
            return db, rp
        raise InfluxQLParseError("expected db.retention_policy")

    def _grant_revoke(self, grant: bool):
        """GRANT|REVOKE READ|WRITE|ALL [PRIVILEGES] [ON db] TO|FROM user.
        The db-less form is only valid with ALL (cluster-admin toggle,
        enforced by the registry)."""
        if self._kw("ALL"):
            priv = "all"
            self._kw("PRIVILEGES")  # optional noise word
        elif self._kw("READ"):
            priv = "read"
        elif self._kw("WRITE"):
            priv = "write"
        else:
            raise InfluxQLParseError("expected READ, WRITE or ALL")
        db = self._ident() if self._kw("ON") else None
        self._expect_kw("TO" if grant else "FROM")
        user = self._ident()
        if self._peek() is not None:
            raise InfluxQLParseError(
                f"trailing input after {'GRANT' if grant else 'REVOKE'}"
            )
        cls = GrantStatement if grant else RevokeStatement
        return cls(priv, db, user)

    def _delete(self) -> DeleteStatement:
        """DELETE [FROM m[, m2] | /re/] [WHERE conds] (stock 1.x).  The
        WHERE restrictions (tags + time only, AND-combined, = / != ops)
        are enforced at lowering, where the catalog is known."""
        stmt = DeleteStatement()
        if self._kw("FROM"):
            targets = [self._from_target()]
            while self._peek() == ("op", ","):
                self.i += 1
                targets.append(self._from_target())
            kinds = {k for k, _ in targets}
            if "sub" in kinds:
                raise InfluxQLParseError("DELETE FROM takes measurements")
            if kinds == {"regex"} and len(targets) == 1:
                stmt.from_regex = targets[0][1]
            elif kinds == {"name"}:
                stmt.from_names = [v for _, v in targets]
            else:
                raise InfluxQLParseError(
                    "DELETE FROM takes measurement names or one /regex/"
                )
        if self._kw("WHERE"):
            stmt.where = self._cond()
        if self._peek() is not None:
            raise InfluxQLParseError("trailing input after DELETE")
        return stmt

    def _create_cq(self) -> CreateContinuousQuery:
        name = self._ident()
        self._expect_kw("ON")
        db = self._ident()
        every_ns = for_ns = None
        if self._kw("RESAMPLE"):
            if self._kw("EVERY"):
                d = self._next()
                if d[0] != "dur":
                    raise InfluxQLParseError("RESAMPLE EVERY needs a duration")
                every_ns = duration_to_ns(d[1])
            if self._kw("FOR"):
                d = self._next()
                if d[0] != "dur":
                    raise InfluxQLParseError("RESAMPLE FOR needs a duration")
                for_ns = duration_to_ns(d[1])
            if every_ns is None and for_ns is None:
                raise InfluxQLParseError("RESAMPLE needs EVERY and/or FOR")
        self._expect_kw("BEGIN")
        self._expect_kw("SELECT")
        select = self._select_core()
        self._expect_kw("END")
        if self._peek() is not None:
            raise InfluxQLParseError("trailing input after END")
        if select.into is None:
            raise InfluxQLParseError(
                "a continuous query's SELECT needs an INTO clause"
            )
        if select.group_by_time_ns is None:
            raise InfluxQLParseError(
                "a continuous query needs GROUP BY time(...)"
            )
        return CreateContinuousQuery(
            name, db, select,
            resample_every_ns=every_ns, resample_for_ns=for_ns,
        )

    def _show(self) -> ShowStatement:
        stmt = self._show_core()
        if self._kw("WHERE"):
            if stmt.what not in ("tag keys", "tag values", "series"):
                raise InfluxQLParseError(
                    f"SHOW {stmt.what.upper()} does not take WHERE"
                )
            stmt.where = self._cond()
        if self._kw("LIMIT"):
            stmt.limit = self._int()
        if self._kw("OFFSET"):
            stmt.offset = self._int()
        if self._peek() is not None:
            raise InfluxQLParseError("trailing input after SHOW")
        return stmt

    def _with_key_selector(self, stmt: ShowStatement) -> None:
        """WITH KEY (= key | =~ /regex/ | IN (k1, k2, …)) — shared by
        SHOW TAG VALUES and SHOW TAG VALUES [EXACT] CARDINALITY."""
        self._expect_kw("WITH", "KEY")
        if self._kw("IN"):
            self._expect_op("(")
            keys = [self._ident()]
            while self._peek() == ("op", ","):
                self.i += 1
                keys.append(self._ident())
            self._expect_op(")")
            stmt.with_keys = keys
        else:
            t = self._peek()
            if t == ("op", "=~"):
                self.i += 1
                stmt.with_key_regex = str(self._regex().value)
            else:
                self._expect_op("=")
                stmt.with_key = self._ident()

    def _show_core(self) -> ShowStatement:
        # cardinality family: SHOW <kind> [EXACT] CARDINALITY.  The EXACT
        # keyword is recorded: SHOW SERIES CARDINALITY answers from a
        # registered HLL series rollup when one covers the statement
        # (stock InfluxQL's estimated-vs-EXACT split); every other kind
        # — and EXACT — computes exact distinct counts.
        for words, what in (
            (("SERIES",), "series cardinality"),
            (("MEASUREMENT",), "measurement cardinality"),
            (("TAG", "KEY"), "tag key cardinality"),
            (("FIELD", "KEY"), "field key cardinality"),
            (("TAG", "VALUES"), "tag values cardinality"),
        ):
            save = self.i
            exact = False
            if self._kw(*words):
                if self._kw("EXACT", "CARDINALITY"):
                    exact = True
                elif not self._kw("CARDINALITY"):
                    self.i = save
                    continue
                stmt = ShowStatement(what)
                stmt.exact = exact
                if self._kw("FROM"):
                    stmt.measurement = self._ident()
                if what == "tag values cardinality":
                    # stock InfluxQL: the CARDINALITY form takes the same
                    # WITH KEY (= | =~ | IN) selector as the listing
                    self._with_key_selector(stmt)
                return stmt
            self.i = save
        if self._kw("MEASUREMENTS"):
            stmt = ShowStatement("measurements")
            if self._kw("WITH", "MEASUREMENT"):
                t = self._peek()
                if t == ("op", "=~"):
                    self.i += 1
                    stmt.with_measurement_regex = str(self._regex().value)
                else:
                    self._expect_op("=")
                    stmt.with_measurement = self._ident()
            return stmt
        if self._kw("DATABASES"):
            return ShowStatement("databases")
        if self._kw("RETENTION", "POLICIES"):
            on_db = self._ident() if self._kw("ON") else None
            return ShowStatement("retention policies", on_db=on_db)
        if self._kw("CONTINUOUS", "QUERIES"):
            return ShowStatement("continuous queries")
        if self._kw("STATS"):
            stmt = ShowStatement("stats")
            if self._kw("FOR"):
                kind, v = self._next()
                if kind == "str":
                    stmt.for_component = re.sub(r"\\(.)", r"\1", v[1:-1])
                elif kind in ("ident", "qident"):
                    self.i -= 1
                    stmt.for_component = self._ident()
                else:
                    raise InfluxQLParseError(
                        "SHOW STATS FOR expects a component name"
                    )
            return stmt
        if self._kw("DIAGNOSTICS"):
            stmt = ShowStatement("diagnostics")
            if self._kw("FOR"):
                kind, v = self._next()
                if kind == "str":
                    stmt.for_component = re.sub(r"\\(.)", r"\1", v[1:-1])
                elif kind in ("ident", "qident"):
                    self.i -= 1
                    stmt.for_component = self._ident()
                else:
                    raise InfluxQLParseError(
                        "SHOW DIAGNOSTICS FOR expects a component name"
                    )
            return stmt
        if self._kw("SHARD", "GROUPS"):
            return ShowStatement("shard groups")
        if self._kw("SHARDS"):
            return ShowStatement("shards")
        if self._kw("USERS"):
            return ShowStatement("users")
        if self._kw("QUERIES"):
            return ShowStatement("queries")
        if self._kw("SUBSCRIPTIONS"):
            return ShowStatement("subscriptions")
        if self._kw("GRANTS"):
            self._expect_kw("FOR")
            return ShowStatement("grants", for_user=self._ident())
        if self._kw("SERIES"):
            meas = self._ident() if self._kw("FROM") else None
            return ShowStatement("series", measurement=meas)
        for words, what in (
            (("TAG", "KEYS"), "tag keys"),
            (("TAG", "VALUES"), "tag values"),
            (("FIELD", "KEYS"), "field keys"),
        ):
            if self._kw(*words):
                meas = self._ident() if self._kw("FROM") else None
                stmt = ShowStatement(what, measurement=meas)
                if what == "tag values":
                    self._with_key_selector(stmt)
                return stmt
        raise InfluxQLParseError(
            "expected MEASUREMENTS, SERIES, DATABASES, RETENTION POLICIES, "
            "TAG KEYS, TAG VALUES or FIELD KEYS"
        )

    def _select(self) -> SelectStatement:
        stmt = self._select_core()
        if self._peek() is not None:
            raise InfluxQLParseError(
                f"trailing input: {self.toks[self.i:][:3]}"
            )
        return stmt

    def _from_target(self):
        """One FROM target → ('name', str) | ('regex', str) | ('sub', stmt)."""
        t = self._peek()
        if t == ("op", "("):
            self.i += 1
            self._expect_kw("SELECT")
            inner = self._select_core()
            self._expect_op(")")
            return ("sub", inner)
        if t is not None and t[0] == "str":
            body = t[1][1:-1]
            m = re.fullmatch(r"\x00(\d+)\x00", body)
            if m:
                self.i += 1
                return ("regex", self.regexes[int(m.group(1))])
        return ("name", self._ident())

    def _select_core(self) -> SelectStatement:
        projections = [self._projection()]
        while self._peek() == ("op", ","):
            self.i += 1
            projections.append(self._projection())
        into = self._into_target() if self._kw("INTO") else None
        self._expect_kw("FROM")
        targets = [self._from_target()]
        while self._peek() == ("op", ","):
            self.i += 1
            targets.append(self._from_target())

        where = self._cond() if self._kw("WHERE") else None

        kinds = {k for k, _ in targets}
        if len(targets) > 1 and kinds != {"name"}:
            raise InfluxQLParseError(
                "multi-target FROM supports plain measurement names only"
            )
        kind, val = targets[0]
        stmt = SelectStatement(
            projections,
            val if kind == "name" else None,
            where=where,
            from_sub=val if kind == "sub" else None,
            from_regex=val if kind == "regex" else None,
            from_names=(
                [v for _, v in targets] if len(targets) > 1 else None
            ),
            into=into,
        )
        if self._kw("GROUP", "BY"):
            self._group_by(stmt)
        if self._kw("FILL"):
            self._fill(stmt)
        if self._kw("ORDER", "BY"):
            if self._ident().lower() != "time":
                raise InfluxQLParseError("ORDER BY supports only time")
            if self._kw("DESC"):
                stmt.order_desc = True
            else:
                self._kw("ASC")
        if self._kw("LIMIT"):
            stmt.limit = self._int()
        if self._kw("OFFSET"):
            stmt.offset = self._int()
        if self._kw("SLIMIT"):
            stmt.slimit = self._int()
        if self._kw("SOFFSET"):
            stmt.soffset = self._int()
        if self._kw("TZ"):
            self._expect_op("(")
            t = self._next()
            if t[0] != "str":
                raise InfluxQLParseError("tz() needs a quoted zone name")
            stmt.tz = t[1][1:-1].replace("\\'", "'")
            self._expect_op(")")
        return stmt

    def _into_target(self) -> str:
        """INTO [db.][rp.]measurement — stock spells CQ destinations
        fully qualified ('"db"."rp"."m"' or db.rp.m); this engine is
        single-database with lifecycle-driven retention, so the
        measurement segment is the destination and the qualifiers are
        accepted and ignored."""
        parts = [self._ident()]
        while self._peek() == ("op", "."):
            self.i += 1
            parts.append(self._ident())
        # an unquoted dotted token lexes as ONE ident; split it the way
        # stock's parser does (dots separate qualifiers)
        if len(parts) == 1 and "." in parts[0]:
            parts = parts[0].split(".")
        if len(parts) > 3:
            raise InfluxQLParseError(
                "INTO target has too many qualifiers (db.rp.measurement)"
            )
        return parts[-1]

    def _projection(self) -> Projection:
        expr = self._expr()
        alias = self._ident() if self._kw("AS") else None
        return Projection(expr, alias)

    # Value-expression grammar (spec "expressions"): binary arithmetic
    # with the usual precedence — multiplicative (* / %) binds tighter
    # than additive (+ -); unary minus; parenthesized sub-expressions.
    # Comparisons stay in the WHERE condition grammar (_cond_atom).

    def _expr(self):
        left = self._mul_expr()
        while True:
            t = self._peek()
            if t is not None and t[0] == "op" and t[1] in ("+", "-"):
                self.i += 1
                left = BinaryExpr(t[1], left, self._mul_expr())
            else:
                return left

    def _mul_expr(self):
        left = self._unary_expr()
        while True:
            t = self._peek()
            if t is not None and t[0] == "op" and t[1] in ("*", "/", "%"):
                # '*' here is multiplication only when something follows
                # that can start an operand; a bare trailing '*' is the
                # wildcard (handled by _primary via SELECT *)
                self.i += 1
                left = BinaryExpr(t[1], left, self._unary_expr())
            else:
                return left

    def _unary_expr(self):
        t = self._peek()
        if t == ("op", "-"):
            self.i += 1
            inner = self._unary_expr()
            if isinstance(inner, Literal) and inner.kind in ("int", "float"):
                return Literal(inner.kind, -inner.value)
            return BinaryExpr("*", Literal("int", -1), inner)
        if t == ("op", "("):
            self.i += 1
            inner = self._expr()
            self._expect_op(")")
            return inner
        return self._primary()

    def _primary(self):
        kind, v = self._next()
        if kind in ("ident", "qident"):
            name = re.sub(r"\\(.)", r"\1", v[1:-1]) if kind == "qident" else v
            if self._peek() == ("op", "("):
                self.i += 1
                args: list = []
                if self._peek() != ("op", ")"):
                    args.append(self._expr())
                    while self._peek() == ("op", ","):
                        self.i += 1
                        args.append(self._expr())
                self._expect_op(")")
                return Call(name.lower(), tuple(args))
            if self._peek() == ("op", "::"):  # type cast suffix — ignored
                self.i += 1
                self._ident()
            return VarRef(name)
        if kind == "num":
            if re.fullmatch(r"\d+", v):
                return Literal("int", int(v))
            return Literal("float", float(v))
        if kind == "dur":
            return Literal("duration", duration_to_ns(v))
        if kind == "str":
            return Literal("string", re.sub(r"\\(.)", r"\1", v[1:-1]))
        if kind == "op" and v == "*":
            return VarRef("*")
        raise InfluxQLParseError(f"unexpected token {v!r} in expression")

    # -- WHERE condition tree ----------------------------------------------

    def _cond(self):
        left = self._cond_and()
        while self._kw("OR"):
            left = BinaryExpr("OR", left, self._cond_and())
        return left

    def _cond_and(self):
        left = self._cond_atom()
        while self._kw("AND"):
            left = BinaryExpr("AND", left, self._cond_atom())
        return left

    def _cond_atom(self):
        if self._peek() == ("op", "("):
            self.i += 1
            inner = self._cond()
            self._expect_op(")")
            return inner
        left = self._operand()
        kind, op = self._next()
        if kind != "op" or op not in ("=", "!=", "<>", ">", ">=", "<", "<=", "=~", "!~"):
            raise InfluxQLParseError(f"expected comparison operator, got {op!r}")
        if op == "<>":
            op = "!="
        if op in ("=~", "!~"):
            right = self._regex()
        else:
            right = self._operand()
        return BinaryExpr(op, left, right)

    def _operand(self):
        t = self._peek()
        if t is None:
            raise InfluxQLParseError("unexpected end in condition")
        kind, v = t
        if kind == "ident" and v.upper() == "NOW":
            self.i += 1
            self._expect_op("(")
            self._expect_op(")")
            base = Call("now", ())
            nxt = self._peek()
            if nxt is not None and nxt[0] == "op" and nxt[1] in ("+", "-"):
                self.i += 1
                dur = self._next()
                if dur[0] != "dur":
                    raise InfluxQLParseError("now() offset must be a duration")
                ns = duration_to_ns(dur[1])
                return Call("now_offset", (Literal("int", ns if nxt[1] == "+" else -ns),))
            return base
        return self._expr()

    def _regex(self):
        """A regex was pre-extracted into a '\\x00N\\x00' marker string by
        _extract_regexes; resolve the marker back to its pattern."""
        kind, v = self._next()
        if kind == "str":
            body = v[1:-1]
            m = re.fullmatch(r"\x00(\d+)\x00", body)
            if m:
                return Literal("regex", self.regexes[int(m.group(1))])
        raise InfluxQLParseError("expected /regex/ after =~ or !~")

    # -- GROUP BY / FILL ----------------------------------------------------

    def _group_by(self, stmt: SelectStatement) -> None:
        while True:
            t = self._peek()
            if t is not None and t[0] == "ident" and t[1].upper() == "TIME":
                save = self.i
                self.i += 1
                if self._peek() == ("op", "("):
                    self.i += 1
                    d = self._next()
                    if d[0] != "dur":
                        raise InfluxQLParseError("time() needs a duration")
                    stmt.group_by_time_ns = duration_to_ns(d[1])
                    if self._peek() == ("op", ","):
                        self.i += 1
                        sign = 1
                        nxt = self._peek()
                        if nxt is not None and nxt == ("op", "-"):
                            self.i += 1
                            sign = -1
                        d2 = self._next()
                        if d2[0] != "dur":
                            raise InfluxQLParseError("time() offset needs a duration")
                        stmt.group_by_offset_ns = sign * duration_to_ns(d2[1])
                    self._expect_op(")")
                else:
                    self.i = save
                    stmt.group_by_tags.append(self._ident())
            elif t == ("op", "*"):
                self.i += 1
                stmt.group_by_tags.append("*")
            else:
                stmt.group_by_tags.append(self._ident())
            if self._peek() == ("op", ","):
                self.i += 1
                continue
            return

    def _fill(self, stmt: SelectStatement) -> None:
        self._expect_op("(")
        sign = 1
        if self._peek() == ("op", "-"):
            self.i += 1
            sign = -1
        t = self._next()
        kind, v = t
        if sign == 1 and kind == "ident" and v.lower() in (
            "none", "null", "previous", "linear"
        ):
            stmt.fill = FillOption(v.lower())
        elif kind == "num":
            stmt.fill = FillOption.VALUE
            stmt.fill_value = sign * float(v)
        else:
            raise InfluxQLParseError(f"bad fill argument {v!r}")
        self._expect_op(")")


def parse(text: str):
    """Parse one InfluxQL statement → SelectStatement | ShowStatement."""
    return _Parser(text.strip().rstrip(";")).parse_statement()
