"""Interactive SQL REPL — the ``influxdb_iox sql`` command
(src/commands/sql/{repl,repl_command,observer}.rs).

Command grammar is a faithful port of repl_command.rs (its unit vectors
are pinned in tests/test_repl.py): tokens are case-insensitive, a single
trailing semicolon is chopped before matching, anything unrecognized is
SQL *carrying the original string verbatim* (including the semicolon and
surrounding whitespace — the reference passes ``self`` through).
Input-loop semantics match repl.rs: a bare ``exit``/``quit`` line ends
the session immediately when the buffer is empty; otherwise lines
accumulate (joined with spaces) until one ends with ``;``.

OBSERVER mode (observer.rs): pulls ``system.{chunks, chunk_columns,
columns, operations}`` from EVERY database on the server, prepends a
``database`` column, and registers the unions as local tables queried
with the stdlib sqlite3 engine — one local view per system table,
spanning every database at once.  (The reference uses an embedded
DataFusion context; the local-engine choice is an implementation detail
of the client binary, not the server.)
"""

from __future__ import annotations

import json
from dataclasses import dataclass


class ReplParseError(Exception):
    pass


@dataclass(frozen=True)
class Help:
    pass


@dataclass(frozen=True)
class ShowDatabases:
    pass


@dataclass(frozen=True)
class Observer:
    pass


@dataclass(frozen=True)
class Exit:
    pass


@dataclass(frozen=True)
class UseDatabase:
    db_name: str


@dataclass(frozen=True)
class SetFormat:
    format: str


@dataclass(frozen=True)
class SqlCommand:
    sql: str


def parse_repl_command(text: str):
    """repl_command.rs try_into, including its quirks: ``help me;`` is
    Help (tail ignored), ``observer me`` falls through to SQL,
    ``use database`` without a name is an error, four-token ``use
    database foo bar`` falls through to SQL, and SQL keeps the ORIGINAL
    string untrimmed."""
    if not text.strip():
        raise ReplParseError("No command specified")
    stripped = text.strip()
    if stripped.endswith(";"):
        stripped = stripped[: -1]
    raw = [t for t in stripped.split(" ") if t.strip()]
    low = [t.lower() for t in raw]
    if low[:1] == ["help"]:
        return Help()  # tokens after 'help' are ignored (warned upstream)
    if low == ["observer"]:
        return Observer()
    if low in (["exit"], ["quit"]):
        return Exit()
    if low == ["use", "database"]:
        raise ReplParseError(
            "name not specified. Usage: USE DATABASE <name>"
        )
    if len(low) == 3 and low[:2] == ["use", "database"]:
        return UseDatabase(raw[2])
    if len(low) == 2 and low[0] == "use":
        return UseDatabase(raw[1])
    if low == ["show", "databases"]:
        return ShowDatabases()
    if len(low) == 3 and low[:2] == ["set", "format"]:
        return SetFormat(raw[2])
    return SqlCommand(text)


HELP_TEXT = """
Commands (case-insensitive; everything else runs as SQL):
  HELP                    -- this text
  SHOW DATABASES          -- databases hosted by the server
  USE [DATABASE] <name>   -- pick the database later SQL runs against
  SET FORMAT <f>          -- result rendering: pretty, csv, or json
  OBSERVER                -- pull every database's system tables into a
                             local engine and query them as one view
  EXIT / QUIT             -- leave the session
"""

_FORMATS = ("pretty", "csv", "json")
_OBSERVER_TABLES = ("chunks", "chunk_columns", "columns", "operations")


def _is_exit_command(line: str) -> bool:
    return line.rstrip().lower() in ("exit", "quit")


class Repl:
    """Drives commands against an IoxClient.  ``lines`` is any iterator
    of input lines (sys.stdin in the CLI, a list in tests); output goes
    through ``out`` (a write() callable target)."""

    def __init__(self, client, out=None) -> None:
        import sys

        self.client = client
        self.out = out if out is not None else sys.stdout
        self.db_name: str | None = None
        self.format = "pretty"
        self._observer_con = None  # sqlite3 connection in observer mode

    def _print(self, msg: str) -> None:
        self.out.write(msg + "\n")

    # -- input loop (repl.rs next_command) --------------------------------
    def run(self, lines) -> None:
        buffer = ""
        for line in lines:
            if _is_exit_command(line) and not buffer:
                break
            if line.rstrip().endswith(";"):
                request = buffer + line.rstrip()
                buffer = ""
                try:
                    cmd = parse_repl_command(request)
                except ReplParseError as e:
                    self._print(f"Error parsing command: {e}")
                    continue
                if isinstance(cmd, Exit):
                    break
                self.dispatch(cmd)
            else:
                buffer += line.rstrip("\n") + " "

    # -- dispatch ----------------------------------------------------------
    def dispatch(self, cmd) -> None:
        try:
            if isinstance(cmd, Help):
                self._print(HELP_TEXT)
            elif isinstance(cmd, ShowDatabases):
                for name in self.client.list_databases():
                    self._print(name)
            elif isinstance(cmd, UseDatabase):
                # validated against the server like the reference (which
                # refreshes remote state and errors on unknown names)
                names = self.client.list_databases()
                if cmd.db_name not in names:
                    self._print(f"Error: database not found: {cmd.db_name}")
                    return
                self.db_name = cmd.db_name
                self._observer_con = None
                self._print(
                    f"Remote mode enabled — SQL now runs against the "
                    f"server, querying database {cmd.db_name}"
                )
            elif isinstance(cmd, SetFormat):
                f = cmd.format.lower()
                if f not in _FORMATS:
                    self._print(f"Error: Unknown format type: {cmd.format}")
                    return
                self.format = f
                self._print(f"Output format set to {f}")
            elif isinstance(cmd, Observer):
                self._use_observer()
            elif isinstance(cmd, SqlCommand):
                self._run_sql(cmd.sql)
        except Exception as e:  # keep the session alive like the reference
            self._print(f"Error: {e}")

    # -- sql ----------------------------------------------------------------
    def _run_sql(self, sql: str) -> None:
        sql = sql.strip().rstrip(";")
        if self._observer_con is not None:
            self._print_rows_local(sql)
            return
        if self.db_name is None:
            self._print(
                "Error: no database selected. Use USE DATABASE <name> or OBSERVER"
            )
            return
        result = self.client.query(self.db_name, sql, fmt=self.format)
        if self.format == "json":
            self._print(json.dumps(result))
        else:
            self._print(str(result).rstrip("\n"))

    # -- observer (observer.rs) ----------------------------------------------
    def _use_observer(self) -> None:
        import sqlite3

        con = sqlite3.connect(":memory:")
        dbs = self.client.list_databases()
        for table in _OBSERVER_TABLES:
            rows: list[dict] = []
            fetched = 0
            for db in dbs:
                try:
                    # the engine registers system tables as flat
                    # ``system_<name>`` session views (database.py
                    # register_views) — the observer's remote query uses
                    # those names
                    res = self.client.query(
                        db, f"select * from system_{table}", fmt="json"
                    )
                except Exception:
                    continue  # a database without this table is skipped
                fetched += 1
                for r in res:
                    rows.append({"database": db, **r})
            if dbs and not fetched:
                # every database refused: say so instead of silently
                # registering an empty view (a naming/regression bug
                # would otherwise masquerade as an idle server)
                self._print(
                    f"Warning: system table {table!r} unavailable on all "
                    f"{len(dbs)} databases"
                )
            cols: list[str] = ["database"]
            for r in rows:
                for c in r:
                    if c not in cols:
                        cols.append(c)
            col_ddl = ", ".join(f'"{c}"' for c in cols)
            con.execute(f'CREATE TABLE "{table}" ({col_ddl})')
            if rows:
                placeholders = ", ".join("?" for _ in cols)
                con.executemany(
                    f'INSERT INTO "{table}" VALUES ({placeholders})',
                    [
                        tuple(_sqlite_value(r.get(c)) for c in cols)
                        for r in rows
                    ],
                )
        self._observer_con = con
        self.db_name = None
        self._print(
            "You are now in Observer mode; local queries run over remote "
            f"system tables: {', '.join(_OBSERVER_TABLES)}"
        )

    def _print_rows_local(self, sql: str) -> None:
        cur = self._observer_con.execute(sql)
        cols = [d[0] for d in cur.description] if cur.description else []
        rows = cur.fetchall()
        if self.format == "json":
            self._print(
                json.dumps([dict(zip(cols, r)) for r in rows])
            )
        elif self.format == "csv":
            self._print(",".join(_csv_cell(c) for c in cols))
            for r in rows:
                self._print(",".join(_csv_cell(v) for v in r))
        else:  # pretty
            rendered = [
                ["" if v is None else str(v) for v in r] for r in rows
            ]
            widths = [
                max(len(str(c)), *(len(r[i]) for r in rendered))
                if rendered
                else len(str(c))
                for i, c in enumerate(cols)
            ]
            self._print(
                " | ".join(str(c).ljust(w) for c, w in zip(cols, widths))
            )
            for r in rendered:
                self._print(
                    " | ".join(v.ljust(w) for v, w in zip(r, widths))
                )


def _sqlite_value(v):
    if isinstance(v, (dict, list)):
        return json.dumps(v)
    return v


def _csv_cell(v) -> str:
    """Minimal RFC-4180 quoting: a value containing a comma, quote, or
    newline is wrapped (inner quotes doubled), so downstream CSV parsers
    see the right column count."""
    s = "" if v is None else str(v)
    if any(c in s for c in ',"\n\r'):
        return '"' + s.replace('"', '""') + '"'
    return s
