"""Redshift-dialect SQL rewriter: lets the reference's user-facing SQL
texts (sql/queries.sql, the stored-proc statement bodies, the initial-load
selects) run verbatim through ``Engine.run_sql(..., dialect="redshift")``.

A thin, ordered sequence of textual passes — not a SQL parser, but each
pass is paren- and quote-aware where it must be. Scope is the Redshift
surface the reference actually uses plus the obvious neighbours:

| Redshift                                   | Spark rewrite |
|--------------------------------------------|---------------|
| ``GETDATE()``                              | ``current_timestamp()`` |
| ``expr::type`` postfix cast                | ``CAST(expr AS type)`` |
| ``x::varchar(n)`` / ``::char(n)``          | ``CAST(substring(x, 1, n) AS STRING)`` — Redshift casts TRUNCATE to the declared length; Spark's varchar cast does not |
| ``TIMESTAMP 'epoch' + s * INTERVAL '1 second'`` | ``timestamp_seconds(s)``, with top-level ``/`` inside ``s`` mapped to ``div`` (Redshift BIGINT division truncates — second precision preserved, F10) |
| ``json_extract_path_text(j, 'a', 'b')``    | ``nvl(get_json_object(j, '$.a.b'), '')`` — Redshift returns '' for a missing path, get_json_object returns NULL (F1) |
| ``from_varbyte(x, 'utf-8')``               | ``decode(x, 'utf-8')`` |
| ``LTRIM(x, 'prefix')``                     | ``if(startswith(x, 'prefix'), substring(x, len+1), x)`` — the reference's evident intent (F5/SURVEY); NOTE Redshift's actual semantic is char-SET trim, Spark's 2-arg ltrim even swaps the argument order, so passing through would be wrong twice |
| ``TRUNC(ts)`` (single arg)                 | ``CAST(ts AS DATE)`` |
| ``tbl."Column"`` quoted field access       | ``tbl.`Column``` (Spark reads double quotes as string literals) |
| glued keywords (``...memberNameORDER BY``) | space inserted — sql/queries.sql:32 ships with the typo; the intent is unambiguous |

``LIKE 'M^_%' ESCAPE '^'``, ``CURRENT_DATE``, timestamp subtraction →
interval, and ``CAST`` itself are native Spark SQL — no rewrite.
"""

from __future__ import annotations

import re

_IDENT = re.compile(r"[A-Za-z0-9_$]")


def _scan_string_end(sql: str, i: int) -> int:
    """i points at an opening single quote; return index just past the
    closing quote (handling '' escapes)."""
    j = i + 1
    while j < len(sql):
        if sql[j] == "'":
            if j + 1 < len(sql) and sql[j + 1] == "'":
                j += 2
                continue
            return j + 1
        j += 1
    return len(sql)


def _matching_close(sql: str, open_idx: int) -> int:
    """Index of the ')' matching the '(' at open_idx (quote-aware)."""
    depth = 0
    j = open_idx
    while j < len(sql):
        c = sql[j]
        if c == "'":
            j = _scan_string_end(sql, j)
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return j
        j += 1
    raise ValueError("unbalanced parentheses in SQL")


def _split_top_level(args: str) -> list[str]:
    """Split a call's argument text on top-level commas (quote/paren aware)."""
    parts, depth, start, j = [], 0, 0, 0
    while j < len(args):
        c = args[j]
        if c == "'":
            j = _scan_string_end(args, j)
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == "," and depth == 0:
            parts.append(args[start:j].strip())
            start = j + 1
        j += 1
    tail = args[start:].strip()
    if tail or parts:
        parts.append(tail)
    return parts


def _rewrite_calls(sql: str, fname: str, fn) -> str:
    """Replace every ``fname( ... )`` call via ``fn(args: list[str]) ->
    str | None`` (None = leave unchanged). Re-scans after each replacement
    so nested occurrences are handled."""
    pat = re.compile(rf"\b{fname}\s*\(", re.IGNORECASE)
    pos = 0
    while True:
        m = pat.search(sql, pos)
        if not m:
            return sql
        open_idx = sql.index("(", m.end() - 1)
        close_idx = _matching_close(sql, open_idx)
        args = _split_top_level(sql[open_idx + 1 : close_idx])
        repl = fn(args)
        if repl is None:
            pos = close_idx
            continue
        sql = sql[: m.start()] + repl + sql[close_idx + 1 :]
        pos = m.start() + len(repl)


def _operand_start(sql: str, cast_idx: int) -> int:
    """Start index of the expression a ``::`` at cast_idx applies to:
    walks left over an identifier/field-access/call/literal chain."""
    j = cast_idx
    while j > 0:
        c = sql[j - 1]
        if c == ")":
            depth = 0
            k = j - 1
            while k >= 0:
                if sql[k] == ")":
                    depth += 1
                elif sql[k] == "(":
                    depth -= 1
                    if depth == 0:
                        break
                k -= 1
            j = k
            # consume a function name directly before the '('
            while j > 0 and _IDENT.match(sql[j - 1]):
                j -= 1
        elif c in "\"`":
            k = sql.rfind(c, 0, j - 1)
            j = k
        elif c == "'":
            k = j - 2
            while k >= 0:
                if sql[k] == "'" and (k == 0 or sql[k - 1] != "'"):
                    break
                k -= 1
            j = k
        elif _IDENT.match(c):
            while j > 0 and _IDENT.match(sql[j - 1]):
                j -= 1
        else:
            break
        if j > 0 and sql[j - 1] == ".":
            j -= 1
            continue
        break
    return j


# two-word types are whitelisted so a following keyword ("varchar as x")
# is never absorbed into the type name
_TYPE_RE = re.compile(
    r"\s*([A-Za-z_]+(?:\s+(?:varying|precision))?)\s*(\(\s*([^)]*)\s*\))?"
)

_TYPE_MAP = {
    "bpchar": "string",
    "character varying": "string",
    "text": "string",
    "varchar": "string",
    "character": "string",
    "char": "string",
    "nchar": "string",
    "int8": "bigint",
    "int4": "int",
    "float8": "double",
    "float4": "float",
    "double precision": "double",
}
_TRUNCATING = {"varchar", "character varying", "character", "char", "bpchar", "nchar"}


def _rewrite_postfix_casts(sql: str) -> str:
    while True:
        idx = sql.find("::")
        if idx < 0:
            return sql
        m = _TYPE_RE.match(sql, idx + 2)
        base = re.sub(r"\s+", " ", m.group(1).lower())
        arg = m.group(3)
        start = _operand_start(sql, idx)
        operand = sql[start:idx]
        mapped = _TYPE_MAP.get(base, base)
        if base in _TRUNCATING and arg and arg.strip().lower() != "max":
            repl = f"CAST(substring({operand}, 1, {int(arg)}) AS STRING)"
        else:
            repl = f"CAST({operand} AS {mapped.upper()})"
        end = m.end(2) if m.group(2) else m.end(1)
        sql = sql[:start] + repl + sql[end:]


def _map_div_top_level(expr: str) -> str:
    """Replace top-level '/' with ' div ' (Redshift integer division on
    BIGINT truncates; Spark '/' is double division)."""
    out, depth, j = [], 0, 0
    while j < len(expr):
        c = expr[j]
        if c == "'":
            k = _scan_string_end(expr, j)
            out.append(expr[j:k])
            j = k
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        if c == "/" and depth == 0:
            out.append(" div ")
        else:
            out.append(c)
        j += 1
    return "".join(out)


_EPOCH_RE = re.compile(
    r"TIMESTAMP\s*'epoch'\s*\+\s*(.+?)\s*\*\s*INTERVAL\s*'1\s+second'",
    re.IGNORECASE | re.DOTALL,
)


def rewrite(sql: str) -> str:
    """Rewrite a Redshift-dialect SQL text to Spark SQL (see module doc)."""
    # tbl."Field" -> tbl.`Field` (double quotes are string literals in Spark)
    sql = re.sub(r'\."([A-Za-z_][A-Za-z0-9_ ]*)"', r".`\1`", sql)
    sql = re.sub(r"\bGETDATE\s*\(\s*\)", "current_timestamp()", sql, flags=re.I)
    sql = re.sub(r"\bfrom_varbyte\s*\(", "decode(", sql, flags=re.I)
    sql = _EPOCH_RE.sub(lambda m: f"timestamp_seconds({_map_div_top_level(m.group(1))})", sql)

    def _jept(args: list[str]) -> str | None:
        if len(args) < 2:
            return None
        path = ".".join(a.strip().strip("'") for a in args[1:])
        return f"nvl(get_json_object({args[0]}, '$.{path}'), '')"

    sql = _rewrite_calls(sql, "json_extract_path_text", _jept)

    def _ltrim(args: list[str]) -> str | None:
        if len(args) != 2 or not re.fullmatch(r"'[^']*'", args[1]):
            return None
        prefix = args[1][1:-1]
        return (
            f"if(startswith({args[0]}, '{prefix}'), "
            f"substring({args[0]}, {len(prefix) + 1}), {args[0]})"
        )

    sql = _rewrite_calls(sql, "ltrim", _ltrim)
    sql = _rewrite_postfix_casts(sql)

    def _trunc(args: list[str]) -> str | None:
        if len(args) != 1:
            return None
        return f"CAST({args[0]} AS DATE)"

    sql = _rewrite_calls(sql, "trunc", _trunc)
    # keyword glued onto an identifier (sql/queries.sql:32 ships the typo
    # "m.memberNameORDER BY"): insert the missing space — only when an
    # UPPERCASE keyword follows a lowercase identifier character, so real
    # identifiers like `reorder` are never touched
    sql = re.sub(r"(?<=[a-z0-9_])(?=(?:ORDER|GROUP)\s+BY\b)", " ", sql)
    return sql.strip().rstrip(";")
