"""Identifier validation and table-name escaping.

SQL-injection defense for any identifier interpolated into generated SQL
(Spark SQL, Delta DDL, catalog commands). Semantics match the reference
(SURVEY.md §2.3 P8/P9; reference ``etl-snowflake-py/etl_snowflake/ddl.py:17-50``
and ``etl-destination/src/bigquery/core.rs:40-51``):

* identifiers: ``^[A-Za-z_][A-Za-z0-9_]{0,254}$`` + keyword blocklist;
* ``schema.table`` flattening with ``_`` → ``__`` escaping so the mapping
  is collision-free and reversible.
"""

from __future__ import annotations

import re

_IDENTIFIER_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]{0,254}$")

#: Statement-starting keywords that must never appear as identifiers
#: (defense-in-depth — the regex already excludes spaces/quotes, this
#: blocks single-token smuggling into generated DDL).
_BLOCKED_KEYWORDS = frozenset(
    {
        "select",
        "insert",
        "update",
        "delete",
        "drop",
        "create",
        "alter",
        "truncate",
        "merge",
        "grant",
        "revoke",
        "exec",
        "execute",
        "call",
        "union",
    }
)


class InvalidIdentifierError(ValueError):
    pass


def validate_identifier(name: str, kind: str = "identifier") -> str:
    """Validate and return ``name``; raise ``InvalidIdentifierError`` on
    empty / malformed / keyword identifiers."""
    if not isinstance(name, str) or not name:
        raise InvalidIdentifierError(f"empty {kind}")
    if not _IDENTIFIER_RE.match(name):
        raise InvalidIdentifierError(f"invalid {kind}: {name!r}")
    if name.lower() in _BLOCKED_KEYWORDS:
        raise InvalidIdentifierError(f"reserved keyword used as {kind}: {name!r}")
    return name


def is_valid_identifier(name: str) -> bool:
    try:
        validate_identifier(name)
        return True
    except InvalidIdentifierError:
        return False


def escape_table_name(schema: str, table: str) -> str:
    """``(schema, table)`` → single flat name, collision-free.

    ``_`` inside either part doubles to ``__``; the separator is a single
    ``_``. Reversible via :func:`unescape_table_name`.
    """
    return f"{schema.replace('_', '__')}_{table.replace('_', '__')}"


def unescape_table_name(flat: str) -> tuple[str, str]:
    """Inverse of :func:`escape_table_name`.

    Scans for the single-``_`` separator (an ``_`` not part of an ``__``
    pair)."""
    i = 0
    n = len(flat)
    while i < n:
        if flat[i] == "_":
            if i + 1 < n and flat[i + 1] == "_":
                i += 2
                continue
            schema = flat[:i].replace("__", "_")
            table = flat[i + 1 :].replace("__", "_")
            return schema, table
        i += 1
    raise ValueError(f"not an escaped table name: {flat!r}")


_NAMESPACE_INVALID_RE = re.compile(r"[^a-z0-9_]")


def normalize_namespace(name: str, max_len: int = 255) -> str:
    """Lowercase, replace invalid chars with ``_``, guard length — the
    Iceberg-namespace normalization of the reference
    (``etl-destination/src/iceberg/core.rs:643-689``)."""
    out = _NAMESPACE_INVALID_RE.sub("_", name.lower())
    if not out or not (out[0].isalpha() or out[0] == "_"):
        out = "_" + out
    return out[:max_len]
