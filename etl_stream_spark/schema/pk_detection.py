"""Heuristic primary-key detection from column names.

Used when the source catalog supplies no PK (schema inferred from data).
Priority ladder matches the reference
(``etl-snowflake-py/etl_snowflake/client.py:872-923``; SURVEY.md §1.1):

1. exact column named ``id``;
2. exactly one ``*_id`` column;
3. a well-known PK spelling: ``pk_id``, ``primary_id``, ``row_id``,
   ``record_id`` (first match in that order wins among multiple ``*_id``);
4. a uuid-ish column (``uuid``, ``guid``, ``*_uuid``, ``*_guid``);
5. otherwise no PK → caller must skip merge (append-only landing only).
"""

from __future__ import annotations

_KNOWN_PK_NAMES = ("pk_id", "primary_id", "row_id", "record_id")


def detect_primary_key(column_names: list[str]) -> list[str]:
    """Return the detected PK columns ([] if none can be inferred)."""
    lowered = {c.lower(): c for c in column_names}

    if "id" in lowered:
        return [lowered["id"]]

    id_cols = [c for c in column_names if c.lower().endswith("_id")]
    if len(id_cols) == 1:
        return id_cols

    if len(id_cols) > 1:
        for known in _KNOWN_PK_NAMES:
            if known in lowered:
                return [lowered[known]]

    for c in column_names:
        lc = c.lower()
        if lc in ("uuid", "guid") or lc.endswith("_uuid") or lc.endswith("_guid"):
            return [c]

    return []
