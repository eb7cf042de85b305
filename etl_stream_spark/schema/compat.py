"""Schema-compatibility checking (Confluent-registry-style modes).

``schema/evolution.py`` handles the mechanics of drift — detecting and
merging new columns once a batch arrives. This module answers the
governance question that comes FIRST in a multi-producer deployment:
may this producer publish its new schema at all?  The modes follow the
public Confluent/Avro compatibility taxonomy, translated to Spark
struct types:

* **BACKWARD** — consumers on the NEW schema can read data written
  with the OLD one (the safe default for a CDC landing zone: the merge
  engine upgrades first, producers follow).  Adding a column is only
  safe if the new column is nullable (old data has no value for it);
  deleting is safe; type changes must be widenings.
* **FORWARD** — consumers on the OLD schema can read NEW data.
  Adding is safe (old readers ignore it); deleting is only safe if the
  old column was nullable (old readers expect it); type changes must
  be widenings in the reverse direction, i.e. narrowings here are the
  violation.
* **FULL** — both.

Widening follows the same lattice ``session.load_table`` applies when
normalizing testdata (int32 → bigint etc.): byte → short → int →
long, float → double, int-family → double/decimal, and NTZ → LTZ
timestamps.  Struct fields recurse; arrays/maps compare element-wise.
"""

from __future__ import annotations

from pyspark.sql import types as T

#: type → the set of types it may WIDEN to (transitively closed).
_WIDENS: dict[str, set[str]] = {
    "byte": {"short", "integer", "long", "float", "double", "decimal"},
    "short": {"integer", "long", "float", "double", "decimal"},
    "integer": {"long", "float", "double", "decimal"},
    "long": {"double", "decimal"},
    "float": {"double"},
    "date": {"timestamp", "timestamp_ntz"},
    "timestamp_ntz": {"timestamp"},
}


def _kind(dt: T.DataType) -> str:
    return dt.typeName()


def is_widening(old: T.DataType, new: T.DataType) -> bool:
    """True iff ``old`` → ``new`` loses no values (equal types included)."""
    if old == new:
        return True
    if isinstance(old, T.DecimalType) and isinstance(new, T.DecimalType):
        return (
            new.scale >= old.scale
            and (new.precision - new.scale) >= (old.precision - old.scale)
        )
    if isinstance(old, T.ArrayType) and isinstance(new, T.ArrayType):
        return is_widening(old.elementType, new.elementType)
    if isinstance(old, T.MapType) and isinstance(new, T.MapType):
        return is_widening(old.keyType, new.keyType) and is_widening(
            old.valueType, new.valueType
        )
    if isinstance(old, T.StructType) and isinstance(new, T.StructType):
        # struct widening = same field set, each field widening
        if {f.name.lower() for f in old.fields} != {
            f.name.lower() for f in new.fields
        }:
            return False
        by_name = {f.name.lower(): f for f in new.fields}
        return all(
            is_widening(f.dataType, by_name[f.name.lower()].dataType)
            for f in old.fields
        )
    return _kind(new) in _WIDENS.get(_kind(old), set())


def backward_violations(old: T.StructType, new: T.StructType) -> list[str]:
    """Why a NEW-schema reader could NOT read OLD data (empty = safe)."""
    out: list[str] = []
    old_by = {f.name.lower(): f for f in old.fields}
    for f in new.fields:
        prev = old_by.get(f.name.lower())
        if prev is None:
            if not f.nullable:
                out.append(
                    f"added column {f.name!r} is non-nullable — old rows"
                    " have no value for it"
                )
        elif not is_widening(prev.dataType, f.dataType):
            out.append(
                f"column {f.name!r} changed {prev.dataType.simpleString()}"
                f" → {f.dataType.simpleString()}, not a widening"
            )
    return out


def forward_violations(old: T.StructType, new: T.StructType) -> list[str]:
    """Why an OLD-schema reader could NOT read NEW data (empty = safe)."""
    out: list[str] = []
    new_by = {f.name.lower(): f for f in new.fields}
    for f in old.fields:
        nxt = new_by.get(f.name.lower())
        if nxt is None:
            if not f.nullable:
                out.append(
                    f"removed column {f.name!r} was non-nullable — old"
                    " readers require a value"
                )
        elif not is_widening(f.dataType, nxt.dataType):
            out.append(
                f"column {f.name!r} changed {f.dataType.simpleString()}"
                f" → {nxt.dataType.simpleString()}, old readers would narrow"
            )
    return out


def check_compatibility(
    old: T.StructType, new: T.StructType, mode: str = "BACKWARD"
) -> list[str]:
    """Violation list for ``mode`` in {BACKWARD, FORWARD, FULL, NONE}
    (empty = the new schema may be published)."""
    m = mode.upper()
    if m == "NONE":
        return []
    if m == "BACKWARD":
        return backward_violations(old, new)
    if m == "FORWARD":
        return forward_violations(old, new)
    if m == "FULL":
        return backward_violations(old, new) + forward_violations(old, new)
    raise ValueError(f"unknown compatibility mode {mode!r}")
