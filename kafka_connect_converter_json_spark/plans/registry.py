"""Schema-evolution registry with additive struct widening — SURVEY.md N2.

Generalizes the reference's schema-keyed compile-once discipline
(instruction cache JC:84-93, schema rewrite JC:551-633): the reference's
cache never widens (its target is all-strings, JC:169-177); a CDC engine
must accept *evolving* source envelopes. Rules:

- **additive**: a field present in the new schema but not the registered
  one is added as nullable (the Iceberg ``ALTER TABLE ADD COLUMN``
  analogue);
- **promotion**: numeric widening int->long->double; any type vs string
  -> string (the reference's universal fallback — everything stringifies,
  JC:497,660); struct/struct merges recursively; array merges by element;
  map merges by value;
- **rejection**: incompatible non-promotable pairs (e.g. struct vs
  array) raise ``SchemaConflict`` — matching the reference's hard failure
  on unknown shapes (JC:616-618).

Fingerprints are deterministic hashes of the canonical schema JSON, the
analogue of the reference's schema-hash cache key (JC:785-814, equality
on hash alone).

The registry is driver-side state; it serializes to JSON so checkpoints
can persist and replays can restore it (N7).
"""

from __future__ import annotations

import hashlib
import json

from pyspark.sql import types as T


class SchemaConflict(TypeError):
    pass


_NUMERIC_RANK = {
    "byte": 0,
    "short": 1,
    "integer": 2,
    "long": 3,
    "float": 4,
    "double": 5,
}


def fingerprint(schema: T.StructType) -> str:
    """Deterministic fingerprint of a StructType (JC:785-814 analogue)."""
    return hashlib.sha256(schema.json().encode()).hexdigest()[:16]


def widen(old: T.DataType, new: T.DataType) -> T.DataType:
    """Widen ``old`` to admit ``new``; raise SchemaConflict if impossible."""
    if old == new:
        return old
    if isinstance(old, T.NullType):
        return new
    if isinstance(new, T.NullType):
        return old
    on, nn = old.typeName(), new.typeName()
    if on in _NUMERIC_RANK and nn in _NUMERIC_RANK:
        return _numeric(max(_NUMERIC_RANK[on], _NUMERIC_RANK[nn]))
    if isinstance(old, T.StringType) or isinstance(new, T.StringType):
        # universal stringify fallback (JC:497,660)
        return T.StringType()
    if isinstance(old, T.StructType) and isinstance(new, T.StructType):
        return widen_struct(old, new)
    if isinstance(old, T.ArrayType) and isinstance(new, T.ArrayType):
        return T.ArrayType(widen(old.elementType, new.elementType), True)
    if isinstance(old, T.MapType) and isinstance(new, T.MapType):
        return T.MapType(
            widen(old.keyType, new.keyType), widen(old.valueType, new.valueType), True
        )
    if isinstance(old, T.DecimalType) and isinstance(new, T.DecimalType):
        scale = max(old.scale, new.scale)
        intd = max(old.precision - old.scale, new.precision - new.scale)
        return T.DecimalType(min(38, intd + scale), scale)
    raise SchemaConflict(f"cannot widen {old.simpleString()} vs {new.simpleString()}")


def _numeric(rank: int) -> T.DataType:
    return [
        T.ByteType(),
        T.ShortType(),
        T.IntegerType(),
        T.LongType(),
        T.FloatType(),
        T.DoubleType(),
    ][rank]


def widen_struct(old: T.StructType, new: T.StructType) -> T.StructType:
    """Additive nullable merge: union of fields, old order first, new
    fields appended in their own order (deterministic)."""
    old_by_name = {f.name: f for f in old.fields}
    fields: list[T.StructField] = []
    for f in old.fields:
        if f.name in {g.name: g for g in new.fields}:
            nf = next(g for g in new.fields if g.name == f.name)
            fields.append(T.StructField(f.name, widen(f.dataType, nf.dataType), True))
        else:
            fields.append(T.StructField(f.name, f.dataType, True))
    for g in new.fields:
        if g.name not in old_by_name:
            fields.append(T.StructField(g.name, g.dataType, True))
    return T.StructType(fields)


class SchemaRegistry:
    """Driver-side registry: schema-name -> current widened StructType.

    ``observe`` returns ``(schema, evolved)``; compile work downstream is
    keyed by ``fingerprint`` so an unchanged schema re-observation costs a
    dict hit, matching the reference's cache discipline (JC:344-348).
    """

    def __init__(self) -> None:
        self._schemas: dict[str, T.StructType] = {}
        self._seen_fingerprints: set[tuple[str, str]] = set()
        self.evolutions = 0

    def observe(self, name: str, schema: T.StructType) -> tuple[T.StructType, bool]:
        fp = (name, fingerprint(schema))
        if fp in self._seen_fingerprints:
            return self._schemas[name], False
        cur = self._schemas.get(name)
        if cur is None:
            self._schemas[name] = schema
            evolved = True
        else:
            merged = widen_struct(cur, schema)
            evolved = merged != cur
            self._schemas[name] = merged
            if evolved:
                self.evolutions += 1
        self._seen_fingerprints.add(fp)
        return self._schemas[name], evolved

    def get(self, name: str) -> T.StructType | None:
        return self._schemas.get(name)

    def items(self) -> list[tuple[str, T.StructType]]:
        return sorted(self._schemas.items())

    def size(self) -> int:
        """Parity with getCacheSize() (JC:503-505)."""
        return len(self._schemas)

    # --- checkpoint persistence (N7) ---

    def to_json(self) -> str:
        return json.dumps({k: json.loads(v.json()) for k, v in sorted(self._schemas.items())})

    @classmethod
    def from_json(cls, s: str) -> SchemaRegistry:
        r = cls()
        for name, sch in json.loads(s).items():
            st = T.StructType.fromJson(sch)
            r._schemas[name] = st
            r._seen_fingerprints.add((name, fingerprint(st)))
        return r
