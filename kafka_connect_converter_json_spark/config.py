"""Converter/engine configuration.

Mirrors the validated config surface of the reference's
``JsonConverterConfig`` (JCC:14-227) as a plain dataclass:

- ``payload_field_name``  (JCC:16, ``payload.field.name``)
- ``input_format``        (JCC:18, ``json|avro``, validated JCC:58-65)
- ``schema_names``        (JCC:66, closed world of declared schemas)
- ``keys``                per-schema ``{dotted.path -> new_column}`` maps
                          (JCC:75-91, ``<Schema>.<old.path> = <newCol>``)
- ``identifiers``         ordered JSON probe rules
                          (JCC:96-121, prefix ``json.``; "true" = existence)
- ``allow_non_indexed``   (JCC:20,67-68) relaxes key-name completeness
- ``uppercase``           (JCC:19,79,134-140) target identifier case fold
- ``include_namespace``   (JCC:22,70) record-name qualification in payload

Deliberate divergences from the reference (documented in SURVEY.md §3.3):
identifier rules are an *ordered list* (the reference iterates a HashMap,
JCC:97-100 — nondeterministic); map "first value" uses sorted-key order
(JC:714-752 streams HashMap values — nondeterministic).

The reference holds parsed config in static fields (JCC:24-29), a latent
bug under multiple instances; this dataclass is instance-scoped.
"""

from __future__ import annotations

from dataclasses import dataclass, field


class ConfigError(ValueError):
    """Engine analogue of Kafka Connect's ConfigException (JCC:58-65 etc.)."""


@dataclass(frozen=True)
class IdentifierRule:
    """One JSON schema-identification probe (JC:508-549).

    ``expected == "true"`` means existence test (JC:526-528); any other
    value means string-equality on the stringified probed value (JC:529).
    """

    schema_name: str
    path: tuple[str, ...]
    expected: str


@dataclass
class ConverterConfig:
    # default mirrors the reference: payload.field.name defaults to "event"
    # (JCC:57, ConfigDef.define(PAYLOAD_FIELD_NAME, STRING, "event", ...))
    payload_field_name: str = "event"
    input_format: str = "json"
    schema_names: tuple[str, ...] = ()
    # schema name -> {dotted.path -> target column name (pre case-fold)}
    keys: dict[str, dict[str, str]] = field(default_factory=dict)
    identifiers: tuple[IdentifierRule, ...] = ()
    allow_non_indexed: bool = False
    uppercase: bool = True
    include_namespace: bool = False

    def __post_init__(self) -> None:
        if self.input_format not in ("json", "avro"):
            raise ConfigError(
                f"input.format must be json|avro, got {self.input_format!r}"
            )  # JCC:58-65
        if not self.schema_names:
            raise ConfigError("schema.names must declare at least one schema")  # JCC:66
        unknown = set(self.keys) - set(self.schema_names)
        if unknown:
            raise ConfigError(f"keys configured for undeclared schemas: {sorted(unknown)}")
        if self.input_format == "json":
            probed = {r.schema_name for r in self.identifiers}
            missing = set(self.schema_names) - probed
            if missing:
                raise ConfigError(
                    f"json input requires an identifier rule per schema; missing: {sorted(missing)}"
                )  # JCC:102-119
        if not self.allow_non_indexed:
            # Key-name consistency invariant (JCC:81-89): every declared schema
            # must produce every target column so the target table is unionable.
            all_targets = {
                self.fold(new) for m in self.keys.values() for new in m.values()
            }
            for name in self.schema_names:
                mine = {self.fold(new) for new in self.keys.get(name, {}).values()}
                if all_targets - mine:
                    raise ConfigError(
                        f"schema {name!r} does not produce target columns "
                        f"{sorted(all_targets - mine)}; set allow_non_indexed=True "
                        "to relax (JCC:81-89)"
                    )

    def fold(self, name: str) -> str:
        """Case-fold a target identifier (JCC:134-140; default uppercase)."""
        return name.upper() if self.uppercase else name.lower()

    @property
    def payload_column(self) -> str:
        return self.fold(self.payload_field_name)  # JC:175,248,294

    def target_columns(self) -> list[str]:
        """All distinct extracted-key target columns, case-folded, sorted,
        plus the payload column last (JC:157-181 createTargetSchema)."""
        cols = sorted({self.fold(n) for m in self.keys.values() for n in m.values()})
        return cols + [self.payload_column]

    @classmethod
    def from_connect_map(cls, configs: dict[str, str]) -> "ConverterConfig":
        """Parse a flat Kafka-Connect-style config map (O21, JCC:36-121).

        Recognized keys, mirroring JsonConverterConfig:
        - ``payload.field.name``                        (JCC:16)
        - ``input.format``           json|avro          (JCC:18)
        - ``schema.names``           comma-separated    (JCC:66)
        - ``allownonindexed`` / ``uppercase`` / ``includenamespace``
                                     true|false         (JCC:20,19,22)
        - ``<Schema>.<dotted.path>`` = target column    (JCC:75-91,
          prefix = declared schema name)
        - ``json.<Schema>.<dotted.path>`` = probe value (JCC:96-121;
          value "true" = existence test). Rule order = insertion order
          of the map (deterministic, unlike the reference's HashMap —
          divergence documented in SURVEY.md §3.3).
        """
        def flag(key: str, default: bool) -> bool:
            v = configs.get(key)
            if v is None:
                return default
            if str(v).lower() not in ("true", "false"):
                raise ConfigError(f"{key} must be true|false, got {v!r}")
            return str(v).lower() == "true"

        names = tuple(
            s.strip() for s in configs.get("schema.names", "").split(",") if s.strip()
        )
        keys: dict[str, dict[str, str]] = {}
        identifiers: list[IdentifierRule] = []
        reserved = {
            "payload.field.name", "input.format", "schema.names",
            "allownonindexed", "uppercase", "includenamespace",
        }
        for k, v in configs.items():
            if k in reserved:
                continue
            if k.startswith("json."):
                rest = k[len("json."):]
                schema, _, path = rest.partition(".")
                if not path:
                    raise ConfigError(f"bad identifier rule key: {k!r}")
                identifiers.append(IdentifierRule(schema, tuple(path.split(".")), str(v)))
                continue
            schema, _, path = k.partition(".")
            if schema in names and path:
                keys.setdefault(schema, {})[path] = str(v)
            else:
                raise ConfigError(f"unrecognized config key: {k!r}")  # JCC strictness
        return cls(
            payload_field_name=configs.get("payload.field.name", "event"),  # JCC:57
            input_format=configs.get("input.format", "json"),
            schema_names=names,
            keys=keys,
            identifiers=tuple(identifiers),
            allow_non_indexed=flag("allownonindexed", False),
            uppercase=flag("uppercase", True),
            include_namespace=flag("includenamespace", False),
        )
