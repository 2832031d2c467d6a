"""Schema catalog — node/edge/property type registry (SURVEY.md §2.1
C1/C2).

Mirrors the reference's ``Schema`` semantics
(/root/reference/src/data/schema.cpp:148-167): types are registered at
runtime by name, names are bounded at 63 characters, duplicates are
rejected, and ids are assigned incrementally per element kind.  The
reference persists packed structs into a page chain
(schema.cpp:70-146); our durable form is a JSON document — the
catalog is driver-local, single-writer metadata (SURVEY.md §7.3), so
a page-chain rebuild would be cargo cult.  Data-plane schemas are
Spark ``StructType``s so registered types bind directly to DataFrames
and temp views.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

# schema.h:15 — fixed char[64] names, so 63 usable chars
MAX_TYPE_NAME = 63

NODE = "node"
EDGE = "edge"
PROPERTY = "property"
_KINDS = (NODE, EDGE, PROPERTY)


class CatalogError(Exception):
    """Engine-level catalog errors (maps the reference's error codes,
    /root/reference/src/base/error.h:42-55)."""


@dataclass
class TypeEntry:
    name: str
    kind: str
    type_id: int
    schema: StructType | None = None


@dataclass
class Catalog:
    """In-memory registry with JSON persistence round-trip."""

    _entries: dict[tuple[str, str], TypeEntry] = field(default_factory=dict)
    _next_id: dict[str, int] = field(
        default_factory=lambda: {k: 0 for k in _KINDS}
    )

    # -- C1: create/get ---------------------------------------------------

    def _create(self, kind: str, name: str, schema: StructType | None) -> TypeEntry:
        if len(name) > MAX_TYPE_NAME:
            raise CatalogError(
                f"{kind} type name too long ({len(name)} > {MAX_TYPE_NAME}): {name!r}"
            )
        if not name:
            raise CatalogError(f"{kind} type name must be non-empty")
        key = (kind, name)
        if key in self._entries:
            raise CatalogError(f"{kind} type already exists: {name!r}")
        entry = TypeEntry(name, kind, self._next_id[kind], schema)
        self._next_id[kind] += 1
        self._entries[key] = entry
        return entry

    def create_node_type(self, name: str, schema: StructType | None = None) -> TypeEntry:
        return self._create(NODE, name, schema)

    def create_edge_type(self, name: str, schema: StructType | None = None) -> TypeEntry:
        return self._create(EDGE, name, schema)

    def create_property_type(self, name: str, schema: StructType | None = None) -> TypeEntry:
        return self._create(PROPERTY, name, schema)

    def get(self, kind: str, name: str) -> TypeEntry:
        try:
            return self._entries[(kind, name)]
        except KeyError:
            raise CatalogError(f"unknown {kind} type: {name!r}") from None

    def get_node_type(self, name: str) -> TypeEntry:
        return self.get(NODE, name)

    def get_edge_type(self, name: str) -> TypeEntry:
        return self.get(EDGE, name)

    def __len__(self) -> int:
        return len(self._entries)

    # -- data binding -----------------------------------------------------

    def bind_view(
        self, spark: SparkSession, kind: str, name: str, df: DataFrame
    ) -> None:
        """Bind a DataFrame to a registered type as a temp view so
        ``spark.sql`` queries can address catalog types by name."""
        entry = self.get(kind, name)
        if entry.schema is not None and df.schema != entry.schema:
            raise CatalogError(
                f"schema mismatch binding {name!r}:"
                f" declared={entry.schema.simpleString()}"
                f" actual={df.schema.simpleString()}"
            )
        df.createOrReplaceTempView(name)

    # -- C2: persistence --------------------------------------------------

    def save(self, path: str) -> None:
        doc = {
            "version": 1,
            "next_id": self._next_id,
            "types": [
                {
                    "name": e.name,
                    "kind": e.kind,
                    "type_id": e.type_id,
                    "schema": e.schema.jsonValue() if e.schema else None,
                }
                for e in self._entries.values()
            ],
        }
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(doc, f)
        os.replace(tmp, path)  # atomic single-writer persistence

    @classmethod
    def load(cls, path: str) -> "Catalog":
        with open(path) as f:
            doc = json.load(f)
        cat = cls()
        cat._next_id = {k: int(v) for k, v in doc["next_id"].items()}
        for t in doc["types"]:
            schema = (
                StructType.fromJson(t["schema"]) if t["schema"] else None
            )
            cat._entries[(t["kind"], t["name"])] = TypeEntry(
                t["name"], t["kind"], t["type_id"], schema
            )
        return cat
