"""DDFS catalog analog: tags -> named tables, tag attributes -> table
properties, tag->tag links -> views (SURVEY §1.2/§2.1 mapping table).

Reference surface (lib/disco/ddfs.py:94-364; server
master/src/ddfs/ddfs_tag.erl, ddfs_web.erl:103-213): tags are named,
mutable lists of blob sets with arbitrary user attributes, forming a
metadata DAG. Replication/GC/rebalance are storage-layer concerns
(HDFS/S3) and intentionally out of scope (SURVEY §1.3).

Here: a Tag names either a materialized table (push) or a view over
other tags (link). Attributes live in TBLPROPERTIES. `walk` resolves
the DAG; `get` reads the union of a tag's data, exactly like reading a
tag's blobs.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

_ATTR_PREFIX = "disco."


def _q(name: str) -> str:
    return "`" + name.replace("`", "") + "`"


class TagCatalog:
    def __init__(self, spark: SparkSession):
        self.spark = spark

    # -- data ----------------------------------------------------------
    def push(self, tag: str, df: DataFrame, mode: str = "append") -> None:
        """DDFS.push: add a blob set to a tag (append to its table)."""
        df.write.mode(mode).saveAsTable(tag)

    def get(self, tag: str) -> DataFrame:
        """Read a tag's full contents (table or link view)."""
        return self.spark.table(tag)

    def link(self, tag: str, children: list[str]) -> None:
        """tag->tag links: a view unioning the children (the metadata
        DAG edge; ddfs.rst:71-96)."""
        union = " UNION ALL ".join(f"SELECT * FROM {_q(c)}" for c in children)
        self.spark.sql(f"CREATE OR REPLACE VIEW {_q(tag)} AS {union}")
        self.spark.sql(
            f"ALTER VIEW {_q(tag)} SET TBLPROPERTIES ('{_ATTR_PREFIX}children' = '{json.dumps(children)}')"
        )

    def delete(self, tag: str) -> None:
        try:
            self.spark.sql(f"DROP VIEW IF EXISTS {_q(tag)}")
        except Exception:
            pass
        self.spark.sql(f"DROP TABLE IF EXISTS {_q(tag)}")

    def exists(self, tag: str) -> bool:
        return self.spark.catalog.tableExists(tag)

    def list(self) -> list[str]:
        return [t.name for t in self.spark.catalog.listTables()]

    # -- attributes (tag attrs -> TBLPROPERTIES) ------------------------
    def setattr(self, tag: str, key: str, value: str) -> None:
        kind = "VIEW" if self._is_view(tag) else "TABLE"
        self.spark.sql(
            f"ALTER {kind} {_q(tag)} SET TBLPROPERTIES ('{_ATTR_PREFIX}{key}' = '{value}')"
        )

    def getattr(self, tag: str, key: str) -> str | None:
        return self.attrs(tag).get(key)

    def delattr(self, tag: str, key: str) -> None:
        kind = "VIEW" if self._is_view(tag) else "TABLE"
        self.spark.sql(
            f"ALTER {kind} {_q(tag)} UNSET TBLPROPERTIES IF EXISTS ('{_ATTR_PREFIX}{key}')"
        )

    def attrs(self, tag: str) -> dict[str, str]:
        rows = self.spark.sql(f"SHOW TBLPROPERTIES {_q(tag)}").collect()
        return {
            r.key[len(_ATTR_PREFIX):]: r.value
            for r in rows
            if r.key.startswith(_ATTR_PREFIX)
        }

    # -- DAG walk --------------------------------------------------------
    def children(self, tag: str) -> list[str]:
        raw = self.getattr(tag, "children")
        return json.loads(raw) if raw else []

    def walk(self, tag: str) -> list[str]:
        """DFS over tag->tag links (DDFS.walk), cycle-safe."""
        seen, order = set(), []

        def visit(t: str):
            if t in seen:
                return
            seen.add(t)
            order.append(t)
            for c in self.children(t):
                visit(c)

        visit(tag)
        return order

    def findtags(self, prefix: str) -> list[str]:
        return [t for t in self.list() if t.startswith(prefix)]

    def _is_view(self, tag: str) -> bool:
        try:
            t = self.spark.catalog.getTable(tag)
            return t.tableType == "VIEW"
        except Exception:
            return False
