"""DiscoDB parity: inverted index + CNF boolean queries, Spark-first.

The reference's DiscoDB is an immutable mmap'd multimap ``key -> values``
built as a job output stream and queried with CNF boolean expressions
over keys (surface: lib/disco/schemes/scheme_discodb.py:5-52;
query strings doc/howto/discodb.rst:33-57; lifecycle SURVEY §3.3).

Spark design (SURVEY §4 "custom work" item 2):
- the index is a plain (key, value) DataFrame; persisted form is a
  bucketed+sorted Parquet table (``save_index``) so equality lookups
  prune buckets and per-key scans are sorted runs.
- ``Q`` parses the reference query language — ``&`` AND, ``|`` OR,
  ``~`` NOT, parentheses, bare literals — into an AST compiled to
  DataFrame set algebra over *value sets*: a literal selects the value
  set of its key; AND=intersect, OR=union, NOT=complement against the
  index's full value set (discodb query semantics: values whose key
  sets satisfy the clause).
- every operation is a semi-join/aggregate — no driver-side iteration,
  so a 100 TB index queries the same way a 1 GB one does.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


# --------------------------------------------------------------------------
# Q: CNF query language (parser for the reference's query strings,
# e.g. 'this | word', 'a & (b | c) & ~d' — doc/howto/discodb.rst:38-42)
# --------------------------------------------------------------------------
@dataclass(frozen=True)
class Lit:
    term: str


@dataclass(frozen=True)
class Not:
    child: object


@dataclass(frozen=True)
class And:
    left: object
    right: object


@dataclass(frozen=True)
class Or:
    left: object
    right: object


class Q:
    """Parsed boolean key-query. ``Q.parse('a & (b | ~c)')``."""

    def __init__(self, ast):
        self.ast = ast

    @staticmethod
    def parse(text: str) -> "Q":
        tokens = Q._lex(text)
        ast, rest = Q._parse_or(tokens)
        if rest:
            raise ValueError(f"trailing tokens in query: {rest!r}")
        return Q(ast)

    # `urlscan` in the reference decodes queries embedded in discodb://
    # URL fragments (scheme_discodb.py:13-26): '/'-separated clauses are
    # ANDed, and each clause is URL-unquoted first so operators like '&'
    # and '|' can ride in a URL as %26/%7C.
    @staticmethod
    def urlscan(fragment: str) -> "Q":
        from urllib.parse import unquote

        clauses = [unquote(c) for c in fragment.split("/") if c]
        text = " & ".join(f"({c})" for c in clauses)
        return Q.parse(text)

    @staticmethod
    def _lex(text: str) -> list[str]:
        out, term = [], []
        for ch in text:
            if ch in "&|~()":
                if term:
                    out.append("".join(term).strip())
                    term = []
                out.append(ch)
            else:
                term.append(ch)
        if term:
            out.append("".join(term).strip())
        return [t for t in out if t]

    @staticmethod
    def _parse_or(toks):
        left, toks = Q._parse_and(toks)
        while toks and toks[0] == "|":
            right, toks = Q._parse_and(toks[1:])
            left = Or(left, right)
        return left, toks

    @staticmethod
    def _parse_and(toks):
        left, toks = Q._parse_unary(toks)
        while toks and toks[0] == "&":
            right, toks = Q._parse_unary(toks[1:])
            left = And(left, right)
        return left, toks

    @staticmethod
    def _parse_unary(toks):
        if not toks:
            raise ValueError("empty query")
        if toks[0] == "~":
            child, toks = Q._parse_unary(toks[1:])
            return Not(child), toks
        if toks[0] == "(":
            inner, toks = Q._parse_or(toks[1:])
            if not toks or toks[0] != ")":
                raise ValueError("unbalanced parenthesis")
            return inner, toks[1:]
        if toks[0] in ("&", "|", ")"):
            raise ValueError(f"unexpected token {toks[0]!r}")
        return Lit(toks[0]), toks[1:]


# --------------------------------------------------------------------------
# Index
# --------------------------------------------------------------------------
class InvertedIndex:
    """A (key, value) multimap as a DataFrame, with DiscoDB's query ops.

    ``unique_items`` mirrors ``DiscoDBConstructor.finalize(unique_items=)``
    (reference lib/disco/schemes/scheme_discodb.py:31-49): the reference's
    multimap is *list-valued* by default — a key's values keep duplicates
    in insertion multiplicity — and ``unique_items=True`` collapses them
    to a set at finalize. Here the flag governs ``from_tokens`` building
    and the list-enumeration ops (``get``, ``value_counts``); boolean CNF
    queries are set algebra in both engines and always distinct.
    """

    def __init__(self, df: DataFrame, unique_items: bool = True):
        self.df = df.select(F.col("key"), F.col("value"))
        self.unique_items = unique_items

    # -- construction -------------------------------------------------
    @staticmethod
    def from_tokens(
        df: DataFrame, text_col: str, id_col: str, unique_items: bool = True
    ) -> "InvertedIndex":
        """Build token->doc index (the wordcount_ddb.py:10-22 pattern).
        ``unique_items=False`` keeps one entry per token *occurrence* —
        the counts-as-duplicates idiom the reference's list-valued
        multimap supports."""
        toks = df.select(
            F.explode(F.split(F.col(text_col), r"\s+")).alias("key"),
            F.col(id_col).alias("value"),
        ).filter(F.col("key") != "")
        return InvertedIndex(
            toks.distinct() if unique_items else toks, unique_items=unique_items
        )

    # -- persistence: bucketed+sorted table = the immutable mmap file ----
    def save(
        self,
        spark: SparkSession,
        table: str,
        buckets: int = 32,
        disable_compression: bool = False,
    ) -> None:
        """``disable_compression`` maps the reference's constructor flag to
        the parquet codec (uncompressed vs snappy) — same trade (CPU vs
        bytes) the reference exposes."""
        (
            self.df.write.mode("overwrite")
            .bucketBy(buckets, "key")
            .sortBy("key")
            .option("compression", "uncompressed" if disable_compression else "snappy")
            .format("parquet")
            .saveAsTable(table)
        )
        # persist the multimap semantics: without this a list-valued
        # index (unique_items=False) silently became set-valued after a
        # save/load round-trip — get() would re-apply distinct()
        spark.sql(
            f"ALTER TABLE {table} SET TBLPROPERTIES "
            f"('disco.unique_items' = '{str(self.unique_items).lower()}')"
        )

    @staticmethod
    def load(spark: SparkSession, table: str) -> "InvertedIndex":
        props = {
            r["key"]: r["value"]
            for r in spark.sql(f"SHOW TBLPROPERTIES {table}").collect()
        }
        unique = props.get("disco.unique_items", "true") == "true"
        return InvertedIndex(spark.table(table), unique_items=unique)

    # -- enumeration ops (scheme_discodb.py:20-25 method dispatch) -------
    def keys(self) -> DataFrame:
        return self.df.select("key").distinct()

    def values(self) -> DataFrame:
        return self.df.select("value")

    def items(self) -> DataFrame:
        return self.df

    def unique_values(self) -> DataFrame:
        return self.df.select("value").distinct()

    def get(self, term: str) -> DataFrame:
        """The value *list* of one key — duplicates preserved when the
        index is list-valued (``discodb[key]`` in the reference API)."""
        hits = self.df.filter(F.col("key") == term).select("value")
        return hits.distinct() if self.unique_items else hits

    def value_counts(self) -> DataFrame:
        """Per-key value multiplicity: ``(key, cnt)``. On a list-valued
        index this is the counts-as-duplicates pattern (wordcount_ddb.py
        stores one entry per occurrence and reads len(values)); one
        map-side-combined groupBy — no value payload shuffles."""
        return self.df.groupBy("key").agg(F.count("*").alias("cnt"))

    # -- boolean query ---------------------------------------------------
    def query(self, q: "Q | str") -> DataFrame:
        """Values whose key sets satisfy the CNF clause."""
        if isinstance(q, str):
            q = Q.parse(q)
        return self._eval(q.ast)

    def _key_values(self, term: str) -> DataFrame:
        # equality predicate pushes to the parquet scan / bucket pruning
        return self.df.filter(F.col("key") == term).select("value").distinct()

    def _eval(self, node) -> DataFrame:
        if isinstance(node, Lit):
            return self._key_values(node.term)
        if isinstance(node, And):
            return self._eval(node.left).intersect(self._eval(node.right))
        if isinstance(node, Or):
            return self._eval(node.left).union(self._eval(node.right)).distinct()
        if isinstance(node, Not):
            return self.unique_values().exceptAll(self._eval(node.child))
        raise TypeError(f"bad AST node {node!r}")

    def metaquery(self, q: "Q | str", recursive: bool = False, max_hops: int = 8) -> DataFrame:
        """Query, then expand resulting values as keys (the reference's
        variable expansion over key->keys metadata, query_ddb.py:13-19).

        ``recursive=False`` (default): the documented one-hop expansion —
        a self semi-join of the index.

        ``recursive=True``: deep key->keys expansion — values reached
        within ``max_hops`` hops of the initial hit set. Built as
        ``max_hops`` chained semi-joins in ONE lazy plan (no per-hop
        driver actions); each hop's frontier is distinct-ed, so cyclic
        metadata cannot blow up the row count and the result equals a
        depth-bounded recursive CTE. On a metadata DAG shallower than
        max_hops this IS the transitive closure."""
        hits = self.query(q)
        if not recursive:
            return (
                self.df.join(hits.withColumnRenamed("value", "key"), on="key", how="left_semi")
                .select("value")
                .distinct()
            )
        frontier = hits
        layers = [hits]
        for _ in range(max_hops):
            frontier = (
                self.df.join(
                    frontier.withColumnRenamed("value", "key"), on="key", how="left_semi"
                )
                .select("value")
                .distinct()
            )
            layers.append(frontier)
        out = layers[0]
        for layer in layers[1:]:
            out = out.union(layer)
        return out.distinct()


_URL_METHODS = ("query", "metaquery", "keys", "values", "items", "unique_values")


def open_url(spark: SparkSession, url: str, loader=None):
    """URL-fragment dispatch parity with the reference's scheme_discodb
    ``Open`` (lib/disco/schemes/scheme_discodb.py:5-28): a
    ``discodb://<netloc>/<table>!<method>/<arg>`` URL locates an index
    and invokes a method on it in one step.

    - the part before ``!`` names the saved index (here: the bucketed
      table ``save()`` wrote, rather than an mmap'd file path; the
      netloc is advisory in local mode — on a cluster it maps to a
      catalog namespace);
    - ``query`` / ``metaquery`` parse their arg with ``Q.urlscan``
      ('/'-joined AND clauses, URL-escaped operators);
    - enumeration methods (keys/values/items/unique_values) take no arg;
    - no fragment returns the ``InvertedIndex`` itself.

    ``loader`` overrides how the table name becomes an index (tests pass
    a closure; default is ``InvertedIndex.load``).
    """
    if "://" not in url:
        raise ValueError(f"not a discodb URL: {url!r}")
    rest = url.split("://", 1)[1]
    _netloc, _, path = rest.partition("/")
    path, _, frag = path.partition("!")
    table = path.strip("/").replace("/", ".")
    method, _, arg = frag.partition("/")
    # validate the fragment BEFORE touching the catalog: a bad method is
    # a URL error regardless of whether the index exists
    if frag:
        if method not in _URL_METHODS:
            raise ValueError(f"unknown discodb method {method!r} (have {_URL_METHODS})")
        if method in ("query", "metaquery") and not arg:
            raise ValueError(f"{method} needs a query fragment after {method}/")
    idx = (loader or InvertedIndex.load)(spark, table)
    if not frag:
        return idx
    if method in ("query", "metaquery"):
        return getattr(idx, method)(Q.urlscan(arg))
    return getattr(idx, method)()
