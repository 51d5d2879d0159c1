"""LexicalIndex facade: build / open / search.

The public API mirrors the reference's ``LexicalWrite`` / ``LexicalRead``
traits (reference: ``core/src/traits.rs:927,1022``): batch ingest that
publishes an immutable snapshot, and ranked search returning
``(doc_id, score, rank)`` with raw BM25 scores.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.build import build_index
from .operators.search import SearchEngine, SearchResult
from .plans import query as q
from .sources.storage import IndexStorage


class LexicalIndex:
    """One index directory: build it from a DataFrame, then query it."""

    def __init__(
        self,
        spark: SparkSession,
        index_dir: str,
        include_unsealed: bool = False,
        query_fuel_budget: Optional[int] = None,
        at_generation: Optional[int] = None,
    ):
        self.spark = spark
        self.index_dir = index_dir
        #: opt into pre-commit delta segments (upsert(..., seal=False)
        #: batches) at the cost of the committed-snapshot guarantee
        self.include_unsealed = include_unsealed
        #: coarse work admission budget per query; None = engine default
        #: (reference config.rs::query_fuel_budget, default 10,000,000)
        self.query_fuel_budget = query_fuel_budget
        #: open a PAST committed generation (VERSION AS OF); readable
        #: until maintenance().gc() expires the history
        self.at_generation = at_generation
        self._engine: Optional[SearchEngine] = None

    # ── build ─────────────────────────────────────────────────────────────

    def build(
        self,
        df: DataFrame,
        text_fields: Sequence[str] = ("content", "title"),
        keyword_fields: Sequence[str] = (),
        i64_fields: Sequence[str] = (),
        stored_fields: Sequence[str] = (),
        sort_cols: Sequence[str] = ("doc_id",),
        num_segments: Optional[int] = None,
        num_buckets: int = 16,
        positions: bool = True,
        analyzers: Optional[dict] = None,
        derived_prefix_fields: Optional[dict] = None,
    ) -> "LexicalIndex":
        build_index(
            self.spark,
            df,
            self.index_dir,
            text_fields=text_fields,
            keyword_fields=keyword_fields,
            i64_fields=i64_fields,
            stored_fields=stored_fields,
            sort_cols=sort_cols,
            num_segments=num_segments,
            num_buckets=num_buckets,
            positions=positions,
            analyzers=analyzers,
            derived_prefix_fields=derived_prefix_fields,
        )
        self._engine = None
        return self

    def build_cass(
        self,
        df: DataFrame,
        keyword_fields: Sequence[str] = ("agent", "workspace", "source_id", "origin_kind"),
        i64_fields: Sequence[str] = ("created_at",),
        stored_fields: Sequence[str] = ("title", "content"),
        sort_cols: Sequence[str] = ("doc_id",),
        num_segments: Optional[int] = None,
        num_buckets: int = 16,
    ) -> "LexicalIndex":
        """Build the CASS agent-transcript index shape (schema.rs:379
        CASS_SEMANTIC_SCHEMA): title/content under the hyphen-normalize
        analyzer plus the edge-n-gram ``*_prefix`` acceleration fields.
        Query it with :class:`~frankensearch_spark.plans.cass.
        CassQueryParser` trees."""
        return self.build(
            df,
            text_fields=("title", "content", "title_prefix", "content_prefix"),
            keyword_fields=[f for f in keyword_fields if f in df.columns],
            i64_fields=[f for f in i64_fields if f in df.columns],
            stored_fields=stored_fields,
            sort_cols=sort_cols,
            num_segments=num_segments,
            num_buckets=num_buckets,
            analyzers={
                "title": "cass_hyphen",
                "content": "cass_hyphen",
                "title_prefix": "cass_prefix",
                "content_prefix": "cass_prefix",
            },
            derived_prefix_fields={
                "title_prefix": "title",
                "content_prefix": "content",
            },
        )

    @classmethod
    def build_transcripts(
        cls,
        spark: SparkSession,
        transcripts: DataFrame,
        index_dir: str,
        num_segments: Optional[int] = None,
        num_buckets: int = 16,
        store_content: bool = True,
    ) -> "LexicalIndex":
        """Build from the canonical transcript table
        ``(conv_id, turn_idx, role, text, tool, ts)``.

        One turn == one document; ``doc_id = conv_id || ':' || turn_idx``;
        global docids follow the stable (conv_id, turn_idx) total order.
        ``store_content`` keeps the turn text in the docs table (reference
        default schema stores content), enabling snippets and
        ``hydrate_fields=["content"]``; pass False for an index-only build.
        """
        df = transcripts.select(
            F.concat_ws(":", F.col("conv_id"), F.col("turn_idx").cast("string")).alias(
                "doc_id"
            ),
            F.col("conv_id"),
            F.col("turn_idx").cast("long").alias("turn_idx"),
            F.col("role"),
            F.col("tool"),
            F.col("ts").cast("timestamp").alias("ts"),
            F.col("text").alias("content"),
        )
        index = cls(spark, index_dir)
        return index.build(
            df,
            text_fields=("content",),
            keyword_fields=("conv_id", "role", "tool"),
            i64_fields=("turn_idx",),
            stored_fields=("ts", "content") if store_content else ("ts",),
            sort_cols=("conv_id", "turn_idx"),
            num_segments=num_segments,
            num_buckets=num_buckets,
        )

    # ── read ──────────────────────────────────────────────────────────────

    def engine_exists(self) -> bool:
        """Whether a committed index already exists at this directory."""
        return IndexStorage(self.spark, self.index_dir).exists()

    def reopen(self) -> "LexicalIndex":
        """Drop the pinned snapshot; the next query sees the latest
        manifest generation (the Arc-swap re-load analogue)."""
        self._engine = None
        return self

    @property
    def maintenance(self):
        """Upsert / delete / compact / merge / GC surface (new instance per
        call so it always sees the current manifest generation)."""
        from .operators.maintenance import IndexMaintenance

        return IndexMaintenance(self.spark, self.index_dir)

    def upsert(self, df: DataFrame, sort_cols: Sequence[str] = ("doc_id",)) -> "LexicalIndex":
        self.maintenance.upsert(df, sort_cols=sort_cols)
        return self.reopen()

    def delete(self, doc_ids: Sequence[str]) -> int:
        n = self.maintenance.delete(doc_ids)
        self.reopen()
        return n

    def delete_frame(self, ids: DataFrame) -> int:
        """Distributed bulk delete: ``ids`` is a doc_id DataFrame."""
        n = self.maintenance.delete_frame(ids)
        self.reopen()
        return n

    def delete_all(self) -> int:
        """Tombstone every live document (reference writer delete_all)."""
        n = self.maintenance.delete_all()
        self.reopen()
        return n

    @property
    def engine(self) -> SearchEngine:
        if self._engine is None:
            kwargs = {}
            if self.query_fuel_budget is not None:
                kwargs["query_fuel_budget"] = self.query_fuel_budget
            if self.at_generation is not None:
                kwargs["at_generation"] = self.at_generation
            self._engine = SearchEngine(
                self.spark,
                self.index_dir,
                include_unsealed=self.include_unsealed,
                **kwargs,
            )
        return self._engine

    @property
    def storage(self) -> IndexStorage:
        return self.engine.storage

    def search(
        self,
        query: q.Query | str,
        limit: int = 10,
        offset: int = 0,
        exact_count: bool = False,
        prune: bool | str = "auto",
        hydrate_fields: Optional[Sequence[str]] = None,
    ) -> SearchResult:
        return self.engine.search(
            query,
            limit=limit,
            offset=offset,
            exact_count=exact_count,
            prune=prune,
            hydrate_fields=hydrate_fields,
        )

    def search_with_snippets(
        self,
        query: q.Query | str,
        limit: int = 10,
        offset: int = 0,
        snippet_field: str = "content",
        max_chars: int = 200,
    ) -> SearchResult:
        return self.engine.search_with_snippets(
            query,
            limit=limit,
            offset=offset,
            snippet_field=snippet_field,
            max_chars=max_chars,
        )

    def docid_frame(self, query: q.Query | str) -> Optional[DataFrame]:
        """Matching docids as a DataFrame (the distributed DocSet path)."""
        return self.engine.docid_frame(query)

    def collect_docids(self, query: q.Query | str, max_rows: int = 1_000_000) -> list[int]:
        return self.engine.collect_docids(query, max_rows=max_rows)

    def segment_metrics(self) -> DataFrame:
        """Per-partition lineage + metrics rollup (one row per live
        segment: docid range, status, publish time, token/posting/term
        counts, tombstoned docs).  Distributed; derived at report time."""
        return self.engine.segment_metrics()
