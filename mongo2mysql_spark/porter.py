"""Pipeline orchestration (SURVEY.md §2 A18, §3): the Spark-native
equivalent of ``Porter::run()`` / ``exportCollection``.

Per collection, the reference's per-row loop (route → flatten → filters
→ array spill → _num → schema-ensure → REPLACE insert,
Porter.php:131-235) becomes a set-oriented two-pass plan:

  read → _table routing column → flatten (+ spill children)
       → skip/dataonly/wide guards → _num window
  Pass 1 (schema): one aggregation per table → widening lattice → DDL
  Pass 2 (data):  per-table JDBC upsert (or parquet staging)

``run_to_frames`` returns the transformed DataFrames + DDL without a
sink (what the tests and the rows-only harness query exercise);
``run`` additionally writes through the configured sink.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mongo2mysql_spark.operators.flatten import flatten
from mongo2mysql_spark.operators.guards import (
    WIDE_ROW_LIMIT,
    filter_missing_destination,
    filter_skip_list,
    table_too_wide,
)
from mongo2mysql_spark.operators.routing import DEFAULT_KLUDGE_RULES, add_table_column
from mongo2mysql_spark.operators.sequence import add_num_two_phase
from mongo2mysql_spark.operators.spill import child_table_name, spill_child
from mongo2mysql_spark.plans.ddl import evolve_schema_sql
from mongo2mysql_spark.plans.infer import infer_table_schema, infer_table_schemas_grouped


@dataclass
class PorterConfig:
    id_col: str = "_id"
    key_col: str = "_key"
    skip: set[str] = field(default_factory=set)
    dataonly: bool = False
    existing_tables: set[str] = field(default_factory=set)  # for dataonly
    limit: int | None = None
    wide_row_limit: int = WIDE_ROW_LIMIT
    kludge_rules: tuple = DEFAULT_KLUDGE_RULES
    ts_seconds: bool = True


@dataclass
class CollectionExport:
    """All destination tables derived from one collection."""

    tables: dict[str, DataFrame] = field(default_factory=dict)
    schemas: dict[str, dict[str, str]] = field(default_factory=dict)
    ddl: list[str] = field(default_factory=list)
    skipped_wide: list[str] = field(default_factory=list)
    _cached: DataFrame | None = None  # routed parent held persisted for the split

    def unpersist(self) -> None:
        """Release the cached routed-parent frame (call once the
        per-table frames have been written/consumed)."""
        if self._cached is not None:
            self._cached.unpersist()
            self._cached = None


class SparkPorter:
    def __init__(self, spark: SparkSession, config: PorterConfig | None = None):
        self.spark = spark
        self.config = config or PorterConfig()

    # ---------------------------------------------------------------- export

    def export_collection(self, df: DataFrame, collection_name: str) -> CollectionExport:
        cfg = self.config
        out = CollectionExport()
        if cfg.limit is not None:
            df = df.limit(cfg.limit)

        flat = flatten(df, ts_seconds=cfg.ts_seconds)
        parent = add_table_column(flat.parent, cfg.key_col, collection_name,
                                  kludge_rules=cfg.kludge_rules)
        parent = filter_skip_list(parent, cfg.skip)
        if cfg.dataonly:
            parent = filter_missing_destination(parent, cfg.existing_tables)

        # wide-row guard: per-table with fixed schemas (Porter.php:190-194).
        # A skipped-wide parent emits NO destination table and NO DDL —
        # the reference skips the row before ensureRowStructure, so it
        # never creates structure for skipped data.  Reference quirk
        # preserved: child spills of skipped parents still execute
        # (Porter.php:182-188 runs before the guard), so children derive
        # from the UNGUARDED frame below.
        parent_skipped = table_too_wide(df.schema, cfg.wide_row_limit)
        if parent_skipped:
            out.skipped_wide.append(collection_name)

        # stable order/parent key: `_id` for Mongo-shaped input
        # (Porter.php:116-117); first column for plain relational frames
        id_col = cfg.id_col if cfg.id_col in flat.parent.columns else df.columns[0]

        for spill in flat.spills:
            child = spill_child(df, spill, id_col=id_col)
            # per-child-table counter (Porter.php:260): two-phase global
            # sequence — never a no-partition window (children are the
            # exploded-array rows, the largest frames in the pipeline)
            child = add_num_two_phase(child, ["_parentid", "_index"])
            name = child_table_name(collection_name, spill.flat_name)
            if cfg.dataonly and name not in cfg.existing_tables:
                continue
            if name in cfg.skip:
                continue
            out.tables[name] = child

        # Schema inference for child tables: one aggregation each (child
        # frames are distinct plans; cardinality = number of spill fields).
        for t, tdf in out.tables.items():
            out.schemas[t] = infer_table_schema(tdf, strict=False)

        if not parent_skipped:
            # Routing split: ONE scan for N destination tables.  The routed
            # parent is persisted, the distinct-table collect and the single
            # grouped schema aggregation run against the cache, and each
            # per-table filter below is a narrow cache read.  (At cluster
            # scale the equivalent is a partitionBy("_table") staging write;
            # see SURVEY §3.)
            #
            # Per-table _num via grouped two-phase, NOT a window
            # partitioned by _table: a collection whose rows all route to
            # one table (every flat relational frame) would turn that
            # window into a single-reducer global sort of the whole
            # collection.
            parent = add_num_two_phase(parent, [id_col], partition_cols=["_table"])
            parent = parent.persist()
            out._cached = parent
            # The grouped inference doubles as the distinct-table pass:
            # its groupBy("_table") output keys ARE the destination-table
            # list, so ONE cache-materializing job replaces the former
            # distinct().collect() + inference pair.
            parent_schemas = infer_table_schemas_grouped(parent, "_table", strict=False)
            for t in sorted(parent_schemas):
                out.tables[t] = parent.filter(F.col("_table") == t).drop("_table")
                out.schemas[t] = parent_schemas[t]

        # DDL pass (once per table — the reference's per-row
        # ensureRowStructure collapsed into one statement batch)
        if not cfg.dataonly:
            for t in out.tables:
                schema = out.schemas[t]
                pk = (
                    ("_parentid", "_index")
                    if "__" in t
                    else ((id_col,) if id_col in schema else ())
                )
                out.ddl.extend(evolve_schema_sql(t, None, schema, pk))
        return out

    # ------------------------------------------------------------------- run

    def run_to_frames(self, collections: dict[str, DataFrame]) -> dict[str, CollectionExport]:
        """Exports are independent per collection and run SERIALLY by
        default.  Round-12 threaded them (guide §2.6); the round-12
        driver bench refuted it on cold idle local[32]: the ETL figure
        fell 830k → 662k rows/s at 32 cores while hitting 1.50M at 8 —
        concurrent exports fight for the one local executor.  On a
        real multi-executor cluster overlapping the eager
        schema-inference barriers back-fills stage tails:
        ``SPARK_GRAFT_BUILD_THREADS=N`` (N>1) opts in."""
        import os

        items = list(collections.items())
        env = os.environ.get("SPARK_GRAFT_BUILD_THREADS")
        workers = 1
        if env and env.isdigit():
            workers = max(1, min(int(env), len(items)))
        if workers <= 1 or len(items) <= 1:
            return {name: self.export_collection(df, name) for name, df in items}
        from mongo2mysql_spark.queries import parallel_branches

        return parallel_branches(
            {
                name: (lambda d=df, n=name: self.export_collection(d, n))
                for name, df in items
            },
            max_workers=workers,
        )

    def run(
        self,
        collections: dict[str, DataFrame],
        sink=None,
        ddl_executor=None,
        reporter=None,
    ) -> dict[str, CollectionExport]:
        """Full pipeline.  ``sink(table_name, df)`` writes one table
        (e.g. a partial of sources.jdbc.write_upsert or a parquet
        writer); ``ddl_executor(statements)`` applies the schema pass;
        ``reporter`` (telemetry.ProgressReporter) emits per-table row
        throughput collected DURING the sink action (A17)."""
        exports = self.run_to_frames(collections)
        for export in exports.values():
            if ddl_executor and export.ddl:
                ddl_executor(export.ddl)
            if sink:
                for t, tdf in export.tables.items():
                    if reporter is not None:
                        tdf = reporter.wrap(t, tdf)
                    sink(t, tdf)
                    if reporter is not None:
                        reporter.finish(t)
            export.unpersist()
        return exports
