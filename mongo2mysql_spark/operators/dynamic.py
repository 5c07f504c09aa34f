"""Dynamic-schema payloads (SURVEY.md §7 Step 2 hard part).

The reference sees types per row (PHP assoc arrays); a DataFrame is
fixed-schema.  Fully schemaless rows therefore ride in as a JSON string
column and are flattened after schema inference over a SAMPLE:

1. sample N non-null payloads (one small ``limit``-ed collect — the
   only driver-side materialization, bounded by ``sample`` rows);
2. infer a struct schema from the sample via ``spark.read.json`` (the
   same inference the mongo connector applies server-side);
3. ``from_json`` the full column with that schema and flatten as usual
   (operators/flatten.py).

Divergence window (documented, SURVEY §7): the reference widens types
per row over the whole collection; we see types per sample.  A field
first appearing after the sample horizon is absent from the schema —
``columnNameOfCorruptRecord``-style leftovers can be captured by
keeping the raw column alongside.  At 100 TB the sample is what makes
this tractable: full-scan inference would double the read.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def infer_json_schema(df: DataFrame, col: str, sample: int = 200) -> T.StructType:
    spark = df.sparkSession
    rows = [r[0] for r in df.select(col).filter(F.col(col).isNotNull()).limit(sample).collect()]
    if not rows:
        return T.StructType([])
    from pyspark.sql import Row

    sampled = spark.createDataFrame([Row(payload=s) for s in rows])
    return spark.read.json(sampled.rdd.map(lambda r: r.payload)).schema


def parse_json_column(
    df: DataFrame, col: str, sample: int = 200, keep_raw: bool = False,
    prefix: str | None = None,
) -> DataFrame:
    """Replace a JSON string column with its flattened struct fields
    (path-prefixed with the column name, matching A8 naming)."""
    schema = infer_json_schema(df, col, sample)
    prefix = prefix if prefix is not None else col
    parsed = df.withColumn("__parsed", F.from_json(F.col(col), schema))
    out_cols: list[Column] = [F.col(c) for c in df.columns if c != col or keep_raw]
    for field in schema.fields:
        out_cols.append(F.col(f"__parsed.{field.name}").alias(f"{prefix}_{field.name}"))
    return parsed.select(*out_cols)
