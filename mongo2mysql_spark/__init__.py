"""mongo2mysql_spark — a PySpark-native rebuild of vanilla/mongo2mysql.

The reference (``/root/reference``, 560 LoC of PHP) is a one-shot
MongoDB→MySQL ETL tool: flatten nested documents, divert arrays to child
tables, infer + widen a relational schema, upsert rows.  This package
re-expresses those semantics as Spark DataFrame transformations (see
SURVEY.md §2 for the operator inventory A1-A18) and adds the
LLM-data-pipeline extension layer (dedup / similarity / text analysis /
multimodal) mandated by BASELINE.json's north star.

Design rules (SURVEY.md §4): DataFrame/Catalyst-native, no RDDs, no
custom Catalyst rules; Python UDFs only where column expressions cannot
express the semantics (and then Arrow-vectorized).
"""

from mongo2mysql_spark.session import build_session

__all__ = ["build_session"]
__version__ = "0.1.0"
