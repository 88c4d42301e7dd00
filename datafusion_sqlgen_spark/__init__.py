"""datafusion_sqlgen_spark — a PySpark-native analytics engine.

Re-expresses the capability surface of the reference repo
``JanKaul/datafusion-sqlgen`` (a DataFusion logical-plan -> SQL unparser,
see /root/reference/datafusion-sqlgen/src/logical_plan.rs:10) Spark-first:

* an expression + plan IR (``expressions``, ``plans``) that dual-renders to
  (a) PySpark DataFrame calls and (b) SQL text — in both the Spark dialect
  (executed via ``spark.sql``) and the DuckDB dialect (the oracle), making
  the reference's round-trip invariant an *executable-equivalence* invariant;
* sources/sinks (``sources``), the scalar/aggregate/window function registry
  (``functions``), large-scale LLM-data-pipeline operators (``operators``:
  dedup, similarity search, text analysis, multimodal), and a Structured
  Streaming layer (``streaming``).

Everything is DataFrame/Spark-SQL declarative so Catalyst owns optimization
(pushdown, pruning, join selection, AQE); Python UDFs appear only as
Arrow-vectorized pandas UDFs where built-ins cannot express the semantics.
"""

from datafusion_sqlgen_spark.session import get_spark
from datafusion_sqlgen_spark.catalog import TABLES, register_tables
from datafusion_sqlgen_spark.parser import parse_sql

__all__ = ["get_spark", "register_tables", "TABLES", "parse_sql"]
__version__ = "0.1.0"
