"""food_panda_etl_spark — a PySpark-native analytics engine.

Re-expresses the query and data-processing capabilities of the reference
ETL pipeline (0xlearner/food-panda-etl, Rust) as an idiomatic Spark
DataFrame/SQL engine, extended with LLM-data-pipeline operators
(dedup, similarity search, multimodal columns, text analysis).

Design posture (100 TB): declarative DataFrame plans only — Catalyst does
predicate pushdown / column pruning / join selection; AQE handles skew and
runtime re-planning. No driver-side collect() in any engine path, no
row-at-a-time Python UDFs in hot paths (Arrow-batched pandas UDFs only
where built-ins cannot express the semantics).
"""

from food_panda_etl_spark.config import Settings
from food_panda_etl_spark.session import get_spark
from food_panda_etl_spark.tables import TABLES, load_table, load_tables

__all__ = ["Settings", "get_spark", "TABLES", "load_table", "load_tables"]
__version__ = "0.1.0"
