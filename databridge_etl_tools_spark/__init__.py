"""databridge_etl_tools_spark — a PySpark-native analytics/ETL engine.

A from-scratch, Spark-first re-expression of the capabilities of
CityOfPhiladelphia/databridge-etl-tools (reference surveyed in
/root/repo/SURVEY.md): schema-driven CSV/Parquet/JDBC-ish pipelines,
prepare transforms (geometry EWKT conventions, timezone policies,
header normalization), upsert/delete-stale merge semantics, QA
checks — plus large-scale training-data operators (dedup families,
similarity search, text analysis, multimodal plumbing).

Everything is declarative DataFrame/SQL so Catalyst plans it; Python
UDFs appear only as Arrow-vectorized pandas UDFs on genuinely
non-relational work (shapely/pyproj geometry, REST batching).
"""

__version__ = "0.1.0"
