"""fhc_rco_etl_scalable_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query semantics of the reference
``visuc9/fhc-rco-etl-scalable`` pipeline (Rapid-ChangeOver analysis ETL:
changeover detection, sessionization, as-of product resolution, Gantt
timeline generation, incremental watermark loads) as an idiomatic
Spark DataFrame/SQL engine, plus first-class large-scale training-data
operators (dedup, similarity search, text analysis).

Design stance (see SURVEY.md):
- declarative DataFrame plans, Catalyst does the optimizing;
- every reference row-loop re-expressed as windows/joins/arrays+explode;
- zero row-at-a-time Python UDFs in hot paths;
- partitioning by (LINE/Server) keys so every stage scales horizontally.
"""

__version__ = "0.1.0"
