"""omfietser_etl_spark — a PySpark-native analytics/ETL engine.

A from-scratch re-expression of the capabilities of the reference ETL
(coolbox13/omfietser-etl, surveyed in SURVEY.md) as idiomatic Spark
DataFrame / SQL pipelines, plus the large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal
plumbing) the reference's mechanisms generalize to.

Layout
------
- ``session``    : SparkSession factory with scale-ready defaults (AQE etc.)
- ``schemas``    : StructTypes for the shop raw inputs + the 32-col unified row
- ``config``     : config-as-data tables (unit aliases, promotion patterns,
                   category canon) mirroring the reference's layout
- ``functions``  : scalar expression builders (text, price, promotion,
                   quantity) — pure Column compositions, JVM-side
- ``operators``  : relational operators (dedupe, joins, aggregates, top-k,
                   set ops, merge/upsert, category cascade)
- ``textops``    : document-scale operators (minhash/simhash dedup, jaccard,
                   embedding similarity, language id, quality scoring)
- ``multimodal`` : binary-column plumbing (decode/feature stubs, real
                   Spark-side schema + batching)
- ``pipelines``  : per-shop raw→unified transform pipelines (AH, Jumbo,
                   Aldi, Plus)
- ``streaming``  : incremental/stateful semantics (latest-state merge,
                   change detection, windowed rollups)
- ``catalog``    : the declared query inventory (SURVEY §2) with DuckDB
                   oracle SQL for the correctness gate
"""

__version__ = "0.1.0"
