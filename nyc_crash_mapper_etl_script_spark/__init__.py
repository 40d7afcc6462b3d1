"""PySpark-native analytics engine with the query/data-processing
capabilities of GreenInfo-Network/nyc-crash-mapper-etl-script.

The reference (see /root/reference, SURVEY.md) is a query *generator*
that ships SQL text to hosted engines (CARTO PostgreSQL/PostGIS,
Socrata SoQL, MySQL). This package re-expresses the same relational
semantics as native Spark DataFrame plans: Catalyst owns optimization
(pushdown, pruning, join strategy, AQE), Tungsten owns execution.

Layout:
    session     -- SparkSession builder tuned for both local tests and
                   large-cluster deployment
    schemas     -- declared StructTypes (crash domain + harness tables)
    sources/    -- readers (parquet/json/csv/jdbc snapshots) and
                   functional sinks (merge-append, overwrite views)
    functions/  -- pure Column-expression helpers (datetime, arrays,
                   geo/haversine/point-in-polygon, fingerprints, text,
                   vectors)
    operators/  -- composed dataflow operators (dedup merge, CDC
                   classify, reconciliation, enrichment, blame
                   allocation, top-k, text dedup, similarity search,
                   multimodal plumbing)
    plans/      -- end-to-end pipeline DAGs (nightly ETL, backfill)
    streaming/  -- Structured Streaming variants of the incremental
                   ingest loop
"""

__version__ = "0.1.0"
