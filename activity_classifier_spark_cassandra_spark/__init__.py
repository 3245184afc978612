"""PySpark-native analytics engine with the query & data-processing
capabilities of the reference ``jainikvora/activity-classifier-spark-cassandra``
(a Java 8 / Spark 1.3 RDD batch job classifying human activity from
triaxial accelerometer time series), re-expressed Spark-first:

- DataFrame / Spark SQL everywhere (Catalyst plans; zero RDDs).
- Sessionization & tumbling windows as window functions + one grouped
  aggregation (the reference drove thousands of tiny jobs from a
  driver-side nested loop — see SURVEY.md §3).
- spark.ml Pipelines instead of mllib RDD models.
- Extension operators for large-scale training-data pipelines:
  dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard), similarity
  search over embeddings, text analysis, multimodal binary columns,
  and a Structured Streaming variant of the batch feature pipeline.
"""

__version__ = "0.1.0"
