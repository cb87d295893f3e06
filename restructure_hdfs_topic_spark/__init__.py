"""restructure_hdfs_topic_spark — a PySpark-native analytics engine with the
query/data-processing capabilities of RADAR-base radar-output-restructure
(reference: RADAR-CNS/Restructure-HDFS-topic, surveyed in SURVEY.md).

Not a port: every operator of the reference's Kotlin dataflow pipeline is
re-expressed as declarative Spark DataFrame / SQL plans so Catalyst + Tungsten
pick the physical strategy. Package layout:

- ``session``    — SparkSession builder with scale-aware defaults (AQE on).
- ``config``     — YAML + env config (reference: config/RestructureConfig.kt).
- ``functions``  — scalar column expressions (time extraction, binning, path
  sanitize/template, filename parsing, text analysis, vector math).
- ``operators``  — dataflow operators (flatten, dedup, offset accounting,
  cleaner verification, similarity search, multimodal plumbing).
- ``sources``    — source-file manifest construction and Avro ingest.
- ``plans``      — end-to-end pipeline compositions (the ``restructure`` job).
- ``streaming``  — Structured Streaming service mode (reference: worker/Job.kt).
"""

__version__ = "0.1.0"
