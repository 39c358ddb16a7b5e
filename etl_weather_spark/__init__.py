"""etl_weather_spark — a PySpark-native analytics engine.

A brand-new, Spark-first implementation of the query and data-processing
capabilities of the reference pipeline (``Velubby/etl-weather``): columnar
JSON normalization, hourly/daily weather+air-quality tables, categorical
binning, window analytics, multi-city comparison — plus the large-scale
training-data operators (dedup, similarity search, text analysis,
multimodal plumbing) a 100 TB pipeline needs.

Design stance (SURVEY.md §7.0):
- Everything is a lazy DataFrame plan; Catalyst plans the physical
  execution. ``collect()`` happens only at the serving/report edge.
- bronze (raw documents) → silver (canonical hourly) → gold (daily +
  flags) lakehouse layering.
- Thresholds are defined exactly once in :mod:`etl_weather_spark.config`
  (the reference duplicates its PM2.5 binning in five places).
"""

__version__ = "0.1.0"
