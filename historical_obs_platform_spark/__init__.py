"""historical_obs_platform_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of Eagle-Rock-Analytics/historical-obs-platform (a
per-station pandas/xarray QA/QC pipeline for historical weather
observations), designed Spark-first:

- one long-format observations table ``(station, time, <vars...>)``
  instead of one file/process per station;
- every QA/QC test is a pure ``DataFrame -> DataFrame`` transform that
  only adds/updates ``<var>_eraqc`` flag columns;
- ``station`` is the partitioning key everywhere; windows are
  ``Window.partitionBy("station").orderBy("time")``;
- scipy-dependent pieces are grouped-map pandas UDFs; everything else
  is native Catalyst expressions.

Plus the large-scale training-data-pipeline operators a 100 TB corpus
needs: dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard),
similarity search, text analysis, and multimodal column plumbing.
"""

__version__ = "0.1.0"
