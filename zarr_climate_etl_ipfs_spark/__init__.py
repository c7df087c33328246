"""zarr_climate_etl_ipfs_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of Arbol-Project/zarr-climate-etl-ipfs.

Design (see SURVEY.md):
  - canonical data model: a "tall" DataFrame, one row per grid cell
    ``(time, latitude, longitude [, step, ensemble, forecast_reference_offset], value)``
    instead of the reference's dense xarray/Zarr arrays (SURVEY.md §1.4);
  - storage: time-bucket-partitioned Parquet with dynamic partition overwrite
    standing in for Zarr region writes (reference: utils/publish.py:332-397);
  - everything declarative: the Catalyst optimizer replaces the reference's
    hand-built Dask graph scheduling (SURVEY.md §4).

Subpackages:
  config      dataset descriptors (port of utils/attributes.py surface)
  session     SparkSession tuning helpers
  functions   scalar/vector/text column expressions (JVM-side, no Python UDFs)
  operators   update semantics, QC, nearest/as-of, dedup, similarity, text analysis
  sources     grid store (parquet), ingest canonicalization, driver-side extractors
  plans       catalog / STAC-style metadata builders
  streaming   incremental (Structured Streaming) update path
"""

__version__ = "0.1.0"
