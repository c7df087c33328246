"""Column-expression library. Everything here returns pyspark Column objects
built from pyspark.sql.functions — JVM-side, whole-stage-codegen friendly.
No row-at-a-time Python UDFs."""

from zarr_climate_etl_ipfs_spark.functions.scalars import (  # noqa: F401
    cf_decode_time,
    cf_encode_time,
    is_extreme,
    is_infinityish,
    mask_sentinel,
    normalize_longitude,
    snap_to_grid,
)
from zarr_climate_etl_ipfs_spark.functions.vectors import (  # noqa: F401
    cosine_similarity,
    dot,
    l2_norm,
)
