"""Pure Column-expression helpers (JVM-side, whole-stage-codegen
friendly; no Python UDFs in any hot path)."""

from nyc_crash_mapper_etl_script_spark.functions.geo import (  # noqa: F401
    haversine_m,
    haversine_m_exact,
    point,
    point_in_polygon,
    point_in_circle_m,
    bbox_contains,
    polygon_bbox,
)
from nyc_crash_mapper_etl_script_spark.functions.datetime_fns import (  # noqa: F401
    combine_date_time,
    derive_year_month,
    months_back,
    updated_after_created,
)
from nyc_crash_mapper_etl_script_spark.functions.arrays import (  # noqa: F401
    collapse_numbered_columns,
    split_strip_quotes,
)
from nyc_crash_mapper_etl_script_spark.functions.fingerprint import row_fingerprint  # noqa: F401
