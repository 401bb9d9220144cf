from streaming_data_pipeline_capstone_spark.functions.cleaning import (
    bbox_filter,
    null_sentinels,
    rot_decode,
    spike_repair,
)
from streaming_data_pipeline_capstone_spark.functions.geo import (
    affine_coefficients,
    apply_affine,
    ecef_x,
    ecef_y,
    haversine_km,
    path_angle_deg,
    wkt_point_lonlat,
)

__all__ = [
    "affine_coefficients",
    "apply_affine",
    "bbox_filter",
    "ecef_x",
    "ecef_y",
    "haversine_km",
    "null_sentinels",
    "path_angle_deg",
    "rot_decode",
    "spike_repair",
    "wkt_point_lonlat",
]
