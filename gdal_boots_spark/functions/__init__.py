from .geometry_fns import (  # noqa: F401
    GEOMETRY_TYPE,
    cell_id_col,
    geojson_decode_udf,
    geojson_encode_udf,
    geom_bounds_udf,
    cells_cover_udf,
    transform_geom_udf,
    point_xy_udf,
)
