from .synth import (  # noqa: F401
    RECTS,
    interleaved_docs,
    rect_polygons_df,
    rects_sql_values,
    GEO_MOD,
    MEDIA_MOD,
)
