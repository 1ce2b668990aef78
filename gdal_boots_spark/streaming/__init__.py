from .doc_stream import stream_cell_assign, stream_cell_counts  # noqa: F401
