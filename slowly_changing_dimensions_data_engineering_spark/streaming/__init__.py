from .ann_stream import load_centroids, start_streaming_ann_index  # noqa: F401
from .dedup_stream import start_streaming_dedup  # noqa: F401
from .pipeline_stream import start_streaming_pipeline  # noqa: F401
from .mv_stream import start_streaming_mv  # noqa: F401
from .join_stream import start_click_attribution  # noqa: F401
