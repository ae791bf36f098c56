from .pipeline_stream import start_streaming_pipeline  # noqa: F401
