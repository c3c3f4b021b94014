from . import incremental, stream_jobs, votes  # noqa: F401
