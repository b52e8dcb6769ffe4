from . import taxi
from .pipeline import (
    read_events_stream,
    replay_windowed_aggregate,
    stream_append_to_laketable,
    windowed_aggregate,
)

__all__ = [
    "taxi",
    "read_events_stream",
    "replay_windowed_aggregate",
    "stream_append_to_laketable",
    "windowed_aggregate",
]
