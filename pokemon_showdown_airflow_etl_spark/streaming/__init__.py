"""Structured Streaming formulation of the batch-incremental ingest."""

from .battlelog import (
    start_move_usage_rollup,
    start_session_rollup,
    stream_move_usage,
    stream_player_sessions,
)
from .ingest import (
    daily_rollup,
    dedup_within_watermark,
    start_daily_rollup,
    start_metadata_registration,
    stream_replay_docs,
    with_late_data_bounds,
)
from .stateful import (
    start_cursor_tracking,
    start_trending_terms,
    track_format_cursors,
    track_trending_terms,
)

from .admission import (
    start_document_admission,
    start_embedding_admission,
    start_image_admission,
)

__all__ = [
    "start_document_admission",
    "start_embedding_admission",
    "start_image_admission",
    "stream_replay_docs",
    "with_late_data_bounds",
    "dedup_within_watermark",
    "daily_rollup",
    "start_metadata_registration",
    "start_daily_rollup",
    "track_format_cursors",
    "start_cursor_tracking",
    "track_trending_terms",
    "start_trending_terms",
    "stream_move_usage",
    "start_move_usage_rollup",
    "stream_player_sessions",
    "start_session_rollup",
]
