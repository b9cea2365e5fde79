"""Pipeline + maintenance jobs mirroring the reference's Airflow DAGs."""

from .backfill import discover_backfill_parallel
from .lake import (
    MetadataStore,
    ReplayLake,
    load_state,
    register_lake_views,
    save_state,
    state_df,
)
from .maintenance import (
    audit_lake,
    cleanup_lake,
    deduplicate_metadata,
    fix_compacted_status,
    import_existing,
    optimize_lake,
    reset_format_state,
)
from .pipeline import (
    compact,
    discover,
    discover_backfill,
    download,
    retry_failed,
    run_daily_pipeline,
)

__all__ = [
    "MetadataStore",
    "ReplayLake",
    "load_state",
    "save_state",
    "state_df",
    "register_lake_views",
    "discover",
    "discover_backfill",
    "discover_backfill_parallel",
    "download",
    "retry_failed",
    "compact",
    "run_daily_pipeline",
    "import_existing",
    "fix_compacted_status",
    "deduplicate_metadata",
    "audit_lake",
    "cleanup_lake",
    "reset_format_state",
    "optimize_lake",
]
