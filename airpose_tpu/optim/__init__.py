from .bundle_adjust import (
    BAConfig,
    BAState,
    bundle_adjust,
    bundle_adjust_sharded,
    export_results,
    init_from_predictions,
    joints_only_forward,
)

__all__ = [
    "BAConfig",
    "BAState",
    "bundle_adjust",
    "bundle_adjust_sharded",
    "export_results",
    "init_from_predictions",
    "joints_only_forward",
]
