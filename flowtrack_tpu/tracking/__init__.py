"""FlowTrack video pipeline: flow propagation + greedy OKS ID assignment
(SURVEY.md L5)."""

from flowtrack_tpu.tracking.tracker import (  # noqa: F401
    FlowTracker,
    boxes_from_poses,
    greedy_match,
    propagate_poses,
)
