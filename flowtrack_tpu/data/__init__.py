"""Datasets + host data pipeline (SURVEY.md L1).

COCO / PoseTrack / MPII keypoint datasets with the reference's crop +
augmentation semantics, a minimal COCO-json index (pycocotools is not
installed), and a threaded prefetching batch loader feeding device batches.
"""

from flowtrack_tpu.data.coco import COCODataset  # noqa: F401
from flowtrack_tpu.data.coco_io import COCOIndex  # noqa: F401
from flowtrack_tpu.data.loader import BatchLoader  # noqa: F401
from flowtrack_tpu.data.mpii import MPIIDataset  # noqa: F401
from flowtrack_tpu.data.posetrack import PoseTrackDataset  # noqa: F401
