"""Evaluators: COCO keypoint AP (OKS), PCKh, CLEAR-MOT (SURVEY.md L4)."""
