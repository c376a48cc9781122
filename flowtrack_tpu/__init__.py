"""flowtrack_tpu — TPU-native rebuild of FlowTrack (Simple Baselines pose + FlowNet tracking).

A from-scratch JAX/XLA/Pallas framework with the capabilities of
``simochen/flowtrack.pytorch`` (reference mount was empty; behavior contract
reconstructed in SURVEY.md from BASELINE.json + the FlowTrack paper,
arXiv:1804.06208, and the FlowNet papers, arXiv:1504.06852 / 1612.01925).

Design principles (TPU-first, NOT a port):
  * NHWC layouts everywhere; bfloat16 matmul path on the MXU.
  * Whole pipeline (crop -> backbone -> heatmaps -> decode -> OKS match)
    stays resident on device; only detection json in / track json out touch
    the host.
  * Batched, static-shape, jit-compiled; ragged persons-per-frame handled by
    pad-to-max + masks threaded through decode, NMS and matching.
  * Data parallelism via jax.sharding.Mesh + NamedSharding (the reference's
    nn.DataParallel equivalent, per SURVEY.md section 3 parallelism census).
"""

__version__ = "0.3.0"  # kept in lockstep with pyproject.toml (test-pinned)

from flowtrack_tpu import config  # noqa: F401
