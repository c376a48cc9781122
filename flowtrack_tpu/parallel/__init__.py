"""SPMD parallelism: mesh construction + sharding helpers.

The reference's only parallelism is single-process ``nn.DataParallel``
replicate-scatter-gather over local GPUs (SURVEY.md section 3 parallelism
census). The TPU-native equivalent implemented here: batch sharding over a
1-D device mesh via ``jax.sharding.NamedSharding``, with XLA emitting the
(ICI) collectives — no custom comm layer, per SURVEY.md section 6.8.
"""

from flowtrack_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    batch_sharding,
    make_mesh,
    pad_to_multiple,
    replicated,
    shard_batch,
)
