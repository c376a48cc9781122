"""Fused bottleneck-stage kernels (ops/fused_resnet): the Pallas kernel is
bitwise vs its jnp twin (interpret mode), the twin matches the flax model at
bf16 tolerance, and the whole-model adapter reproduces the float model's
heatmaps. Hardware behavior (Mosaic compile + the measured perf
falsification) is documented in the module docstring and exercised by
``BENCH_FUSED=1 python bench.py`` on the real chip."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from flax import linen as nn

# Experimental subsystem (kept as a reproducible falsification record —
# measured SLOWER than plain XLA on the chip, see module under test): its
# bitwise-equality suite is the fast tier's single heaviest file (~290 s),
# so the whole file rides the slow tier.
pytestmark = pytest.mark.slow

from flowtrack_tpu.config import ModelConfig
from flowtrack_tpu.models.pose_resnet import Bottleneck, get_pose_net
from flowtrack_tpu.models.quantize import _fold
from flowtrack_tpu.ops.fused_resnet import (
    FusedPoseAdapter,
    fuse_pose_model,
    fused_stage_pallas,
    fused_stage_ref,
    prepare_fused_variables,
)


def _fold_stage(params, stats, nb):
    """Flax stage variables -> fused block params via the kernel's own
    layout helper (block_from_folded — single source of truth)."""
    from flowtrack_tpu.ops.fused_resnet import block_from_folded
    blocks = []
    for bi in range(nb):
        bp, bs = params[f"layer9_{bi}"], stats[f"layer9_{bi}"]
        node = {}
        for ci in ("conv1", "conv2", "conv3"):
            bn = "bn" + ci[-1]
            k, b = _fold(bp[ci]["kernel"], {**bp[bn], **bs[bn]})
            node[ci] = {"kernel": k, "bias": b}
        if "downsample_conv" in bp:
            k, b = _fold(bp["downsample_conv"]["kernel"],
                         {**bp["downsample_bn"], **bs["downsample_bn"]})
            node["downsample_conv"] = {"kernel": k, "bias": b}
        blocks.append(block_from_folded(node))
    return blocks


class _Stage(nn.Module):
    features: int
    num_blocks: int
    strides: int

    @nn.compact
    def __call__(self, x, train=False):
        for b in range(self.num_blocks):
            x = Bottleneck(features=self.features,
                           strides=self.strides if b == 0 else 1,
                           downsample=b == 0, dtype=jnp.bfloat16,
                           name=f"layer9_{b}")(x, train)
        return x


def _rand_stats(tree, rng):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out[k] = _rand_stats(v, rng)
        elif k == "mean":
            out[k] = jnp.asarray(rng.normal(0, 0.1, v.shape), jnp.float32)
        else:
            out[k] = jnp.asarray(rng.uniform(0.5, 1.5, v.shape), jnp.float32)
    return out


@pytest.mark.parametrize("feat,nb,stride,shape", [
    (8, 3, 1, (4, 16, 12, 8)),       # im2col-era small F, layer1-like
    (16, 2, 2, (4, 16, 12, 32)),     # striding first block (XLA path)
    (128, 2, 1, (2, 8, 8, 128)),     # full-lane F
])
def test_fused_stage_matches_flax_and_kernel_bitwise(
        rng, feat, nb, stride, shape):
    mod = _Stage(feat, nb, stride)
    x = jnp.asarray(rng.normal(0, 1, shape), jnp.bfloat16)
    v = mod.init(jax.random.PRNGKey(0), x[:1])
    v = {"params": v["params"],
         "batch_stats": _rand_stats(v["batch_stats"], rng)}
    blocks = _fold_stage(v["params"], v["batch_stats"], nb)

    want = np.asarray(mod.apply(v, x), np.float32)
    ref = np.asarray(fused_stage_ref(x, blocks, stride), np.float32)
    scale = max(np.abs(want).max(), 1e-6)
    assert np.abs(ref - want).max() / scale < 0.03  # bf16 + folded BN

    got = np.asarray(
        fused_stage_pallas(x, blocks, stride, interpret=True), np.float32)
    if stride == 1:
        # every block runs in the kernel: bitwise vs the jnp twin
        np.testing.assert_array_equal(got, ref)
    else:
        # the striding first block runs through XLA convs (different but
        # equivalent accumulation order)
        assert np.abs(got - ref).max() / scale < 0.03


MODEL_CFG = ModelConfig(num_layers=50, image_size=(64, 64),
                        heatmap_size=(16, 16), dtype="bfloat16")


def test_fused_adapter_matches_float_model(rng):
    model = get_pose_net(MODEL_CFG)
    x = jnp.asarray(rng.normal(0, 1, (2, 64, 64, 3)), jnp.float32)
    v = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(0), x, train=False)
    v = {"params": v["params"],
         "batch_stats": _rand_stats(v["batch_stats"], rng)}
    want = np.asarray(model.apply(v, x, train=False))

    adapter, fused_vars = fuse_pose_model(MODEL_CFG, v, use_pallas=True,
                                          interpret=True)
    got = np.asarray(adapter.apply(fused_vars, x, train=False))
    assert got.shape == want.shape
    scale = max(np.abs(want).max(), 1e-6)
    assert np.abs(got - want).max() / scale < 0.05

    # the XLA fallback agrees with the kernel path
    adapter2 = FusedPoseAdapter(MODEL_CFG, use_pallas=False)
    got2 = np.asarray(adapter2.apply(fused_vars, x, train=False))
    assert np.abs(got2 - want).max() / scale < 0.05


def test_fused_adapter_pads_ragged_batch(rng):
    """Batches that don't divide the tile size are padded and sliced back."""
    model = get_pose_net(MODEL_CFG)
    x = jnp.asarray(rng.normal(0, 1, (3, 64, 64, 3)), jnp.float32)
    v = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(0), x[:1], train=False)
    fused_vars = prepare_fused_variables(v, 50)
    adapter = FusedPoseAdapter(MODEL_CFG, use_pallas=True, interpret=True)
    got3 = np.asarray(adapter.apply(fused_vars, x, train=False))
    assert got3.shape[0] == 3  # the padded batch must be SLICED back
    got1 = np.asarray(adapter.apply(fused_vars, x[:1], train=False))
    np.testing.assert_allclose(got3[:1], got1, rtol=0, atol=1e-5)


def test_fused_rejects_basic_block_nets():
    cfg = ModelConfig(num_layers=18, image_size=(64, 64),
                      heatmap_size=(16, 16))
    with pytest.raises(ValueError):
        fuse_pose_model(cfg, {"params": {}, "batch_stats": {}})
