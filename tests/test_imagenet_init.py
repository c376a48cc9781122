"""ImageNet backbone init: torchvision-style state_dict overlays onto the
PoseResNet backbone while the head keeps its fresh init."""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from flowtrack_tpu.config import ModelConfig
from flowtrack_tpu.models.pose_resnet import PoseResNet
from flowtrack_tpu.utils.torch_convert import (
    init_backbone_from_imagenet,
    state_dict_to_numpy,
)
from tests.oracles.pose_resnet_torch import random_pose_resnet


@pytest.mark.slow
def test_backbone_overlay(rng):
    # the oracle's backbone keys ARE torchvision-style (conv1/bn1/layerL.B)
    oracle = random_pose_resnet(50, seed=11)
    sd = {k: v for k, v in state_dict_to_numpy(oracle.state_dict()).items()
          if not k.startswith(("deconv_layers", "final_layer"))}

    cfg = ModelConfig(num_layers=50, dtype="float32")
    model = PoseResNet(cfg=cfg)
    fresh = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    merged = init_backbone_from_imagenet(fresh, sd)

    # backbone conv1 now equals the torch weights
    want = np.transpose(sd["conv1.weight"], (2, 3, 1, 0))
    np.testing.assert_array_equal(
        np.asarray(merged["params"]["backbone"]["conv1"]["kernel"]), want)
    # BN stats transferred
    np.testing.assert_array_equal(
        np.asarray(merged["batch_stats"]["backbone"]["bn1"]["mean"]),
        sd["bn1.running_mean"])
    # head untouched
    np.testing.assert_array_equal(
        np.asarray(merged["params"]["final"]["kernel"]),
        np.asarray(fresh["params"]["final"]["kernel"]))
    # structure unchanged -> still applies
    out = model.apply(merged, jnp.zeros((1, 64, 64, 3)), train=False)
    assert out.shape == (1, 16, 16, 17)
