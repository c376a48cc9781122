"""Golden parity: flax PoseResNet vs from-scratch torch-CPU oracle.

Pins the torch->JAX conversion conventions, especially the transposed-conv
layout+flip (SURVEY.md section 8 hard part (a))."""

import numpy as np
import pytest
import torch
import torch.nn as nn
import jax
import jax.numpy as jnp

from flowtrack_tpu.config import ModelConfig
from flowtrack_tpu.models.layers import ConvTransposeTorch
from flowtrack_tpu.models.pose_resnet import PoseResNet
from flowtrack_tpu.utils.torch_convert import (
    conv_kernel,
    convert_pose_resnet,
    deconv_kernel,
    state_dict_to_numpy,
)
from tests.oracles.pose_resnet_torch import random_pose_resnet


@pytest.mark.smoke
def test_deconv_one_layer_golden():
    """THE layout-pinning test: 1 ConvTranspose2d vs our dilated-conv twin."""
    torch.manual_seed(0)
    t = nn.ConvTranspose2d(5, 7, 4, 2, 1, bias=True).eval()
    x = torch.randn(2, 5, 8, 6)
    with torch.no_grad():
        ref = t(x).permute(0, 2, 3, 1).numpy()

    m = ConvTransposeTorch(features=7, kernel_size=4, strides=2, padding=1,
                           use_bias=True)
    params = {
        "params": {
            "kernel": jnp.asarray(deconv_kernel(t.weight.detach().numpy())),
            "bias": jnp.asarray(t.bias.detach().numpy()),
        }
    }
    out = m.apply(params, jnp.asarray(x.permute(0, 2, 3, 1).numpy()))
    assert out.shape == ref.shape == (2, 16, 12, 7)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-4)


def test_conv_kernel_layout():
    torch.manual_seed(1)
    t = nn.Conv2d(3, 8, 3, 2, 1, bias=False).eval()
    x = torch.randn(1, 3, 10, 10)
    with torch.no_grad():
        ref = t(x).permute(0, 2, 3, 1).numpy()
    out = jax.lax.conv_general_dilated(
        jnp.asarray(x.permute(0, 2, 3, 1).numpy()),
        jnp.asarray(conv_kernel(t.weight.detach().numpy())),
        window_strides=(2, 2), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-4)


@pytest.mark.slow
def test_pose_resnet50_full_parity():
    oracle = random_pose_resnet(50)
    sd = state_dict_to_numpy(oracle.state_dict())
    variables = convert_pose_resnet(sd)
    variables = jax.tree.map(jnp.asarray, variables)

    cfg = ModelConfig(num_layers=50, dtype="float32")
    model = PoseResNet(cfg=cfg)

    # structural check: converted tree must exactly match the init tree
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (2, 64, 48, 3)).astype(np.float32)
    # eval_shape: only the tree structure/shapes are needed (an unjitted
    # ResNet-50 init dispatches op-by-op for minutes — CLAUDE.md)
    init_vars = jax.eval_shape(
        lambda k, xx: model.init(k, xx, train=False),
        jax.random.PRNGKey(0), jnp.asarray(x))
    conv_paths = {jax.tree_util.keystr(k) for k, _ in
                  jax.tree_util.tree_flatten_with_path(variables)[0]}
    init_paths = {jax.tree_util.keystr(k) for k, _ in
                  jax.tree_util.tree_flatten_with_path(init_vars)[0]}
    assert conv_paths == init_paths, (
        f"missing: {sorted(init_paths - conv_paths)[:5]} "
        f"extra: {sorted(conv_paths - init_paths)[:5]}")
    for (k1, v1), (k2, v2) in zip(
            sorted(jax.tree_util.tree_flatten_with_path(variables)[0],
                   key=lambda t: jax.tree_util.keystr(t[0])),
            sorted(jax.tree_util.tree_flatten_with_path(init_vars)[0],
                   key=lambda t: jax.tree_util.keystr(t[0]))):
        assert v1.shape == v2.shape, f"{jax.tree_util.keystr(k1)}: {v1.shape} vs {v2.shape}"

    with torch.no_grad():
        ref = oracle(torch.from_numpy(x).permute(0, 3, 1, 2)) \
            .permute(0, 2, 3, 1).numpy()
    out = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-3, rtol=1e-3)


@pytest.mark.slow
@pytest.mark.parametrize("layers", [101, 152])
def test_deep_resnet_converter_structure(layers):
    """101/152: converted tree exactly matches the init tree (no forward —
    the block math is already pinned by the 50-layer golden)."""
    oracle = random_pose_resnet(layers)
    variables = convert_pose_resnet(state_dict_to_numpy(oracle.state_dict()))
    cfg = ModelConfig(num_layers=layers, dtype="float32")
    model = PoseResNet(cfg=cfg)
    init_vars = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False))
    got = {jax.tree_util.keystr(k): v.shape for k, v in
           jax.tree_util.tree_flatten_with_path(variables)[0]}
    want = {jax.tree_util.keystr(k): tuple(v.shape) for k, v in
            jax.tree_util.tree_flatten_with_path(init_vars)[0]}
    got = {k: tuple(v) for k, v in got.items()}
    assert got == want, (
        f"missing: {sorted(set(want) - set(got))[:4]} "
        f"extra: {sorted(set(got) - set(want))[:4]}")
