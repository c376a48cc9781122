"""Golden parity: flax FlowNet family vs from-scratch torch-CPU oracles.

Exercises the torch->JAX name map for the flow nets (trunk nesting, the
Sequential conv wrapping, the bias-less upsampled_flow deconvs) and the
correlation-in-the-middle wiring of FlowNetC.
"""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from flowtrack_tpu.models.flownet import (
    FlowNetC,
    FlowNetS,
    FlowNetSD,
    flow_at_full_res,
    preprocess_pair,
)
from flowtrack_tpu.utils.torch_convert import (
    convert_flownet_s,
    convert_flownet_sd,
    state_dict_to_numpy,
)
from tests.oracles.flownet_torch import (
    FlowNetCTorch,
    FlowNetSDTorch,
    FlowNetSTorch,
    random_net,
)


def _structural_match(variables, model, x):
    init_vars = model.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    got = {jax.tree_util.keystr(k): v.shape for k, v in
           jax.tree_util.tree_flatten_with_path(variables)[0]}
    want = {jax.tree_util.keystr(k): v.shape for k, v in
            jax.tree_util.tree_flatten_with_path(init_vars)[0]}
    assert got == want, (
        f"missing: {sorted(set(want) - set(got))[:5]} "
        f"extra: {sorted(set(got) - set(want))[:5]}")


def _run_parity(oracle, model, converter, x_nhwc, atol=2e-4):
    sd = state_dict_to_numpy(oracle.state_dict())
    variables = jax.tree.map(jnp.asarray, converter(sd))
    _structural_match(variables, model, x_nhwc)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(x_nhwc).permute(0, 3, 1, 2)) \
            .permute(0, 2, 3, 1).numpy()
    out = np.asarray(model.apply(variables, jnp.asarray(x_nhwc), train=False))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=atol, rtol=1e-3)


@pytest.mark.slow
def test_flownet_s_parity():
    rng = np.random.default_rng(0)
    x = rng.normal(0, 0.3, (1, 64, 64, 6)).astype(np.float32)
    _run_parity(random_net(FlowNetSTorch), FlowNetS(dtype=jnp.float32),
                convert_flownet_s, x)


@pytest.mark.slow
def test_flownet_c_parity():
    rng = np.random.default_rng(1)
    x = rng.normal(0, 0.3, (1, 64, 64, 6)).astype(np.float32)
    # small displacement grid keeps the naive torch correlation cheap
    _run_parity(random_net(FlowNetCTorch, md=4, s2=2),
                FlowNetC(dtype=jnp.float32, max_displacement=4,
                         corr_stride2=2),
                convert_flownet_s, x)


@pytest.mark.slow
def test_flownet_sd_parity():
    rng = np.random.default_rng(2)
    x = rng.normal(0, 0.3, (1, 64, 64, 6)).astype(np.float32)
    _run_parity(random_net(FlowNetSDTorch), FlowNetSD(dtype=jnp.float32),
                convert_flownet_sd, x)


@pytest.mark.smoke
def test_preprocess_pair_and_upsample():
    rng = np.random.default_rng(3)
    im1 = rng.integers(0, 256, (2, 8, 8, 3)).astype(np.float32)
    im2 = rng.integers(0, 256, (2, 8, 8, 3)).astype(np.float32)
    x = np.asarray(preprocess_pair(im1, im2))
    assert x.shape == (2, 8, 8, 6)
    # mean over both frames removed per image
    pair = np.stack([im1, im2], 1)
    mean = pair.mean(axis=(1, 2, 3), keepdims=True)
    np.testing.assert_allclose(
        x, np.concatenate([(pair[:, 0] - mean[:, 0]) / 255.0,
                           (pair[:, 1] - mean[:, 0]) / 255.0], -1),
        rtol=1e-5, atol=1e-5)

    q = rng.normal(size=(1, 4, 4, 2)).astype(np.float32)
    up = np.asarray(flow_at_full_res(jnp.asarray(q), div_flow=20.0))
    assert up.shape == (1, 16, 16, 2)
    # bilinear x4 preserves the mean up to edge effects; check scale factor
    np.testing.assert_allclose(up.mean(), 20.0 * q.mean(), rtol=0.2, atol=0.05)
