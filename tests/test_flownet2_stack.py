"""FlowNet2 cascade: structure smoke + converter coverage for the stack.

No released weights exist on this machine, so this pins shapes, wiring
(warp/channelnorm glue between stages) and the flownet2 name map — parity
per sub-net is pinned by test_flownet_parity.py.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from flowtrack_tpu.models.flownet import FlowNet2, FlowNetFusion, \
    preprocess_pair
from flowtrack_tpu.utils.torch_convert import convert_flownet2


@pytest.mark.slow
def test_flownet2_forward_shapes(rng):
    x = jnp.asarray(rng.normal(0, 0.3, (1, 64, 64, 6)), jnp.float32)
    model = FlowNet2(dtype=jnp.float32)
    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(0), x, train=False)
    out = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, x)
    assert out.shape == (1, 64, 64, 2)
    assert np.isfinite(np.asarray(out)).all()
    # all five sub-nets present in the tree
    subs = set(variables["params"].keys())
    assert subs == {"flownetc", "flownets_1", "flownets_2", "flownets_d",
                    "flownetfusion"}


def test_fusion_forward_shapes(rng):
    x = jnp.asarray(rng.normal(0, 0.3, (1, 32, 32, 11)), jnp.float32)
    model = FlowNetFusion(dtype=jnp.float32)
    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (1, 32, 32, 2)


def test_convert_flownet2_name_map():
    """Build a fake flownet2-style state dict from tiny arrays and check
    the converter nests every sub-net correctly."""
    sd = {}

    def conv_entry(prefix, cin, cout, k):
        sd[f"{prefix}.0.weight"] = np.zeros((cout, cin, k, k), np.float32)
        sd[f"{prefix}.0.bias"] = np.zeros((cout,), np.float32)

    # minimal slice of each sub-net
    conv_entry("flownetc.conv1", 3, 64, 7)
    sd["flownetc.predict_flow6.weight"] = np.zeros((2, 1024, 3, 3),
                                                   np.float32)
    sd["flownetc.predict_flow6.bias"] = np.zeros((2,), np.float32)
    sd["flownetc.upsampled_flow6_to_5.weight"] = np.zeros((2, 2, 4, 4),
                                                          np.float32)
    conv_entry("flownets_1.conv1", 12, 64, 7)
    conv_entry("flownets_d.conv0", 6, 64, 3)
    sd["flownets_d.inter_conv5.0.weight"] = np.zeros((512, 1026, 3, 3),
                                                     np.float32)
    sd["flownets_d.inter_conv5.0.bias"] = np.zeros((512,), np.float32)
    conv_entry("flownetfusion.conv0", 11, 64, 3)

    variables = convert_flownet2(sd)
    p = variables["params"]
    assert p["flownetc"]["conv1"]["conv"]["kernel"].shape == (7, 7, 3, 64)
    assert p["flownetc"]["trunk"]["predict_flow6"]["kernel"].shape == \
        (3, 3, 1024, 2)
    assert p["flownetc"]["trunk"]["upsampled_flow6_to_5"]["kernel"].shape \
        == (4, 4, 2, 2)
    assert p["flownets_1"]["conv1"]["conv"]["kernel"].shape == (7, 7, 12, 64)
    # SD/fusion have no trunk nesting
    assert p["flownets_d"]["inter_conv5"]["conv"]["kernel"].shape == \
        (3, 3, 1026, 512)
    assert p["flownetfusion"]["conv0"]["conv"]["kernel"].shape == \
        (3, 3, 11, 64)
