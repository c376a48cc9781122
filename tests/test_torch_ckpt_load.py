"""torch .pth checkpoint ingestion: torch.save -> load_torch_file ->
convert -> flax forward parity (the real user migration path)."""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from flowtrack_tpu.config import ModelConfig
from flowtrack_tpu.models.pose_resnet import PoseResNet
from flowtrack_tpu.utils.torch_convert import (
    convert_pose_resnet,
    load_torch_file,
)
from tests.oracles.pose_resnet_torch import random_pose_resnet

pytestmark = pytest.mark.slow


def test_pth_roundtrip_forward_parity(tmp_path, rng):
    oracle = random_pose_resnet(50, seed=3)
    # save both bare and wrapped (module./'state_dict') forms the lineage
    # produces
    p1 = tmp_path / "bare.pth"
    torch.save(oracle.state_dict(), p1)
    p2 = tmp_path / "wrapped.pth"
    torch.save({"epoch": 7, "state_dict": {
        "module." + k: v for k, v in oracle.state_dict().items()}}, p2)

    x = rng.normal(0, 1, (1, 64, 48, 3)).astype(np.float32)
    with torch.no_grad():
        want = oracle(torch.from_numpy(x).permute(0, 3, 1, 2)) \
            .permute(0, 2, 3, 1).numpy()

    model = PoseResNet(cfg=ModelConfig(num_layers=50, dtype="float32"))
    for path in (p1, p2):
        sd = load_torch_file(str(path))
        variables = jax.tree.map(jnp.asarray, convert_pose_resnet(sd))
        out = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
        np.testing.assert_allclose(out, want, atol=2e-3, rtol=1e-3)


def test_reverse_export_forward_parity(rng):
    """The deploy-back path with weights that NEVER came from torch: a fresh
    flax init reversed to a torch state_dict must strict-load and produce
    the same forward outputs as the flax model (TPU-trained weights running
    on the reference stack)."""
    from flowtrack_tpu.utils.torch_convert import reverse_pose_resnet

    model = PoseResNet(cfg=ModelConfig(num_layers=50, dtype="float32"))
    x = rng.normal(0, 1, (1, 64, 48, 3)).astype(np.float32)
    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(11), jnp.asarray(x), train=False)
    want = np.asarray(model.apply(variables, jnp.asarray(x), train=False))

    sd = reverse_pose_resnet(jax.tree.map(np.asarray, variables))
    oracle = random_pose_resnet(50, seed=13)
    oracle.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                            for k, v in sd.items()}, strict=True)
    oracle.eval()
    with torch.no_grad():
        got = oracle(torch.from_numpy(x).permute(0, 3, 1, 2)) \
            .permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)
