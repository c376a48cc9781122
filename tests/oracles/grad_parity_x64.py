"""Runnable fp64 gradient-parity check (torch autograd vs jax.grad).

Executed in a SUBPROCESS by tests/test_train_grad_parity.py because
``jax_enable_x64`` is process-global and would poison the rest of the
suite. Exits nonzero with a message on any mismatch.

At float64 the full train-mode backward through PoseResNet-50 (two-pass
batch-stat BatchNorm, torch-exact deconv, maxpool, JointsMSELoss) matches
torch autograd to ~2e-8 (measured); the threshold below is 1e-6.
"""

import sys

import numpy as np
import torch
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402


def main():
    sys.path.insert(0, ".")
    from flowtrack_tpu.config import ModelConfig
    from flowtrack_tpu.models.pose_resnet import get_pose_net
    from flowtrack_tpu.utils.torch_convert import (convert_pose_resnet,
                                                   state_dict_to_numpy)
    from tests.oracles.pose_resnet_torch import random_pose_resnet

    rng = np.random.default_rng(0)
    oracle = random_pose_resnet(50, seed=9).double()
    oracle.train()
    n, k = 2, 17
    x = rng.normal(0, 1, (n, 64, 64, 3))
    target = rng.uniform(0, 1, (n, 16, 16, k))
    tw = (rng.uniform(0, 1, (n, k)) > 0.3).astype(np.float64)

    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    tt = torch.from_numpy(target).permute(0, 3, 1, 2)
    out = oracle(xt)
    pred = out.reshape(n, k, -1) * torch.from_numpy(tw)[..., None]
    targ = tt.reshape(n, k, -1) * torch.from_numpy(tw)[..., None]
    loss_t = (0.5 * ((pred - targ) ** 2).mean(dim=(0, 2))).mean()
    loss_t.backward()
    grads_sd = {nm: p.grad.detach().numpy().copy()
                for nm, p in oracle.named_parameters()}
    sd0 = state_dict_to_numpy(random_pose_resnet(50, seed=9).double()
                              .state_dict())
    want = convert_pose_resnet(
        {kk: grads_sd.get(kk, v) for kk, v in sd0.items()})["params"]

    variables = jax.tree.map(lambda a: jnp.asarray(a, jnp.float64),
                             convert_pose_resnet(sd0))
    model = get_pose_net(ModelConfig(num_layers=50, image_size=(64, 64),
                                     heatmap_size=(16, 16),
                                     dtype="float64"))

    def mse64(pred, target, tw):
        nn_, h, w, kk = pred.shape
        p2 = pred.reshape(nn_, h * w, kk) * tw.reshape(nn_, 1, kk)
        t2 = target.reshape(nn_, h * w, kk) * tw.reshape(nn_, 1, kk)
        return jnp.mean(0.5 * jnp.mean(jnp.square(p2 - t2), axis=(0, 1)))

    def loss_fn(params):
        o, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            jnp.asarray(x), train=True, mutable=["batch_stats"])
        return mse64(o, jnp.asarray(target), jnp.asarray(tw))

    loss_j = float(loss_fn(variables["params"]))
    assert abs(loss_j - float(loss_t.detach())) < 1e-9, \
        (loss_j, float(loss_t.detach()))
    grads = jax.jit(jax.grad(loss_fn))(variables["params"])
    fw = {jax.tree_util.keystr(p): np.asarray(v) for p, v in
          jax.tree_util.tree_flatten_with_path(want)[0]}
    fg = {jax.tree_util.keystr(p): np.asarray(v) for p, v in
          jax.tree_util.tree_flatten_with_path(grads)[0]}
    assert set(fw) == set(fg)
    worst = 0.0
    for name in fw:
        err = float(np.abs(fg[name] - fw[name]).max())
        worst = max(worst, err)
        assert err < 1e-6, (name, err)
    print(f"fp64 grad parity OK: worst abs err {worst:.3e} over "
          f"{len(fw)} params")


if __name__ == "__main__":
    main()
