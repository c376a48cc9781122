"""int8 PTQ: BN folding is exact; quantized forward stays close; the
closed-loop AP survives quantization."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from flowtrack_tpu.config import Config, ModelConfig, TrainConfig
from flowtrack_tpu.config import TestConfig as EvalConfig
from flowtrack_tpu.models.pose_resnet import get_pose_net
from flowtrack_tpu.models.quantize import (
    PoseResNetQ,
    calibrate,
    fold_pose_resnet,
    make_quant_variables,
)

CFG = ModelConfig(num_layers=18, image_size=(64, 64), heatmap_size=(16, 16),
                  dtype="float32")


@pytest.fixture(scope="module")
def float_model_and_vars():
    model = get_pose_net(CFG)
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (2, 64, 64, 3)).astype(np.float32)
    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    # randomize BN stats so folding is non-trivial; explicit counter
    # (a mutable-default list would keep counting across calls, making
    # a second invocation produce different "deterministic" stats)
    def rand_stats(tree, counter):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = rand_stats(v, counter)
            else:
                counter[0] += 1
                r = np.random.default_rng(counter[0])
                if k == "mean":
                    out[k] = jnp.asarray(
                        r.normal(0, 0.1, v.shape).astype(np.float32))
                else:
                    out[k] = jnp.asarray(
                        r.uniform(0.5, 1.5, v.shape).astype(np.float32))
        return out

    variables = {"params": variables["params"],
                 "batch_stats": rand_stats(variables["batch_stats"], [0])}
    return model, variables, x


def test_bn_folding_exact(float_model_and_vars):
    model, variables, x = float_model_and_vars
    want = np.asarray(model.apply(variables, jnp.asarray(x), train=False))

    qmodel = PoseResNetQ(cfg=CFG)
    folded = fold_pose_resnet(variables)
    qvars = make_quant_variables(qmodel, folded, jnp.asarray(x))
    got = np.asarray(qmodel.apply(
        {"params": qvars["params"], "quant": qvars["quant"]},
        jnp.asarray(x), calibrate=False, quantized=False))
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


@pytest.mark.slow
def test_int8_close_to_float(float_model_and_vars):
    model, variables, x = float_model_and_vars
    want = np.asarray(model.apply(variables, jnp.asarray(x), train=False))

    qmodel = PoseResNetQ(cfg=CFG)
    folded = fold_pose_resnet(variables)
    qvars = make_quant_variables(qmodel, folded, jnp.asarray(x))
    qvars = calibrate(qmodel, qvars, [jnp.asarray(x)])
    # every conv now has a positive activation scale
    scales = [float(v) for v in jax.tree.leaves(qvars["quant"])]
    assert all(s > 0 for s in scales)

    got = np.asarray(qmodel.apply(
        {"params": qvars["params"], "quant": qvars["quant"]},
        jnp.asarray(x), calibrate=False, quantized=True))
    # int8 noise: heatmaps stay correlated and peaks stay put
    corr = np.corrcoef(got.ravel(), want.ravel())[0, 1]
    assert corr > 0.98, corr
    want_pk = want.reshape(2, -1, 17).argmax(1)
    got_pk = got.reshape(2, -1, 17).argmax(1)
    assert (want_pk == got_pk).mean() > 0.8


def test_prequantized_weights_bitwise_match_runtime_quant(
        float_model_and_vars):
    """Lead (a) correctness pin: storing int8 weights at conversion time
    (prequantize_params) must produce EXACTLY the runtime-quantize path's
    outputs — same scales, same rounding, only the when moves."""
    from flowtrack_tpu.models.quantize import prequantize_params

    model, variables, x = float_model_and_vars
    qmodel = PoseResNetQ(cfg=CFG)
    folded = fold_pose_resnet(variables)
    qvars = calibrate(qmodel, make_quant_variables(qmodel, folded,
                                                   jnp.asarray(x)),
                      [jnp.asarray(x)])
    want = np.asarray(qmodel.apply(
        {"params": qvars["params"], "quant": qvars["quant"]},
        jnp.asarray(x), calibrate=False, quantized=True))

    pmodel = PoseResNetQ(cfg=CFG, prequantized=True)
    pparams = prequantize_params(qvars["params"])
    got = np.asarray(pmodel.apply(
        {"params": pparams, "quant": qvars["quant"]},
        jnp.asarray(x), calibrate=False, quantized=True))
    np.testing.assert_array_equal(got, want)
    # and the weights really are int8 in the tree
    assert pparams["conv1"]["wq"].dtype == jnp.int8


@pytest.mark.slow
def test_quantized_ap_holds(tmp_path):
    """Train the tiny closed-loop model, quantize, and require the decoded
    keypoints to stay within a heatmap cell of the fp32 model's."""
    from tests.fixtures import make_coco_fixture
    from dataclasses import replace
    from flowtrack_tpu.data import BatchLoader, COCODataset
    from flowtrack_tpu.engine.train import (create_train_state,
                                            make_jit_train_step)
    from flowtrack_tpu.ops.decode import get_final_preds

    root, _, _ = make_coco_fixture(tmp_path, n_images=4, persons=2)
    cfg = Config(model=CFG,
                 train=TrainConfig(batch_size=8, lr=2e-3, flip_prob=0.0,
                                   rot_factor=0.0, scale_factor=0.0),
                 test=EvalConfig(batch_size=8, use_gt_bbox=True,
                                 flip_test=False))
    cfg = replace(cfg, data=replace(cfg.data, root=root))
    ds = COCODataset(cfg, root, "val2017", is_train=True)
    model = get_pose_net(CFG)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3)))
    step = make_jit_train_step(donate=False)
    loader = BatchLoader(ds, 8, shuffle=True, seed=0)
    for _ in range(40):
        for batch in loader:
            dev = {k: jnp.asarray(batch[k])
                   for k in ("input", "target", "target_weight")}
            state, _ = step(state, dev)

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    eval_batch = next(iter(BatchLoader(
        COCODataset(cfg, root, "val2017", is_train=False), 8)))
    x = jnp.asarray(eval_batch["input"])
    c = jnp.asarray(eval_batch["center"])
    s = jnp.asarray(eval_batch["scale"])

    hm_f = model.apply(variables, x, train=False)
    preds_f, _ = get_final_preds(hm_f, c, s)

    qmodel = PoseResNetQ(cfg=CFG)
    qvars = make_quant_variables(qmodel, fold_pose_resnet(variables), x)
    qvars = calibrate(qmodel, qvars, [x])
    hm_q = qmodel.apply({"params": qvars["params"], "quant": qvars["quant"]},
                        x, calibrate=False, quantized=True)
    preds_q, _ = get_final_preds(jnp.asarray(hm_q), c, s)

    # decoded keypoints within one heatmap cell (4 px) for nearly all joints
    d = np.linalg.norm(np.asarray(preds_f) - np.asarray(preds_q), axis=-1)
    assert (d <= 4.0).mean() > 0.9, (d.mean(), (d <= 4.0).mean())


def test_mixed_mode_close_to_float(float_model_and_vars):
    """Mixed policy (int8 1x1 + stage-1, bf16 elsewhere) stays close."""
    from flowtrack_tpu.models.quantize import quantize_pose_model

    model, variables, x = float_model_and_vars
    want = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    adapter, qvars = quantize_pose_model(
        model, variables, CFG, [jnp.asarray(x)], mixed=True,
        compute_dtype=jnp.bfloat16)
    got = np.asarray(adapter.apply(qvars, jnp.asarray(x)))
    corr = np.corrcoef(got.ravel(), want.ravel())[0, 1]
    assert corr > 0.98, corr
