"""Config system (yaml presets, dotted overrides) + profiling utils."""

import numpy as np
import jax.numpy as jnp

from flowtrack_tpu.config import PRESETS, apply_overrides, get_config
import pytest


@pytest.mark.smoke
def test_presets_cover_driver_configs():
    for name in ("coco_res50_256x192", "coco_res50_384x288",
                 "coco_res152_256x192", "coco_res152_384x288",
                 "flownet_s", "flowtrack_posetrack"):
        cfg = get_config(name)
        assert cfg.name == name


def test_yaml_roundtrip():
    cfg = get_config("experiments/coco_res50_256x192.yaml")
    assert cfg.model.num_layers == 50
    assert cfg.model.image_size == (256, 192)
    assert cfg.model.heatmap_size == (64, 48)
    assert cfg.train.lr_steps == (90, 120)
    cfg2 = get_config("experiments/flowtrack_posetrack.yaml")
    assert cfg2.model.num_layers == 152
    assert cfg2.flow.variant == "flownet_s"
    assert cfg2.track.box_nms_thre == 0.5


def test_dotted_overrides():
    cfg = get_config("coco_res50_256x192")
    cfg = apply_overrides(cfg, ["test.flip_test=false",
                                "model.num_layers=152",
                                "train.lr=0.01",
                                "model.image_size=384,288"])
    assert cfg.test.flip_test is False
    assert cfg.model.num_layers == 152
    assert np.isclose(cfg.train.lr, 0.01)
    assert cfg.model.image_size == (384, 288)


def test_stage_timer_and_guard():
    from flowtrack_tpu.utils.profiling import StageTimer, deterministic_guard

    t = StageTimer()
    with t.stage("a"):
        _ = jnp.ones((8, 8)).sum()
    with t.stage("a"):
        pass
    s = t.summary()
    assert s["a"]["count"] == 2 and s["a"]["total_s"] > 0
    assert "a" in t.dump()
    assert deterministic_guard()


def test_mpii_preset_and_yaml_agree():
    from flowtrack_tpu.config import MPII_NUM_JOINTS

    cfg = get_config("mpii_res50_256x256")
    assert cfg.model.num_joints == MPII_NUM_JOINTS == 16
    assert cfg.model.image_size == (256, 256)
    assert cfg.data.dataset == "mpii"
    ycfg = get_config("experiments/mpii_res50_256x256.yaml")
    assert ycfg.model.num_joints == 16
    assert ycfg.model.heatmap_size == (64, 64)
    assert ycfg.data.dataset == "mpii"


def test_default_compile_cache_dir(monkeypatch):
    """Uniform FLOWTRACK_COMPILE_CACHE semantics across every entry point
    (ADVICE round-3): env var wins, empty string disables, unset falls back
    to the repo-local .xla_compile_cache in a source checkout."""
    from flowtrack_tpu.utils import profiling

    monkeypatch.setenv("FLOWTRACK_COMPILE_CACHE", "/some/dir")
    assert profiling.default_compile_cache_dir() == "/some/dir"
    monkeypatch.setenv("FLOWTRACK_COMPILE_CACHE", "")
    assert profiling.default_compile_cache_dir() is None
    monkeypatch.delenv("FLOWTRACK_COMPILE_CACHE")
    d = profiling.default_compile_cache_dir()
    # source checkout (this repo has .git + pyproject.toml)
    assert d is not None and d.endswith(".xla_compile_cache")


def test_enable_compilation_cache(tmp_path):
    """The cache helper must actually persist compiled executables (the
    --compile-cache CLI path): after a jit, the dir holds cache entries."""
    import jax

    from flowtrack_tpu.utils.profiling import enable_compilation_cache

    cache = tmp_path / "xla_cache"
    try:
        enable_compilation_cache(str(cache), min_compile_seconds=0.0)
        f = jax.jit(lambda x: (x * 2.0 + 1.0).sum())
        f(jnp.arange(977, dtype=jnp.float32)).block_until_ready()
        entries = list(cache.glob("*cache*"))
        assert entries, f"no cache entries in {cache}"
    finally:
        jax.config.update("jax_compilation_cache_dir", None)
