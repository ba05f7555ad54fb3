"""Test configuration: force an 8-device CPU mesh before jax initializes.

This is the multi-device testing strategy the reference lacks (SURVEY.md §4):
XLA_FLAGS=--xla_force_host_platform_device_count=8 gives a fake 8-chip mesh
for pjit/sharding tests without hardware.
"""
import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# the axon TPU plugin ignores JAX_PLATFORMS/XLA_FLAGS env selection in this
# environment; the config API is authoritative
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# Persistent XLA compilation cache for the suite: many modules jit
# near-identical tiny-detector programs (session-scoped configs), so the
# disk cache dedupes compiles ACROSS modules within one run — the main
# cost of the fast tier on a 1-CPU box — and makes re-runs near-free.
# Override the location with MLAD_TEST_CACHE_DIR; set it empty to disable.
_cache_dir = os.environ.get(
    "MLAD_TEST_CACHE_DIR",
    os.path.join(os.path.expanduser("~"), ".cache", "mlad_test_xla_cache"))
if _cache_dir:
    os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

import mladversarialobjectdetection_tpu as mad  # noqa: E402
from mladversarialobjectdetection_tpu.models import efficientdet  # noqa: E402


def tiny_config(image_size: int = 64):
    """A small-but-real config for fast CPU tests."""
    cfg = mad.get_efficientdet_config("efficientdet-lite0")
    cfg.image_size = image_size
    cfg.fpn_num_filters = 16
    cfg.fpn_cell_repeats = 1
    cfg.box_class_repeats = 1
    cfg.nms_configs.update({"iou_thresh": 0.5, "score_thresh": 0.5,
                            "pre_nms_topk": 64, "max_output_size": 16})
    cfg.max_boxes_per_image = 4
    return cfg


@pytest.fixture(scope="session")
def tiny_cfg():
    return tiny_config()


@pytest.fixture(scope="session")
def tiny_detector(tiny_cfg):
    """(config, spec, net, variables) for a tiny random-weight detector."""
    spec = efficientdet.spec_from_config(tiny_cfg)
    net = efficientdet.EfficientDetNet(spec)
    x = jnp.zeros((1, *spec.image_size, 3))
    variables = jax.jit(net.init, static_argnames=("training",))(
        {"params": jax.random.PRNGKey(0)}, x, training=False)
    return tiny_cfg, spec, net, variables


@pytest.fixture(scope="session")
def rand_images(tiny_cfg):
    hw = (tiny_cfg.image_size, tiny_cfg.image_size)
    return jax.random.uniform(jax.random.PRNGKey(7), (2, *hw, 3),
                              minval=-1.0, maxval=1.0)
