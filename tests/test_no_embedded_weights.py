"""Weights must ride compiled programs as ARGUMENTS, not constants.

This JAX version lowers closure-captured arrays into embedded StableHLO
dense constants. For the production programs (attack/defense train steps,
Detector serve) that means the full frozen-detector weights get serialized
into every compiled module: oversized remote-compile payloads (the d7x zoo
bench failed with HTTP 413 over the device tunnel), slow compiles, and a
duplicated weight copy per program in HBM. The production calling
convention therefore passes `det_variables` / the Detector's
`_forward_state` at each call.

These tests pin that property by lowering the programs and checking the
module text for large embedded dense constants — and prove the detection
mechanism works by asserting the closure form DOES embed them. They also
pin arg-vs-closure numerical equivalence.
"""
import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mladversarialobjectdetection_tpu.attack.attacker import PatchAttacker
from mladversarialobjectdetection_tpu.defense.defender import (
    PatchAttackDefender)

# a weights tensor of even a few thousand elements lowers to a dense
# hex literal tens of KB long; program-structure constants (iota tables,
# anchor grids) stay well under this
_BIG_CONST = re.compile(r'dense<"0x[0-9A-Fa-f]{40000,}')


def _has_big_const(lowered) -> bool:
    return bool(_BIG_CONST.search(lowered.as_text()))


@pytest.fixture(scope="module")
def attacker(tiny_detector):
    cfg, spec, net, variables = tiny_detector
    return PatchAttacker(cfg, variables, patch_size=32)


def test_train_step_weights_as_args_not_constants(attacker, rand_images):
    st = attacker.init_state(jax.random.PRNGKey(0))
    jitted = jax.jit(attacker.train_step, static_argnames=("with_asr",))
    low_arg = jitted.lower(st, rand_images, with_asr=False,
                           det_variables=attacker.det_variables)
    assert not _has_big_const(low_arg), (
        "det_variables passed as argument still embedded as constants")
    # the closure fallback DOES embed them — proves the detector detects
    low_const = jitted.lower(st, rand_images, with_asr=False)
    assert _has_big_const(low_const), (
        "detection mechanism broken: closure form shows no big constants")


@pytest.mark.slow  # heavy numerics golden: slow tier (compile-shape audits)
def test_train_step_arg_matches_closure(attacker, rand_images):
    st = attacker.init_state(jax.random.PRNGKey(0))
    st_a, m_a = jax.jit(attacker.train_step)(
        st, rand_images, det_variables=attacker.det_variables)
    st_c, m_c = jax.jit(attacker.train_step)(st, rand_images)
    np.testing.assert_array_equal(np.asarray(st_a.patch),
                                  np.asarray(st_c.patch))
    assert float(m_a.loss) == float(m_c.loss)


@pytest.mark.slow  # heavy numerics golden: slow tier (compile-shape audits)
def test_defender_step_weights_as_args(tiny_detector, rand_images):
    cfg, spec, net, variables = tiny_detector
    d = PatchAttackDefender(cfg, variables)
    st = d.init_state(jax.random.PRNGKey(0))
    jitted = jax.jit(d.train_step, static_argnames=("with_adv_scores",))
    low_arg = jitted.lower(st, rand_images, with_adv_scores=False,
                           det_variables=variables)
    assert not _has_big_const(low_arg)
    st_a, m_a = jitted(st, rand_images, det_variables=variables)
    st_c, m_c = jitted(st, rand_images)
    assert float(m_a.loss) == float(m_c.loss)


def test_detector_serve_weights_as_args(tiny_cfg):
    from mladversarialobjectdetection_tpu.inference.detector import Detector
    det = Detector(model_name="efficientdet-lite0",
                   params={k: tiny_cfg.as_dict()[k] for k in
                           ("image_size", "fpn_num_filters",
                            "fpn_cell_repeats", "box_class_repeats",
                            "nms_configs")})
    images = jnp.zeros((1, *det.spec.image_size, 3), jnp.float32)
    scales = jnp.ones((1,), jnp.float32)
    low = det._serve.lower(det._forward_state, images, scales)
    assert not _has_big_const(low)
    # the serve path still works end to end
    frame = np.zeros((48, 64, 3), np.uint8)
    out = det.serve(frame[None])
    assert out.boxes.shape[0] == 1
