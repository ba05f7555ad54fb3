"""Multi-device sharding tests on the fake 8-chip CPU mesh — the
distributed coverage the reference never had (SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mladversarialobjectdetection_tpu.attack.attacker import PatchAttacker
from mladversarialobjectdetection_tpu.parallel import (batch_sharding,
                                                       make_mesh, replicate,
                                                       shard_batch)


def test_fake_mesh_has_8_devices():
    assert len(jax.devices()) == 8
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_shard_batch_layout():
    mesh = make_mesh()
    x = np.zeros((16, 8, 8, 3), np.float32)
    sx = shard_batch(mesh, x)
    assert sx.sharding == batch_sharding(mesh)
    assert sx.addressable_shards[0].data.shape == (2, 8, 8, 3)


@pytest.mark.slow
def test_attack_step_on_mesh(tiny_detector, rand_images):
    """Full SPMD attack step: batch sharded over 8 devices, state replicated;
    the result must equal the single-device step (collectives correct)."""
    cfg, spec, net, variables = tiny_detector
    attacker = PatchAttacker(cfg, variables, patch_size=32)
    state = attacker.init_state(jax.random.PRNGKey(0))

    images = jnp.concatenate([rand_images] * 4, axis=0)  # batch 8

    # single device reference
    st_ref, m_ref = jax.jit(attacker.train_step)(state, images)

    mesh = make_mesh()
    attacker_sharded = PatchAttacker(cfg, replicate(mesh, variables),
                                     patch_size=32)
    st = replicate(mesh, state)
    imgs = shard_batch(mesh, images)
    st_out, m_out = jax.jit(attacker_sharded.train_step)(st, imgs)

    assert np.allclose(np.asarray(st_out.patch), np.asarray(st_ref.patch),
                       atol=1e-5)
    assert float(m_out.loss) == pytest.approx(float(m_ref.loss), rel=1e-4)
    # state stays replicated
    assert st_out.patch.sharding.is_fully_replicated


def test_hybrid_mesh_layout():
    """2x4 ('dcn','data') mesh: batch shards over all 8 devices."""
    from mladversarialobjectdetection_tpu.parallel import make_hybrid_mesh
    mesh = make_hybrid_mesh(dcn_size=2)
    assert mesh.devices.shape == (2, 4)
    assert mesh.axis_names == ("dcn", "data")
    x = np.zeros((16, 8, 8, 3), np.float32)
    sx = shard_batch(mesh, x)
    assert sx.addressable_shards[0].data.shape == (2, 8, 8, 3)
    assert len({s.device for s in sx.addressable_shards}) == 8


@pytest.mark.slow
def test_attack_step_on_hybrid_mesh(tiny_detector, rand_images):
    """Multi-host-shaped DP: the hierarchical (dcn, ici) gradient reduction
    must produce the same patch update as a flat 1-D mesh."""
    from mladversarialobjectdetection_tpu.parallel import make_hybrid_mesh
    cfg, spec, net, variables = tiny_detector
    images = jnp.concatenate([rand_images] * 4, axis=0)  # batch 8

    def run(mesh):
        attacker = PatchAttacker(cfg, replicate(mesh, variables),
                                 patch_size=32)
        st = replicate(mesh, attacker.init_state(jax.random.PRNGKey(0)))
        st_out, m = jax.jit(attacker.train_step)(st, shard_batch(mesh, images))
        return np.asarray(st_out.patch), float(m.loss)

    p_flat, l_flat = run(make_mesh())
    p_hyb, l_hyb = run(make_hybrid_mesh(dcn_size=2))
    assert l_hyb == pytest.approx(l_flat, rel=1e-5)
    assert np.allclose(p_hyb, p_flat, atol=1e-6)


_TINY_DET_PARAMS = {"image_size": 64, "fpn_num_filters": 16,
                    "fpn_cell_repeats": 1, "box_class_repeats": 1,
                    "nms_configs": {"score_thresh": 0.0,
                                    "pre_nms_topk": 64,
                                    "max_output_size": 16}}


def test_sharded_serving_matches_single_device():
    """Detector(mesh=...): the SPMD data-parallel serve program must
    reproduce the one-device results, including a batch that does not
    divide the mesh (padding path) and device_preprocess mode."""
    from mladversarialobjectdetection_tpu.inference.detector import Detector

    rng = np.random.default_rng(0)
    frames = [rng.uniform(0, 255, (96, 128, 3)).astype(np.uint8)
              for _ in range(5)]  # 5 does not divide 8 -> exercises padding
    ref = Detector(model_name="efficientdet-lite0", params=_TINY_DET_PARAMS)
    par = Detector(model_name="efficientdet-lite0", params=_TINY_DET_PARAMS,
                   mesh=make_mesh())

    d_ref = ref.serve(frames)
    d_par = par.serve(frames)
    assert d_par.boxes.shape == d_ref.boxes.shape  # padding stripped
    np.testing.assert_allclose(d_par.scores, d_ref.scores, atol=1e-5)
    np.testing.assert_allclose(d_par.boxes, d_ref.boxes, atol=1e-3)
    np.testing.assert_array_equal(d_par.classes, d_ref.classes)

    r_ref = ref.serve(frames, device_preprocess=True)
    r_par = par.serve(frames, device_preprocess=True)
    np.testing.assert_allclose(r_par.scores, r_ref.scores, atol=1e-5)
    np.testing.assert_allclose(r_par.boxes, r_ref.boxes, atol=1e-3)


def test_sharded_serve_pipelined_matches():
    from mladversarialobjectdetection_tpu.inference.detector import Detector

    rng = np.random.default_rng(1)
    frames = [rng.uniform(0, 255, (64, 64, 3)).astype(np.uint8)
              for _ in range(5)]
    ref = Detector(model_name="efficientdet-lite0", params=_TINY_DET_PARAMS)
    par = Detector(model_name="efficientdet-lite0", params=_TINY_DET_PARAMS,
                   mesh=make_mesh())
    out_ref = list(ref.serve_pipelined(iter(frames), batch_size=2))
    out_par = list(par.serve_pipelined(iter(frames), batch_size=2))
    assert len(out_par) == len(out_ref) == 5
    for a, b in zip(out_par, out_ref):
        np.testing.assert_allclose(a.scores, b.scores, atol=1e-5)


def test_make_mesh_for_batch_multihost_is_hybrid(monkeypatch):
    """On multi-host (process_count > 1) the drivers' mesh factory must
    return the DCN-aware hybrid layout (or reject a non-divisible batch)."""
    from mladversarialobjectdetection_tpu.parallel import (mesh as mesh_lib,
                                                           make_mesh_for_batch)
    monkeypatch.setattr(mesh_lib.jax, "process_count", lambda: 2)
    m = make_mesh_for_batch(16)
    assert m.axis_names == ("dcn", "data")
    assert m.devices.shape == (2, 4)
    with pytest.raises(ValueError, match="divisible"):
        make_mesh_for_batch(12)
