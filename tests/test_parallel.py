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


@pytest.mark.slow  # heavy numerics golden: slow tier (dryrun_multichip covers the driver path)
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


def test_serve_mesh_layout():
    """('data','spatial') serve mesh: batch shards over 'data' only,
    image rows over 'spatial'; data-major device layout keeps the chips
    cooperating on one image mesh-adjacent."""
    from mladversarialobjectdetection_tpu.parallel import (data_axis_names,
                                                           image_sharding,
                                                           make_serve_mesh)
    mesh = make_serve_mesh(2, 4)
    assert mesh.devices.shape == (2, 4)
    assert mesh.axis_names == ("data", "spatial")
    assert data_axis_names(mesh) == ("data",)
    x = jax.device_put(np.zeros((4, 64, 32, 3), np.float32),
                       image_sharding(mesh))
    # each device holds batch/2 x rows/4
    assert x.addressable_shards[0].data.shape == (2, 16, 32, 3)
    assert len({s.device for s in x.addressable_shards}) == 8
    # scales stay data-sharded only
    s = jax.device_put(np.zeros((4,), np.float32), batch_sharding(mesh))
    assert s.addressable_shards[0].data.shape == (2,)
    with pytest.raises(ValueError, match="devices"):
        make_serve_mesh(4, 4)


@pytest.mark.slow  # heavy numerics golden: slow tier (dryrun_multichip covers the driver path)
def test_spatial_sharded_serving_matches_single_device():
    """Detector(mesh=make_serve_mesh(2, 4)): model-parallel serving —
    image rows sharded over 'spatial', GSPMD halo-exchange convs — must
    reproduce the one-device results (both host- and device-preprocess
    paths, with a batch exercising the data-axis padding)."""
    from mladversarialobjectdetection_tpu.inference.detector import Detector
    from mladversarialobjectdetection_tpu.parallel import make_serve_mesh

    rng = np.random.default_rng(2)
    frames = [rng.uniform(0, 255, (96, 128, 3)).astype(np.uint8)
              for _ in range(3)]  # 3 does not divide n_data=2 -> padding
    ref = Detector(model_name="efficientdet-lite0", params=_TINY_DET_PARAMS)
    par = Detector(model_name="efficientdet-lite0", params=_TINY_DET_PARAMS,
                   mesh=make_serve_mesh(2, 4))

    d_ref = ref.serve(frames)
    d_par = par.serve(frames)
    assert d_par.boxes.shape == d_ref.boxes.shape
    np.testing.assert_allclose(d_par.scores, d_ref.scores, atol=1e-5)
    np.testing.assert_allclose(d_par.boxes, d_ref.boxes, atol=1e-3)
    np.testing.assert_array_equal(d_par.classes, d_ref.classes)

    r_ref = ref.serve(frames, device_preprocess=True)
    r_par = par.serve(frames, device_preprocess=True)
    np.testing.assert_allclose(r_par.scores, r_ref.scores, atol=1e-5)
    np.testing.assert_allclose(r_par.boxes, r_ref.boxes, atol=1e-3)


@pytest.mark.slow  # heavy numerics golden: slow tier (dryrun_multichip covers the driver path)
def test_spatial_mesh_rejects_indivisible_height():
    from mladversarialobjectdetection_tpu.inference.detector import Detector
    from mladversarialobjectdetection_tpu.parallel import make_serve_mesh
    with pytest.raises(ValueError, match="divisible"):
        Detector(model_name="efficientdet-lite0",
                 params={"image_size": 100}, mesh=make_serve_mesh(1, 8))


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


@pytest.mark.slow
def test_supervised_step_on_spatial_mesh(tiny_detector):
    """Spatially-partitioned TRAINING: images row-sharded over the
    'spatial' axis of a ('data','spatial') mesh, labels data-sharded
    (one shard_batch call does both). GSPMD must reproduce the
    single-device step — convs via halo exchange, BN batch stats and
    gradient reductions via auto-inserted cross-spatial collectives.
    This is the memory-bound large-variant (d4-d7x) training recipe:
    per-chip activation footprint shrinks by the spatial factor."""
    from mladversarialobjectdetection_tpu.parallel import make_serve_mesh
    from mladversarialobjectdetection_tpu.train.trainer import DetectorTrainer
    cfg, spec, net, variables = tiny_detector
    trainer = DetectorTrainer(cfg, steps_per_epoch=10)
    state = trainer.init_state(jax.random.PRNGKey(0))

    rng = np.random.default_rng(5)
    b = 4
    hw = cfg.image_size
    images = jnp.asarray(rng.uniform(-1, 1, (b, hw, hw, 3)), jnp.float32)
    y0 = rng.uniform(0, hw * 0.5, (b, 3))
    x0 = rng.uniform(0, hw * 0.5, (b, 3))
    h = rng.uniform(8, hw * 0.4, (b, 3))
    w = rng.uniform(8, hw * 0.4, (b, 3))
    gt_boxes = jnp.asarray(np.stack([y0, x0, y0 + h, x0 + w], -1),
                           jnp.float32)
    gt_classes = jnp.asarray(rng.integers(0, cfg.num_classes, (b, 3)),
                             jnp.int32)
    gt_valid = jnp.asarray(rng.uniform(0, 1, (b, 3)) < 0.8)

    st_ref, m_ref = jax.jit(trainer.train_step)(state, images, gt_boxes,
                                                gt_classes, gt_valid)

    mesh = make_serve_mesh(2, 4)
    st = replicate(mesh, state)
    imgs = shard_batch(mesh, images)
    # images really are row-sharded, labels batch-sharded
    assert imgs.addressable_shards[0].data.shape == (2, hw // 4, hw, 3)
    st_out, m_out = jax.jit(trainer.train_step)(
        st, imgs, shard_batch(mesh, gt_boxes),
        shard_batch(mesh, gt_classes), shard_batch(mesh, gt_valid))

    # forward quantities are essentially exact (measured: loss rel 4e-6,
    # BN stats 1e-6) — halo-exchange convs + cross-spatial BN collectives
    # are semantically correct. Post-optimizer params carry more float
    # wobble than the data-parallel case (3e-4 there): the conv-KERNEL
    # gradient is a sum over all spatial positions, and per-row-shard
    # partial sums + psum reorder that reduction; clip-by-global-norm
    # then multiplies every update by the perturbed 1/||g||. Measured
    # max 1.6e-3 on depthwise kernels — noise, not semantics.
    for a, b_ in zip(jax.tree.leaves(st_out.params),
                     jax.tree.leaves(st_ref.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-3)
    # BN batch stats must be the GLOBAL spatial mean, not per-shard
    for a, b_ in zip(jax.tree.leaves(st_out.batch_stats),
                     jax.tree.leaves(st_ref.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5)
    assert float(m_out["loss"]) == pytest.approx(float(m_ref["loss"]),
                                                 rel=1e-4)


@pytest.mark.slow
def test_attack_step_on_spatial_mesh(tiny_detector, rand_images):
    """The attack train step under spatial partitioning: the EOT
    compositor's window updates span row shards, so this pins GSPMD
    correctness for dynamic_update_slice/gather under the row sharding."""
    from mladversarialobjectdetection_tpu.parallel import make_serve_mesh
    cfg, spec, net, variables = tiny_detector
    attacker = PatchAttacker(cfg, variables, patch_size=32)
    state = attacker.init_state(jax.random.PRNGKey(0))
    images = jnp.concatenate([rand_images] * 2, axis=0)  # batch 4

    st_ref, m_ref = jax.jit(attacker.train_step)(state, images)

    mesh = make_serve_mesh(2, 4)
    attacker_sp = PatchAttacker(cfg, replicate(mesh, variables),
                                patch_size=32)
    st = replicate(mesh, state)
    imgs = shard_batch(mesh, images)
    assert imgs.addressable_shards[0].data.shape[1] == cfg.image_size // 4
    st_out, m_out = jax.jit(attacker_sp.train_step)(st, imgs)

    assert np.allclose(np.asarray(st_out.patch), np.asarray(st_ref.patch),
                       atol=1e-5)
    assert float(m_out.loss) == pytest.approx(float(m_ref.loss), rel=1e-4)


@pytest.mark.slow
def test_defender_step_on_mesh(tiny_detector, rand_images):
    """SPMD defender step == single-device step (the defense trainer's
    mesh path, defense/train.py; mirrors test_attack_step_on_mesh).

    Two determinism hazards are pinned down, not papered over:
    (1) the optimizer is swapped to SGD for the comparison — adam's
    bias-corrected first step is lr*g/(sqrt(g^2)+eps) ~= lr*sign(g), so
    a 1e-6 reduction-noise sign flip on a near-zero gradient component
    flips the update by 2*lr (observed: 0.019 divergence that is NOT a
    collective bug; masker crops and dropout masks were verified
    bit-identical under sharding); (2) the live detector pass is
    stubbed with fixed person boxes — a random-init victim's NMS ranks
    near-tied ~0.5 scores, so conv-numerics noise can discretely flip
    the selection and move the masker crops. Detector SPMD parity has
    its own coverage (test_sharded_serving_matches_single_device); this
    test isolates what is unique to the defender step — masker + UNet +
    BN stats + optimizer under batch sharding."""
    import optax
    from mladversarialobjectdetection_tpu.defense.defender import (
        PatchAttackDefender)
    cfg, spec, net, variables = tiny_detector
    hw = cfg.image_size
    rng = np.random.default_rng(7)
    yx0 = rng.uniform(2, hw * 0.45, (8, 4, 2))
    fixed_boxes = jnp.asarray(
        np.concatenate([yx0, yx0 + rng.uniform(10, hw * 0.5, (8, 4, 2))], -1),
        jnp.float32)  # yxyx, non-degenerate
    fixed_scores = jnp.full((8, 4), 0.9, jnp.float32)
    fixed_valid = jnp.ones((8, 4), bool)

    def fixed_odet(images, score_thresh=None, det_variables=None):
        return fixed_boxes, fixed_scores, fixed_valid

    defender = PatchAttackDefender(cfg, variables)
    defender.odet_boxes = fixed_odet
    defender.tx = optax.sgd(0.01)
    state = defender.init_state(jax.random.PRNGKey(0))
    images = jnp.concatenate([rand_images] * 4, axis=0)  # batch 8

    st_ref, m_ref = jax.jit(defender.train_step)(state, images)

    mesh = make_mesh()
    sharded = PatchAttackDefender(cfg, replicate(mesh, variables))
    sharded.odet_boxes = fixed_odet
    sharded.tx = optax.sgd(0.01)
    st = replicate(mesh, state)
    st_out, m_out = jax.jit(sharded.train_step)(st, shard_batch(mesh, images))

    # with SGD the update is lr*grad: only float reduction-order noise
    # remains between the sharded psum and the single-device sum
    ref_leaves = jax.tree.leaves(st_ref.params)
    out_leaves = jax.tree.leaves(st_out.params)
    for a, b in zip(out_leaves, ref_leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    assert float(m_out.loss) == pytest.approx(float(m_ref.loss), rel=1e-4)
    assert jax.tree.leaves(st_out.params)[0].sharding.is_fully_replicated


@pytest.mark.slow
def test_defender_step_on_spatial_mesh(tiny_detector, rand_images):
    """Defender train step under spatial partitioning == single device —
    completes the spatial-training story across all three trainers
    (supervised + attack pinned above): the U-Net's encoder/decoder convs
    and its BN batch stats run over row-sharded 640-style images with
    GSPMD halo exchange + cross-spatial stat reductions, and the Masker's
    window composites span row shards. Same two determinism hazards as
    test_defender_step_on_mesh (SGD for gradient-linear comparison,
    stubbed detector boxes)."""
    import optax
    from mladversarialobjectdetection_tpu.defense.defender import (
        PatchAttackDefender)
    from mladversarialobjectdetection_tpu.parallel import make_serve_mesh
    cfg, spec, net, variables = tiny_detector
    hw = cfg.image_size
    rng = np.random.default_rng(7)
    yx0 = rng.uniform(2, hw * 0.45, (8, 4, 2))
    fixed_boxes = jnp.asarray(
        np.concatenate([yx0, yx0 + rng.uniform(10, hw * 0.5, (8, 4, 2))], -1),
        jnp.float32)
    fixed_scores = jnp.full((8, 4), 0.9, jnp.float32)
    fixed_valid = jnp.ones((8, 4), bool)

    def fixed_odet(images, score_thresh=None, det_variables=None):
        return fixed_boxes, fixed_scores, fixed_valid

    defender = PatchAttackDefender(cfg, variables)
    defender.odet_boxes = fixed_odet
    defender.tx = optax.sgd(0.01)
    state = defender.init_state(jax.random.PRNGKey(0))
    images = jnp.concatenate([rand_images] * 4, axis=0)  # batch 8

    st_ref, m_ref = jax.jit(defender.train_step)(state, images)

    mesh = make_serve_mesh(2, 4)
    sharded = PatchAttackDefender(cfg, replicate(mesh, variables))
    sharded.odet_boxes = fixed_odet
    sharded.tx = optax.sgd(0.01)
    st = replicate(mesh, state)
    imgs = shard_batch(mesh, images)
    assert imgs.addressable_shards[0].data.shape[1] == hw // 4
    st_out, m_out = jax.jit(sharded.train_step)(st, imgs)

    for a, b in zip(jax.tree.leaves(st_out.params),
                    jax.tree.leaves(st_ref.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    # BN batch stats must be the GLOBAL values, not per-row-shard
    for a, b in zip(jax.tree.leaves(st_out.batch_stats),
                    jax.tree.leaves(st_ref.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    assert float(m_out.loss) == pytest.approx(float(m_ref.loss), rel=1e-4)


@pytest.mark.slow
def test_supervised_step_on_mesh(tiny_detector):
    """SPMD supervised detector step == single-device step (train/train.py
    mesh strategy), including the anchor labeler + detection loss."""
    from mladversarialobjectdetection_tpu.train.trainer import DetectorTrainer
    cfg, spec, net, variables = tiny_detector
    trainer = DetectorTrainer(cfg, steps_per_epoch=10)
    state = trainer.init_state(jax.random.PRNGKey(0))

    rng = np.random.default_rng(3)
    b = 8
    hw = cfg.image_size
    images = jnp.asarray(rng.uniform(-1, 1, (b, hw, hw, 3)), jnp.float32)
    y0 = rng.uniform(0, hw * 0.5, (b, 3))
    x0 = rng.uniform(0, hw * 0.5, (b, 3))
    h = rng.uniform(8, hw * 0.4, (b, 3))
    w = rng.uniform(8, hw * 0.4, (b, 3))
    gt_boxes = jnp.asarray(np.stack([y0, x0, y0 + h, x0 + w], -1),
                           jnp.float32)
    gt_classes = jnp.asarray(rng.integers(0, cfg.num_classes, (b, 3)),
                             jnp.int32)
    gt_valid = jnp.asarray(rng.uniform(0, 1, (b, 3)) < 0.8)

    st_ref, m_ref = jax.jit(trainer.train_step)(state, images, gt_boxes,
                                                gt_classes, gt_valid)

    mesh = make_mesh()
    st = replicate(mesh, state)
    st_out, m_out = jax.jit(trainer.train_step)(
        st, shard_batch(mesh, images), shard_batch(mesh, gt_boxes),
        shard_batch(mesh, gt_classes), shard_batch(mesh, gt_valid))

    # sgd+momentum updates are proportional to the gradient, so only the
    # psum-vs-single-device float reduction-order wobble remains (the
    # clip-by-global-norm factor is continuous in it too)
    for a, b_ in zip(jax.tree.leaves(st_out.params),
                     jax.tree.leaves(st_ref.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=3e-4)
    assert float(m_out["loss"]) == pytest.approx(float(m_ref["loss"]),
                                                 rel=1e-4)
