"""Device mesh + sharding utilities (the distributed layer).

The reference's distributed machinery is tf.distribute strategies
(TPUStrategy / MirroredStrategy, tf2/train.py:174-200) and
cross_replica_sum sync-BN (automl utils.py:166-241). The TPU-native
equivalent is a single `jax.sharding.Mesh` over the chips with batch-dim
data parallelism: parameters and attack state are replicated, batches are
sharded on the 'data' axis, and XLA inserts psum collectives for gradient
reduction over ICI. Sync-BN maps to BatchNorm(axis_name='data') when
detector training is enabled (frozen BN needs no collective — parity with
is_training_bn=False at infer_lib.py:171).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
DCN_AXIS = "dcn"
SPATIAL_AXIS = "spatial"


def make_mesh(n_devices: Optional[int] = None,
              devices: Optional[Sequence] = None,
              axis_name: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over all (or the first n) local devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def make_hybrid_mesh(dcn_size: Optional[int] = None,
                     devices: Optional[Sequence] = None) -> Mesh:
    """2-D ('dcn', 'data') mesh for multi-host data parallelism.

    The scaling-book recipe: the outer axis spans hosts (slow DCN links),
    the inner axis spans the chips of each host (fast ICI), with devices
    ordered host-major so XLA's hierarchical all-reduce keeps the heavy
    per-host reduction on ICI and only the per-host partials cross DCN.
    For pure data parallelism the batch shards over BOTH axes
    (`batch_sharding` handles multi-axis meshes); parameters/state stay
    replicated, so the only cross-host traffic is the gradient psum.

    On a real multi-host deployment call `jax.distributed.initialize()`
    first; `dcn_size` defaults to `jax.process_count()`. A 1-host/1-process
    environment (including the fake CPU mesh used in tests) can pass
    `dcn_size` explicitly to exercise the hybrid layout virtually.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if dcn_size is None:
        dcn_size = max(1, jax.process_count())
    if n % dcn_size != 0:
        raise ValueError(f"{n} devices not divisible into dcn_size={dcn_size}")
    if jax.process_count() > 1:
        # real multi-host: the DCN axis must match the process layout —
        # create_hybrid_device_mesh needs every per-process granule to hold
        # devices-per-process chips, which an arbitrary dcn_size breaks
        # with an obscure shape error deep inside mesh_utils
        if dcn_size != jax.process_count():
            raise ValueError(
                f"hybrid mesh on {jax.process_count()} processes requires "
                f"dcn_size == process_count, got dcn_size={dcn_size}; pass "
                "dcn_size=None to use the process count")
        from jax.experimental import mesh_utils
        try:
            dev_array = mesh_utils.create_hybrid_device_mesh(
                (1, n // dcn_size), (dcn_size, 1), devices=devices)
        except ValueError:
            # devices without slice/process granule attributes (e.g. CPU
            # multi-process): jax.devices() is process-major, so the plain
            # reshape gives the same hosts-outer / ICI-inner layout
            dev_array = np.asarray(devices).reshape(dcn_size, n // dcn_size)
    else:
        # jax.devices() is process-major already; reshape keeps each host's
        # chips contiguous on the inner axis
        dev_array = np.asarray(devices).reshape(dcn_size, n // dcn_size)
    return Mesh(dev_array, (DCN_AXIS, DATA_AXIS))


def make_mesh_for_batch(batch_size: int, axis_name: str = DATA_AXIS) -> Mesh:
    """Largest data-parallel mesh whose size divides the global batch.

    On a multi-host deployment (jax.process_count() > 1) this returns the
    DCN-aware hybrid ('dcn','data') mesh so every train driver gets the
    hierarchical gradient reduction automatically; there the batch must
    divide the full device count (trimming devices is not possible when
    every process has to participate in the program).
    """
    devices = jax.devices()
    n = len(devices)
    if jax.process_count() > 1:
        if batch_size % n != 0:
            raise ValueError(
                f"multi-host training needs batch_size divisible by the "
                f"{n} global devices, got {batch_size}")
        return make_hybrid_mesh(devices=devices)
    while n > 1 and batch_size % n != 0:
        n -= 1
    return Mesh(np.asarray(devices[:n]), (axis_name,))


def make_train_mesh(batch_size: int, spatial: int = 1,
                    image_h: Optional[int] = None) -> Mesh:
    """Training mesh shared by all three train drivers: plain data-parallel
    by default; with `spatial > 1`, a ('data','spatial') mesh whose
    'spatial' axis row-shards the images (GSPMD halo-exchange convs +
    cross-spatial BN collectives) — the per-chip activation-memory lever
    for the 1024-1536px variants. Validates device/batch/height
    divisibility with driver-friendly errors."""
    if spatial <= 1:
        return make_mesh_for_batch(batch_size)
    n_dev = len(jax.devices())
    if n_dev % spatial != 0:
        raise ValueError(f"--spatial {spatial} must divide the "
                         f"{n_dev} devices")
    n_data = n_dev // spatial
    if batch_size % n_data != 0:
        raise ValueError(f"batch_size {batch_size} must be divisible by "
                         f"the data-axis size {n_data} "
                         f"({n_dev} devices / spatial {spatial})")
    if image_h is not None and image_h % spatial != 0:
        raise ValueError(f"image height {image_h} must be divisible by "
                         f"--spatial {spatial}")
    return make_serve_mesh(n_data, spatial)


def make_serve_mesh(n_data: int, n_spatial: int,
                    devices: Optional[Sequence] = None) -> Mesh:
    """2-D ('data', 'spatial') mesh for model-parallel serving.

    Spatial partitioning is the TPU-native way to serve the large-image
    variants (d5-d7x at 1280-1536 px) below their single-chip latency
    floor: each image's ROWS are sharded over `n_spatial` chips and
    GSPMD turns every conv into per-shard convs + halo exchange of the
    kernel overlap rows over ICI (the MLPerf segmentation/detection
    recipe). The reference has no analog — its per-GPU serving is whole
    images only. Devices are laid out data-major so the `n_spatial`
    chips cooperating on one image are mesh-adjacent (halo traffic rides
    neighbor ICI links); the batch shards over the outer 'data' axis.

    Use with `Detector(mesh=make_serve_mesh(...))`; the model's input
    height must be divisible by n_spatial (Detector validates).
    """
    if devices is None:
        devices = jax.devices()
    need = n_data * n_spatial
    if len(devices) < need:
        raise ValueError(f"serve mesh ({n_data}, {n_spatial}) needs {need} "
                         f"devices, have {len(devices)}")
    dev_array = np.asarray(devices[:need]).reshape(n_data, n_spatial)
    return Mesh(dev_array, (DATA_AXIS, SPATIAL_AXIS))


def data_axis_names(mesh: Mesh) -> tuple:
    """The mesh axes the batch dim shards over: every axis except the
    model-parallel 'spatial' axis (so a ('dcn','data') hybrid shards
    over both, a ('data','spatial') serve mesh over 'data' only)."""
    return tuple(n for n in mesh.axis_names if n != SPATIAL_AXIS)


def image_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for a [B, H, W, C] image batch: batch over the data
    axes, rows over 'spatial' when the mesh has one."""
    names = data_axis_names(mesh)
    batch_spec = names if len(names) > 1 else (names[0] if names else None)
    if SPATIAL_AXIS in mesh.axis_names:
        return NamedSharding(mesh, P(batch_spec, SPATIAL_AXIS, None, None))
    return NamedSharding(mesh, P(batch_spec))


def batch_sharding(mesh: Mesh, axis_name: Optional[str] = None) -> NamedSharding:
    """Shard dim 0 (batch) over the mesh — over ALL data axes of a
    hybrid ('dcn', 'data') mesh, so each device holds batch/n_devices
    images; a serve mesh's model-parallel 'spatial' axis is excluded."""
    if axis_name is not None:
        return NamedSharding(mesh, P(axis_name))
    names = data_axis_names(mesh)
    return NamedSharding(mesh, P(names if len(names) > 1 else names[0]))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis_name: Optional[str] = None):
    """Device_put a host batch with the leading dim sharded over the mesh
    (all data axes by default — see batch_sharding).

    On a ('data', 'spatial') serve/train mesh, image-like leaves
    ([B, H, W, C] with H divisible by the spatial axis) additionally
    shard their rows over 'spatial' — labels, boxes and scalars stay
    data-sharded, so one call shards a whole training batch pytree for
    spatially-partitioned training of the large-image variants."""
    sharding = batch_sharding(mesh, axis_name)
    img = None
    if axis_name is None and SPATIAL_AXIS in mesh.axis_names:
        img = image_sharding(mesh)
        n_sp = mesh.shape[SPATIAL_AXIS]

    def put(x):
        if (img is not None and getattr(x, "ndim", 0) == 4
                and x.shape[1] % n_sp == 0):
            return jax.device_put(x, img)
        return jax.device_put(x, sharding)

    return jax.tree.map(put, batch)


def shard_batch_local(mesh: Mesh, local_batch,
                      axis_name: Optional[str] = None):
    """Multi-host input sharding: each process feeds only ITS slice.

    On a real multi-host deployment the hosts cannot (and must not) each
    materialize the global batch — every process loads
    `global_batch / process_count` examples (process-major order, i.e.
    process p holds global rows [p*local_b, (p+1)*local_b)) and this
    assembles them into globally-sharded `jax.Array`s via
    `jax.make_array_from_process_local_data`, with the same leaf routing
    as `shard_batch` (batch over the data axes; [B,H,W,C] image rows
    additionally over 'spatial' when the mesh has that axis). The global
    leading dim is inferred as local_b * process_count. Single-process
    this is exactly `shard_batch` (tested equal); drivers switch to it
    automatically via `shard_batch_auto`.
    """
    sharding = batch_sharding(mesh, axis_name)
    img = None
    if axis_name is None and SPATIAL_AXIS in mesh.axis_names:
        img = image_sharding(mesh)
        n_sp = mesh.shape[SPATIAL_AXIS]

    def put(x):
        x = np.asarray(x)
        if img is not None and x.ndim == 4 and x.shape[1] % n_sp == 0:
            return jax.make_array_from_process_local_data(img, x)
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree.map(put, local_batch)


def shard_batch_auto(mesh: Mesh, batch, axis_name: Optional[str] = None):
    """`shard_batch` on one process, `shard_batch_local` on many — the
    device_put hook train drivers pass to the prefetcher so the same
    driver code runs single-host (full batch per host) and multi-host
    (per-process slice per host, see `local_batch_size`)."""
    if jax.process_count() > 1:
        return shard_batch_local(mesh, batch, axis_name)
    return shard_batch(mesh, batch, axis_name)


def is_main_process() -> bool:
    """True on the process that should write shared artifacts (ckpts,
    patch dirs) — multi-host drivers gate their saves on this so N hosts
    sharing an output dir don't race on the same files."""
    return jax.process_index() == 0


def local_batch_size(global_batch: int) -> int:
    """Per-process share of a global batch (multi-host input loading)."""
    n = jax.process_count()
    if global_batch % n != 0:
        raise ValueError(f"global batch {global_batch} not divisible by "
                         f"{n} processes")
    return global_batch // n


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params / attack state) across the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
