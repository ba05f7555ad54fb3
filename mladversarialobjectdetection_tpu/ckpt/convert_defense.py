"""Reference defender (attention U-Net) weight conversion.

The reference trains `generator.PatchNeutralizer` (a tf.keras model,
generator.py:17-96) and checkpoints it as `antipatch.h5` inside
`patch_{epoch}_{val_loss}` dirs (attack_detection.py:311-318); the demos
restore it with `load_weights` (demo_v2.py:226). This module maps those
weights onto our Flax `models/unet.PatchNeutralizer` so reference
defender artifacts load directly, the same way reference detector
checkpoints do (ckpt/convert_tf.py).

Layer correspondence (generator.py -> models/unet.py):
  conv{i}/cnv{j}, bn{j}            -> params.conv{i}.cnv{j}/bn{j}
  conv4 (bottleneck)               -> params.conv4.*
  deconv{i}/cnv  (Conv2DTranspose) -> params.deconv{i}.cnv  [see below]
  deconv{i}/attention/{cnv1,bn1,cnv2,bn2,conv3,bn3}
                                   -> params.deconv{i}.attention.*
  deconv{i}/convblock/{cnv1,bn1,cnv2,bn2}
                                   -> params.deconv{i}.convblock.*
  patch_neutralizer/output         -> params.output

Tensor transforms:
  - Conv2D kernels are HWIO in both frameworks: copied as-is.
  - Conv2DTranspose: keras stores (kh, kw, out, in) and computes the
    gradient-of-conv; flax `nn.ConvTranspose` (transpose_kernel=False)
    computes a fractionally-strided conv, so the keras kernel must be
    spatially flipped AND channel-transposed: W[::-1, ::-1].T(2,3).
    (Verified numerically exact vs tf.keras, incl. odd input sizes.)
  - BatchNorm: gamma/beta -> scale/bias (params); moving_mean/
    moving_variance -> mean/var (batch_stats). Our BN uses the keras
    epsilon 1e-3 (models/unet.py BN_EPS) so converted stats reproduce
    the reference forward exactly.

Keras variable names concatenate every nesting level's `.name`, and the
reference gives sublayers parent-prefixed names, so segments double:
`deconv0/deconv0/attention/deconv0/attention/cnv1/kernel:0`. The name
builder below reproduces that scheme (asserted against live models in
tests/test_defense_parity_tf.py).
"""
from __future__ import annotations

from typing import Dict

import numpy as np


def _keras_name(path_segments, var_name: str) -> str:
    """Flax param path -> full keras weight name (without ':0')."""
    segs = list(path_segments)
    if segs[0] == "output":
        return f"patch_neutralizer/output/{var_name}"
    block = segs[0]                      # conv{i} / deconv{i}
    if len(segs) == 1:
        raise KeyError(segs)
    if len(segs) == 2:                   # conv{i}/cnv{j}|bn{j}, deconv{i}/cnv
        return f"{block}/{block}/{segs[1]}/{var_name}"
    # deconv{i}/(attention|convblock)/leaf
    inner = f"{block}/{segs[1]}"
    return f"{block}/{inner}/{inner}/{segs[2]}/{var_name}"


_VAR_MAP = {
    # (flax collection, flax leaf) -> keras var name
    ("params", "kernel"): "kernel",
    ("params", "bias"): "bias",
    ("params", "scale"): "gamma",
    ("batch_stats", "mean"): "moving_mean",
    ("batch_stats", "var"): "moving_variance",
}


def keras_unet_weights(model) -> Dict[str, np.ndarray]:
    """{full_name: ndarray} from a live keras PatchNeutralizer."""
    out = {}
    for w, val in zip(model.weights, model.get_weights()):
        name = w.name
        if name.endswith(":0"):
            name = name[:-2]
        out[name] = np.asarray(val)
    return out


def load_antipatch_h5(path: str) -> Dict[str, np.ndarray]:
    """Read a reference `antipatch.h5` (keras save_weights format) into
    {full_name: ndarray} without needing TF installed."""
    import h5py

    out = {}
    with h5py.File(path, "r") as f:
        root = f["model_weights"] if "model_weights" in f else f
        layer_names = [n.decode() if isinstance(n, bytes) else n
                       for n in root.attrs.get("layer_names", list(root))]
        for lname in layer_names:
            g = root[lname]
            weight_names = [n.decode() if isinstance(n, bytes) else n
                            for n in g.attrs.get("weight_names", [])]
            for wname in weight_names:
                name = wname[:-2] if wname.endswith(":0") else wname
                out[name] = np.asarray(g[wname])
    return out


def convert_unet_weights(weights: Dict[str, np.ndarray], variables):
    """Map reference U-Net weights onto our Flax variable tree.

    Args:
      weights: {keras_full_name: ndarray} (live model or antipatch.h5).
      variables: template {'params': ..., 'batch_stats': ...} from
        `PatchNeutralizer().init(...)` — defines the target structure.

    Returns a new variables dict. Raises KeyError on any missing weight
    and ValueError on any shape mismatch (the load is all-or-nothing —
    partial restores silently wreck parity).
    """
    import jax
    import jax.numpy as jnp

    used = set()

    def build(path, leaf):
        collection = path[0].key
        segs = [p.key for p in path[1:-1]]
        flax_var = path[-1].key
        # the bn bias lives under params like conv biases; disambiguate by
        # sibling: BN modules have a 'scale' leaf, convs have 'kernel'
        if flax_var == "bias" and segs and segs[-1].startswith("bn"):
            keras_var = "beta"
        else:
            keras_var = _VAR_MAP[(collection, flax_var)]
        name = _keras_name(segs, keras_var)
        if name not in weights:
            raise KeyError(f"reference weights missing {name} "
                           f"(for flax {'/'.join(segs)}/{flax_var})")
        val = np.asarray(weights[name])
        if flax_var == "kernel" and segs[-1] == "cnv" and \
                segs[0].startswith("deconv"):
            # Conv2DTranspose: (kh, kw, out, in) -> flipped (kh, kw, in, out)
            val = np.transpose(val[::-1, ::-1], (0, 1, 3, 2))
        if tuple(val.shape) != tuple(leaf.shape):
            raise ValueError(f"shape mismatch for {name}: reference "
                             f"{val.shape} vs ours {leaf.shape}")
        used.add(name)
        return jnp.asarray(val, leaf.dtype)

    converted = jax.tree_util.tree_map_with_path(build, variables)
    unused = set(weights) - used
    if unused:
        raise ValueError(f"unconsumed reference weights: {sorted(unused)[:5]}"
                         f" (+{max(0, len(unused) - 5)} more)")
    return converted


def load_antipatch(path: str, variables):
    """Restore defender weights from either format:

    - a reference `antipatch.h5` (keras save_weights), or
    - our native pytree checkpoint dir/file (ckpt/io.py).

    `variables` is the init template; returns the restored variables.
    """
    if str(path).endswith((".h5", ".hdf5")):
        return convert_unet_weights(load_antipatch_h5(path), variables)
    from . import io as ckpt_io
    restored = ckpt_io.load_pytree(path)
    return {"params": restored["params"],
            "batch_stats": restored.get("batch_stats", {})}
