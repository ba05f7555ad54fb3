"""Smoke tests for the perf-experiment tools: they must EXECUTE.

The packed-backbone prototype's kernel math (pack_dw_kernel) crashed
unconditionally in round 4 (ADVICE.md); these tests run the tools at tiny
shapes on CPU so a broken tool can't sit in the tree unnoticed again.
"""
import subprocess
import sys

import numpy as np
import pytest


def test_proto_packed_backbone_runs():
    r = subprocess.run(
        [sys.executable, "tools/proto_packed_backbone.py",
         "--batch", "1", "--hw", "16", "--c", "8", "--cpu"],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "depthwise k3" in r.stdout and "maxerr" in r.stdout


def test_pack_dw_kernel_math():
    """Packed grouped depthwise == unpacked depthwise, k3 and k5."""
    sys.path.insert(0, "tools")
    import proto_packed_backbone as pb
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    for k in (3, 5):
        c = 6
        x = jnp.asarray(rng.standard_normal((2, 12, 12, c)), jnp.float32)
        kdw = jnp.asarray(rng.standard_normal((k, k, 1, c)), jnp.float32)
        ref = pb.conv(x, kdw, fgc=c)
        kp = pb.pack_dw_kernel(np.asarray(kdw), c)
        assert kp.shape == (3, 3, 4, 4 * c)
        got = pb.depth_to_space_cm(
            pb.conv(pb.space_to_depth_cm(x), kp, fgc=c))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5)
