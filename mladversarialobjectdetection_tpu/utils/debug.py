"""Debugging / determinism / profiling switches.

The TPU-native counterpart of the reference's auxiliary debug machinery
(SURVEY.md §5): `tf.config.experimental.enable_op_determinism` + seed
(tf2/train.py:166-168), eager + device-placement debug (169-172,
infer_lib.py:404-406), NaN assertions (brightness_matcher.py:160-161), and
the ServingDriver benchmark/trace harness (infer_lib.py:181-206).
"""
from __future__ import annotations

import contextlib
import os
import time
from typing import Callable, Iterator, Optional

import jax

from .log import get_logger

logger = get_logger(__name__)


def enable_compilation_cache(cache_dir: Optional[str] = None) -> Optional[str]:
    """Persistent XLA compilation cache (ROADMAP #9).

    First compiles of the lite4@640 programs take 20-40+ s per process on
    TPU; the persistent cache makes every later process (re-run driver,
    bench, demo) hit disk instead. Called by the CLI drivers and bench.

    Resolution order: explicit arg > $MAD_COMPILE_CACHE_DIR >
    ~/.cache/mladversarialobjectdetection_tpu/xla. Set MAD_COMPILE_CACHE_DIR=0
    to disable. Returns the directory used (None if disabled/unsupported).
    """
    env = os.environ.get("MAD_COMPILE_CACHE_DIR")
    if env in ("0", "off", "none"):
        return None
    d = cache_dir or env or os.path.join(
        os.path.expanduser("~"), ".cache", "mladversarialobjectdetection_tpu", "xla")
    try:
        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        # cache everything: small entries are cheap and the win is per-process
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except (RuntimeError, OSError, AttributeError) as exc:
        logger.warning(f"compilation cache unavailable: {exc}")
        return None
    return d


def enable_debug(nans: bool = True, disable_jit: bool = False) -> None:
    """Debug mode: NaN checking and optionally op-by-op execution
    (the jax analog of the reference's --debug eager mode)."""
    if nans:
        jax.config.update("jax_debug_nans", True)
    if disable_jit:
        jax.config.update("jax_disable_jit", True)
    logger.info(f"debug mode: nans={nans} disable_jit={disable_jit}")


def set_deterministic(seed: int = 0) -> jax.Array:
    """Determinism: jax PRNG is already explicit/deterministic; this just
    documents the seed discipline and returns the root key."""
    return jax.random.PRNGKey(seed)


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None) -> Iterator[None]:
    """Profiler trace context (jax.profiler + perfetto), the equivalent of
    the reference's tf.profiler trace dump (infer_lib.py:197-205)."""
    if log_dir:
        jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        if log_dir:
            jax.profiler.stop_trace()
            logger.info(f"profiler trace written to {log_dir}")


def benchmark(fn: Callable, *args, iters: int = 10, warmup: int = 3,
              trace_dir: Optional[str] = None) -> float:
    """Latency/FPS benchmark harness (ServingDriver._benchmark parity,
    infer_lib.py:181-206). Returns seconds per call.

    Timing is fenced with a host read of the first output leaf — on some
    remote-execution platforms block_until_ready returns early."""
    import numpy as np

    def fence(out):
        leaf = jax.tree.leaves(out)[0]
        return float(np.asarray(leaf).reshape(-1)[0])

    out = None
    for _ in range(warmup):
        out = fn(*args)
    fence(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fence(out)
    dt = (time.perf_counter() - t0) / iters
    logger.info(f"per call: {dt * 1000:.2f} ms, {1.0 / dt:.1f} calls/sec")
    if trace_dir:
        with trace(trace_dir):
            out = fn(*args)
            fence(out)
    return dt
