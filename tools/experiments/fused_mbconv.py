"""Fused MBConv block for frozen (eval-mode) backbones — the TPU bandwidth
diet for the HBM-bound EfficientNet-lite victim.

Reference semantics: one MBConvBlock in eval mode
(reference automl/efficientdet/backbone/efficientnet_model.py:224-417):

    e = act(BN0(x @ We))          # 1x1 expand
    d = act(BN1(dwconv_k(e)))     # kxk depthwise, 'SAME'
    y = BN2(d @ Wp) [+ x]         # 1x1 project, optional residual

With frozen BatchNorm (running stats — the attack/defense/serving regime,
attacker.py trains only the patch) each BN is an affine map that folds into
the adjacent conv.  The expanded tensor `e` is 6x wider than the block
input; in the stock XLA lowering it makes four HBM round trips per block
(expand-write, dw-read, dw-write, project-read) and dominates the
detector's 1.3+ GB/image traffic.  The pallas kernel here keeps `e` and
`d` entirely in VMEM: per (image, row-tile) grid step it loads a haloed
input tile, runs expand-matmul (MXU) -> relu6 -> depthwise as k^2 shifted
FMAs (VPU) -> relu6 -> project-matmul (MXU) -> residual, and writes only
the Co-wide output tile.  HBM traffic drops from ~4 E-wide tensors to the
(C|Co)-wide in/out tiles (~6-12x less for lite4's e6 stages).

Scope: expand_ratio != 1, no squeeze-excite (lite models), stride (1,1).
Strided / SE / e1 blocks keep the stock flax path (they are a small
minority of the traffic).  Training mode always uses the stock path —
gradients w.r.t. the folded weights are NOT defined (the op closes over
them; differentiating w.r.t. them raises a tracer error rather than
silently returning zeros).

STATUS: EXPERIMENTAL, default OFF (config.fused_backbone = "none").
Measured per-block forward on a v5e chip (lite4 stage shapes, bf16,
batch 24, in-jit chain of 10, tools/bench_block2.py, 2026-08):

    stage  shape                XLA     best fused   verdict
    s2     C32  E192  k3 160px  3.65ms  3.22ms(th32) fused -12%
    s3     C56  E336  k5  80px  1.71    1.94         XLA wins
    s4     C112 E672  k3  40px  0.61    0.73         XLA wins
    s5     C160 E960  k5  40px  1.04    1.34         XLA wins
    s6     C272 E1632 k5  20px  0.69    0.82         XLA wins
    s7     C448 E2688 k3  20px  0.75    1.21         XLA wins

The bandwidth argument only bites where the expanded tensor is large
relative to the weights and the row-halo overhead (s2: big spatial,
small E); at the deep stages the weight blocks (C*E + E*Co in VMEM per
grid step) and the k^2 f32 FMA loop dominate and XLA's conv kernels win.
Net over the whole lite4 backbone: ~1.3 ms of a 28 ms forward — not
worth the nonstandard path.  Kept as an optional backend ("pallas" /
"xla") for bigger-image or narrower-model regimes where the s2-like
balance holds, and as the starting point for a manual-DMA variant that
skips the _halo_rows HBM copy.

The custom_vjp backward (dx only — exactly what the patch attack needs)
is also a single pallas kernel: it recomputes e/d tile-locally in VMEM
(flash-attention-style), then runs project^T (MXU), act', depthwise^T
(k^2 shifted FMAs), act', expand^T (MXU).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class FoldedBlock(NamedTuple):
    """BN-folded weights of one MBConv block (f32)."""
    we: jnp.ndarray  # [C, E]
    be: jnp.ndarray  # [E]
    wd: jnp.ndarray  # [k, k, E]
    bd: jnp.ndarray  # [E]
    wp: jnp.ndarray  # [E, Co]
    bp: jnp.ndarray  # [Co]


def _bn_fold(scale, bias, mean, var, eps):
    s = scale * lax.rsqrt(var + eps)
    return s, bias - mean * s


def fold_block_params(params: dict, stats: dict, eps: float) -> FoldedBlock:
    """Fold BN running stats into the three convs of one MBConvBlock.

    `params` / `stats` are the flax subtrees of models/efficientnet.py's
    MBConvBlock: expand_conv/depthwise_conv/project_conv kernels and
    bn{0,1,2}/bn/{scale,bias} + {mean,var}.
    """
    f32 = jnp.float32

    def bn(name):
        p, s = params[name]["bn"], stats[name]["bn"]
        return _bn_fold(p["scale"].astype(f32), p["bias"].astype(f32),
                        s["mean"].astype(f32), s["var"].astype(f32), eps)

    s0, b0 = bn("bn0")
    s1, b1 = bn("bn1")
    s2, b2 = bn("bn2")
    we = params["expand_conv"]["kernel"].astype(f32)[0, 0] * s0[None, :]
    wd = params["depthwise_conv"]["kernel"].astype(f32)[:, :, 0, :] * s1[None, None, :]
    wp = params["project_conv"]["kernel"].astype(f32)[0, 0] * s2[None, :]
    return FoldedBlock(we, b0, wd, b1, wp, b2)


def _act(z, act_type):
    if act_type == "relu6":
        return jnp.clip(z, 0.0, 6.0)
    if act_type == "relu":
        return jnp.maximum(z, 0.0)
    if act_type in ("swish", "silu", "swish_native"):
        return z * jax.nn.sigmoid(z)
    raise ValueError(f"fused_mbconv: unsupported act {act_type}")


def _dact(z, act_type):
    """d act / d z, from the pre-activation z."""
    if act_type == "relu6":
        return ((z > 0.0) & (z < 6.0)).astype(z.dtype)
    if act_type == "relu":
        return (z > 0.0).astype(z.dtype)
    if act_type in ("swish", "silu", "swish_native"):
        s = jax.nn.sigmoid(z)
        return s * (1.0 + z * (1.0 - s))
    raise ValueError(f"fused_mbconv: unsupported act {act_type}")


SUPPORTED_ACTS = ("relu6", "relu", "swish", "silu", "swish_native")


# ---------------------------------------------------------------------------
# XLA reference implementation (also the CPU path)
# ---------------------------------------------------------------------------

def mbconv_eval_xla(x, fb: FoldedBlock, *, act_type: str, residual: bool,
                    compute_dtype=None):
    """Folded eval-mode MBConv with stock XLA ops (parity reference)."""
    cd = compute_dtype or x.dtype
    k = fb.wd.shape[0]
    e = jnp.einsum("bhwc,ce->bhwe", x.astype(cd), fb.we.astype(cd),
                   preferred_element_type=jnp.float32)
    e = _act(e + fb.be, act_type).astype(cd)
    # no preferred_element_type here: its transpose rule rejects the f32
    # cotangent against bf16 operands; TPU convs accumulate f32 internally
    d = lax.conv_general_dilated(
        e, fb.wd.astype(cd)[:, :, None, :],
        window_strides=(1, 1), padding="SAME",
        feature_group_count=e.shape[-1],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    d = _act(d.astype(jnp.float32) + fb.bd, act_type).astype(cd)
    y = jnp.einsum("bhwe,eo->bhwo", d, fb.wp.astype(cd),
                   preferred_element_type=jnp.float32) + fb.bp
    if residual:
        y = y + x.astype(jnp.float32)
    return y.astype(cd)


# ---------------------------------------------------------------------------
# pallas forward kernel
# ---------------------------------------------------------------------------

def _ceil(a, m):
    return -(-a // m) * m


def _vmem(rows, sub, lanes, nbytes):
    """VMEM bytes of a [rows, sub, lanes] buffer after mosaic tiling:
    sublanes pad to 8 (f32) / 16 (bf16), lanes pad to 128."""
    return rows * _ceil(sub, 32 // nbytes) * _ceil(lanes, 128) * nbytes


def _pick_row_tile(H, W, C, E, Co, h, itemsize=2, budget_bytes=10 << 20):
    """Largest divisor of H whose VMEM working set fits the budget.

    The model counts mosaic's tile padding and leaves room for the
    elementwise transients the compiler stacks next to the named buffers
    (the e/z0 chain is counted 3x); the scoped-vmem limit is 16M."""
    w2 = W + 2 * h
    for th in sorted((d for d in range(1, H + 1) if H % d == 0), reverse=True):
        thi = th + 2 * h
        est = (2 * _vmem(thi, w2, C, itemsize)        # double-buffered input
               + 3 * _vmem(thi, w2, E, 4)             # z0/e f32 transients
               + _vmem(thi, w2, E, itemsize)          # e stored
               + _vmem(th, W, E, 4)                   # dw accumulator
               + 2 * _vmem(th, W, Co, 4)              # out f32 + cast
               + (C * E + E * Co) * itemsize)
        if est <= budget_bytes:
            return th
        if th == 1 and est <= (16 << 20):
            # the soft budget leaves transient headroom when a choice
            # exists; a single haloed row that still fits the real 16 MiB
            # mosaic cap is allowed through rather than rejected
            return th
    # even a single haloed row exceeds scoped VMEM: fail with a clear
    # message instead of an opaque mosaic allocation error downstream
    raise ValueError(
        f"fused_mbconv: no row tile fits the 16 MiB scoped-VMEM limit "
        f"for W={W}, C={C}, E={E}, Co={Co}; use impl='xla'")


def _halo_rows(x, th, h):
    """[B,H,W,C] -> [B, H//th, th+2h, W+2h, C] row tiles with halo+pad."""
    B, H, W, C = x.shape
    xp = jnp.pad(x, ((0, 0), (h, h), (h, h), (0, 0)))
    n_r = H // th
    tiles = [lax.slice_in_dim(xp, r * th, r * th + th + 2 * h, axis=1)
             for r in range(n_r)]
    return jnp.stack(tiles, axis=1)


def _fwd_kernel(x_ref, we_ref, be_ref, wd_ref, bd_ref, wp_ref, bp_ref,
                o_ref, *, th, h, H, W, act_type, residual, k):
    thi, w2 = th + 2 * h, W + 2 * h
    cd = x_ref.dtype
    E = we_ref.shape[1]
    r0 = pl.program_id(1) * th

    xb = x_ref[0, 0]  # [thi, w2, C]
    z0 = jnp.dot(xb.reshape(thi * w2, xb.shape[-1]), we_ref[:],
                 preferred_element_type=jnp.float32)
    z0 = (z0 + be_ref[0]).reshape(thi, w2, E)
    # zero e outside the image so the depthwise 'SAME' padding is exact
    # (f32 multiplicative mask: mosaic can't minor-dim-broadcast i1 vectors)
    rows = r0 + lax.broadcasted_iota(jnp.int32, (thi, w2), 0)
    cols = lax.broadcasted_iota(jnp.int32, (thi, w2), 1)
    mask = ((rows >= h) & (rows < H + h) & (cols >= h)
            & (cols < W + h)).astype(jnp.float32)
    e = (_act(z0, act_type) * mask[:, :, None]).astype(cd)

    acc = jnp.broadcast_to(bd_ref[0], (th, W, E)).astype(jnp.float32)
    for i in range(k):
        for j in range(k):
            acc = acc + e[i:i + th, j:j + W, :].astype(jnp.float32) * wd_ref[i, j]
    d = _act(acc, act_type).astype(cd)

    y = jnp.dot(d.reshape(th * W, E), wp_ref[:],
                preferred_element_type=jnp.float32) + bp_ref[0]
    y = y.reshape(th, W, y.shape[-1])
    if residual:
        y = y + xb[h:h + th, h:h + W, :].astype(jnp.float32)
    o_ref[0] = y.astype(o_ref.dtype)


def _mbconv_fwd_pallas(x, fb: FoldedBlock, *, act_type, residual,
                       interpret=False):
    B, H, W, C = x.shape
    E, Co = fb.wp.shape
    k = fb.wd.shape[0]
    h = (k - 1) // 2
    cd = x.dtype
    th = _pick_row_tile(H, W, C, E, Co, h, itemsize=x.dtype.itemsize)
    xh = _halo_rows(x, th, h)  # [B, nR, thi, w2, C]
    n_r = H // th
    thi, w2 = th + 2 * h, W + 2 * h

    kern = functools.partial(_fwd_kernel, th=th, h=h, H=H, W=W,
                             act_type=act_type, residual=residual, k=k)
    full = lambda a: pl.BlockSpec(a.shape, lambda b, r: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)
    we, wp = fb.we.astype(cd), fb.wp.astype(cd)
    be, bd, bp = fb.be[None], fb.bd[None], fb.bp[None]
    return pl.pallas_call(
        kern,
        grid=(B, n_r),
        in_specs=[
            pl.BlockSpec((1, 1, thi, w2, C), lambda b, r: (b, r, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            full(we), full(be), full(fb.wd), full(bd), full(wp), full(bp),
        ],
        out_specs=pl.BlockSpec((1, th, W, Co), lambda b, r: (b, r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Co), cd),
        interpret=interpret,
    )(xh, we, be, fb.wd, bd, wp, bp)


# ---------------------------------------------------------------------------
# pallas backward kernel (dx only; weights are frozen by construction)
# ---------------------------------------------------------------------------

def _bwd_kernel(x_ref, g_ref, we_ref, be_ref, wd_ref, bd_ref, wp_ref,
                o_ref, *, th, h, H, W, act_type, residual, k):
    """dx for one row tile.  Needs x with 2h halo and dy with h halo:
    ge rows [r0, r0+th) <- gd rows +-h <- (gp, z1) rows +-h <- e rows +-2h.
    All intermediates are recomputed tile-locally in VMEM.
    """
    h2 = 2 * h
    thi2, w4 = th + 2 * h2, W + 2 * h2   # x tile
    thi1, w2 = th + 2 * h, W + 2 * h     # dy tile / gd rows
    cd = x_ref.dtype
    C = x_ref.shape[-1]
    E = we_ref.shape[1]
    Co = wp_ref.shape[1]
    r0 = pl.program_id(1) * th

    # recompute e on the double-haloed tile
    xb = x_ref[0, 0]  # [thi2, w4, C]
    z0 = jnp.dot(xb.reshape(thi2 * w4, C), we_ref[:],
                 preferred_element_type=jnp.float32)
    z0 = (z0 + be_ref[0]).reshape(thi2, w4, E)
    rows = (r0 - h2) + h + lax.broadcasted_iota(jnp.int32, (thi2, w4), 0)
    cols = -h2 + h + lax.broadcasted_iota(jnp.int32, (thi2, w4), 1)
    # rows/cols here are padded-image coordinates of the h-padded dw input
    mask0 = ((rows >= h) & (rows < H + h) & (cols >= h)
             & (cols < W + h)).astype(jnp.float32)
    e = (_act(z0, act_type) * mask0[:, :, None]).astype(cd)

    # recompute z1 (dw pre-activation) on the +-h rows around the tile
    z1 = jnp.broadcast_to(bd_ref[0], (thi1, w2, E)).astype(jnp.float32)
    for i in range(k):
        for j in range(k):
            z1 = z1 + e[i:i + thi1, j:j + w2, :].astype(jnp.float32) * wd_ref[i, j]

    # gp = dy . Wp^T on the same +-h rows; dy is zero-padded outside image
    gb = g_ref[0, 0]  # [thi1, w2, Co]
    gp = lax.dot_general(gb.reshape(thi1 * w2, Co), wp_ref[:],
                         dimension_numbers=(((1,), (1,)), ((), ())),
                         preferred_element_type=jnp.float32)
    gd = (gp.reshape(thi1, w2, E) * _dact(z1, act_type)).astype(cd)

    # ge = dw^T(gd) on the tile rows: correlation with the flipped kernel
    ge = jnp.zeros((th, W, E), jnp.float32)
    for i in range(k):
        for j in range(k):
            ge = ge + (gd[(2 * h - i):(2 * h - i) + th,
                          (2 * h - j):(2 * h - j) + W, :].astype(jnp.float32)
                       * wd_ref[i, j])

    # gx = (ge * act'(z0_center)) . We^T  [+ dy_center if residual]
    z0c = z0[h2:h2 + th, h2:h2 + W, :]
    ge = (ge * _dact(z0c, act_type)).astype(cd)
    gx = lax.dot_general(ge.reshape(th * W, E), we_ref[:],
                         dimension_numbers=(((1,), (1,)), ((), ())),
                         preferred_element_type=jnp.float32)
    gx = gx.reshape(th, W, C)
    if residual:
        gx = gx + gb[h:h + th, h:h + W, :].astype(jnp.float32)
    o_ref[0] = gx.astype(o_ref.dtype)


def _pick_row_tile_bwd(H, W, C, E, Co, h, itemsize=2, budget_bytes=10 << 20):
    w4, w2 = W + 4 * h, W + 2 * h
    for th in sorted((d for d in range(1, H + 1) if H % d == 0), reverse=True):
        thi2, thi1 = th + 4 * h, th + 2 * h
        est = (2 * _vmem(thi2, w4, C, itemsize)       # x tile (dbl buffered)
               + 2 * _vmem(thi1, w2, Co, itemsize)    # dy tile (dbl buffered)
               + 3 * _vmem(thi2, w4, E, 4)            # z0/e f32 transients
               + _vmem(thi2, w4, E, itemsize)         # e stored
               + 2 * _vmem(thi1, w2, E, 4)            # z1 + gp f32
               + _vmem(thi1, w2, E, itemsize)         # gd stored
               + _vmem(th, W, E, 4)                   # ge accumulator
               + 2 * _vmem(th, W, C, 4)               # gx f32 + cast
               + (C * E + E * Co) * itemsize)
        if est <= budget_bytes:
            return th
        if th == 1 and est <= (16 << 20):
            return th  # see _pick_row_tile: real cap is 16 MiB
    raise ValueError(
        f"fused_mbconv bwd: no row tile fits the 16 MiB scoped-VMEM "
        f"limit for W={W}, C={C}, E={E}, Co={Co}; use impl='xla'")


def _mbconv_bwd_pallas(x, g, fb: FoldedBlock, *, act_type, residual,
                       interpret=False):
    B, H, W, C = x.shape
    E, Co = fb.wp.shape
    k = fb.wd.shape[0]
    h = (k - 1) // 2
    cd = x.dtype
    th = _pick_row_tile_bwd(H, W, C, E, Co, h, itemsize=x.dtype.itemsize)
    xh = _halo_rows(x, th, 2 * h)           # [B, nR, th+4h, W+4h, C]
    gh = _halo_rows(g.astype(cd), th, h)    # [B, nR, th+2h, W+2h, Co]
    n_r = H // th

    kern = functools.partial(_bwd_kernel, th=th, h=h, H=H, W=W,
                             act_type=act_type, residual=residual, k=k)
    full = lambda a: pl.BlockSpec(a.shape, lambda b, r: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)
    we, wp = fb.we.astype(cd), fb.wp.astype(cd)
    be, bd = fb.be[None], fb.bd[None]
    return pl.pallas_call(
        kern,
        grid=(B, n_r),
        in_specs=[
            pl.BlockSpec((1, 1, th + 4 * h, W + 4 * h, C),
                         lambda b, r: (b, r, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, th + 2 * h, W + 2 * h, Co),
                         lambda b, r: (b, r, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            full(we), full(be), full(fb.wd), full(bd), full(wp),
        ],
        out_specs=pl.BlockSpec((1, th, W, C), lambda b, r: (b, r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), cd),
        interpret=interpret,
    )(xh, gh, we, be, fb.wd, bd, wp)


# ---------------------------------------------------------------------------
# public op
# ---------------------------------------------------------------------------

def mbconv_eval(x, fb: FoldedBlock, *, act_type: str, residual: bool,
                impl: str = "pallas", interpret: bool = False):
    """Frozen eval-mode MBConv.  impl: 'pallas' (TPU) or 'xla'.

    Differentiable w.r.t. `x` ONLY (custom_vjp; the backward is the dx
    pallas kernel).  The folded weights are closed over — attempting to
    differentiate w.r.t. them raises instead of silently mis-training.
    """
    if act_type not in SUPPORTED_ACTS:
        raise ValueError(f"unsupported act {act_type}")
    if impl == "xla":
        return mbconv_eval_xla(x, fb, act_type=act_type, residual=residual,
                               compute_dtype=x.dtype)

    @jax.custom_vjp
    def op(xx):
        return _mbconv_fwd_pallas(xx, fb, act_type=act_type,
                                  residual=residual, interpret=interpret)

    def op_fwd(xx):
        return _mbconv_fwd_pallas(xx, fb, act_type=act_type,
                                  residual=residual, interpret=interpret), xx

    def op_bwd(xx, g):
        return (_mbconv_bwd_pallas(xx, g, fb, act_type=act_type,
                                   residual=residual, interpret=interpret),)

    op.defvjp(op_fwd, op_bwd)
    return op(x)


def fuseable(block_args, use_se: bool, act_type: str) -> bool:
    """Can this MBConvBlock take the fused eval path?"""
    return (block_args.expand_ratio != 1
            and block_args.strides == (1, 1)
            and not (use_se and block_args.se_ratio)
            and act_type in SUPPORTED_ACTS)
