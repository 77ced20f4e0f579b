"""Block-space (space-to-depth) convolution rewrites for narrow-channel stages.

Motivation (measured on TPU v5 lite at the reference 256x256 geometry): the
MXU multiplies 128-wide lane tiles, so a conv with 32 output channels can use
at most a quarter of peak — enc stage 0 and dec stage 0 of the STPN
(SURVEY.md C11) measure 8-16% of bf16 peak while the wide stages reach 55-70%.
Folding each 2x2 spatial block into the channel dim ("space-to-depth") turns a
(H, W, C) map into (H/2, W/2, 4C), quadrupling the effective channel width.

The rewrites here are EXACT (same multiply-add set, reordered):

* stride-1 3x3 conv  -> 3x3 conv in block space over (4*Cin -> 4*Cout). Each
  output offset (a, b) in a block needs input taps from a 4x4 pixel
  neighborhood = a 3x3 block neighborhood; taps that fall outside a given
  (offset, tap) combination get zero weight (75% structured zeros — the MXU
  computes them, but 4x lane utilization more than pays at Cout<=32).
* stride-2 3x3 conv  -> 2x2 conv from block space to NATURAL space (each
  stride-2 output reads pixels 2p-1..2p+1 under the torch-parity (1, 1)
  padding the backbone uses = a 2x2 block window), with explicit (1, 0) low
  padding. This is how a block-space stage hands off to the next (natural)
  encoder stage for free.
* stride-1 3x3 conv, NATURAL input -> BLOCK output ("block-out"): a stride-2
  4x4 conv emitting each 2x2 output block as 4Cout channels. Only 16/9 the
  FLOPs (vs 4x for the 3x3 block kernel) and no input relayout; the cheap
  d2s of the small output restores natural layout. Measured the fastest
  formulation for the Cout=32 decoder stage at 256^2 on v5e (chain of dec0's
  two convs + head_conv: 24.6 -> 19.1 ms at batch 16). A conv consuming a 2x
  nearest-UPSAMPLED input additionally collapses to a stride-1 3x3 conv on
  the half-res input (taps hitting the same source pixel sum their weights),
  so the upsample is never materialized either.

BatchNorm in block space: reshape (..., 4C) -> (..., 4, C) and let the norm
reduce over the extra axis — the four block offsets partition the original
pixel set, so batch statistics over (B, H/2, W/2, 4) per channel are exactly
the reference statistics over (B, H, W); running stats and params keep their
canonical (C,) shapes (checkpoint layout unchanged).

Weight layouts stay canonical (k, k, Cin, Cout) in the param tree; the block
transforms run at apply time (36 static scatters, negligible next to the conv).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W, C) -> (..., H/2, W/2, 4C); tile index t = 2*dy + dx."""
    *lead, H, W, C = x.shape
    x = x.reshape(*lead, H // 2, 2, W // 2, 2, C)
    x = jnp.moveaxis(x, -4, -3)  # (..., H/2, W/2, 2, 2, C)
    return x.reshape(*lead, H // 2, W // 2, 4 * C)


def depth_to_space(x: jnp.ndarray) -> jnp.ndarray:
    """(..., P, Q, 4C) -> (..., 2P, 2Q, C); inverse of :func:`space_to_depth`."""
    *lead, P, Q, C4 = x.shape
    C = C4 // 4
    x = x.reshape(*lead, P, Q, 2, 2, C)
    x = jnp.moveaxis(x, -3, -4)  # (..., P, 2, Q, 2, C)
    return x.reshape(*lead, 2 * P, 2 * Q, C)


def _tap_split(o: int, u: int):
    """Pixel offset o (0/1) + kernel tap u (-1/0/1) -> (block shift s, offset c)."""
    t = o + u
    return (t - (t % 2)) // 2, t % 2


def block_weights_s1(w: jnp.ndarray) -> jnp.ndarray:
    """Stride-1 3x3 kernel (3, 3, Cin, Cout) -> block-space (3, 3, 4Cin, 4Cout).

    wb[s+1, r+1, ci*Cin:, co*Cout:] accumulates w[u+1, v+1] for every output
    offset (a, b) and tap (u, v) with a+u = 2s+ci_y, b+v = 2r+ci_x.
    """
    k, _, cin, cout = w.shape
    assert k == 3, "block rewrite is derived for 3x3 kernels"
    wb = jnp.zeros((3, 3, 4 * cin, 4 * cout), w.dtype)
    for a in range(2):
        for b in range(2):
            t_out = 2 * a + b
            for u in (-1, 0, 1):
                s, cy = _tap_split(a, u)
                for v in (-1, 0, 1):
                    r, cx = _tap_split(b, v)
                    t_in = 2 * cy + cx
                    wb = wb.at[
                        s + 1,
                        r + 1,
                        t_in * cin : (t_in + 1) * cin,
                        t_out * cout : (t_out + 1) * cout,
                    ].set(w[u + 1, v + 1])
    return wb


def block_weights_s2(w: jnp.ndarray) -> jnp.ndarray:
    """Stride-2 3x3 kernel (3, 3, Cin, Cout) -> (2, 2, 4Cin, Cout), block input
    -> NATURAL stride-1 output at half resolution.

    Torch-parity padding (models/backbone.py ConvBNRelu: explicit (1, 1), the
    reference Conv2d(padding=1)): output pixel p reads input pixels 2p+u,
    u in [-1, 1] — blocks p-1 (offset 1) and p (offsets 0, 1), a 2x2 block
    window with (1, 0) LOW padding.
    """
    k, _, cin, cout = w.shape
    assert k == 3, "block rewrite is derived for 3x3 kernels"
    wb = jnp.zeros((2, 2, 4 * cin, cout), w.dtype)
    for u in (-1, 0, 1):
        s_u, cy = _tap_split(0, u)
        for v in (-1, 0, 1):
            s_v, cx = _tap_split(0, v)
            t_in = 2 * cy + cx
            wb = wb.at[
                s_u + 1, s_v + 1, t_in * cin : (t_in + 1) * cin, :
            ].set(w[u + 1, v + 1])
    return wb


def conv_block_s1(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Stride-1 3x3 SAME conv in block space: x (B, P, Q, 4Cin), w canonical
    (3, 3, Cin, Cout) -> (B, P, Q, 4Cout). Exact == s2d(conv(d2s(x), w))."""
    return jax.lax.conv_general_dilated(
        x,
        block_weights_s1(w),
        (1, 1),
        "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def conv_block_s2(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Stride-2 3x3 torch-padding conv from block space to natural half-res: x
    (B, P, Q, 4Cin), w canonical (3, 3, Cin, Cout) -> (B, P, Q, Cout).
    Exact == conv(d2s(x), w, stride 2, padding (1, 1))."""
    return jax.lax.conv_general_dilated(
        x,
        block_weights_s2(w),
        (1, 1),
        ((1, 0), (1, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def block_out_weights(w: jnp.ndarray) -> jnp.ndarray:
    """Stride-1 3x3 kernel (3, 3, Cin, Cout) -> (4, 4, Cin, 4Cout) stride-2
    kernel emitting each 2x2 output block as channels (t = 2a+b, matching
    :func:`space_to_depth` tile order).

    Output block (p, q) offset (a, b) reads natural input rows 2p+a+u for
    taps u in [-1, 1] — the union over offsets is the 4x4 window starting at
    (2p-1, 2q-1), i.e. a stride-2 4x4 conv with ((1, 1), (1, 1)) padding.
    Each offset uses 9 of the 16 taps (structured zeros): 16/9 the natural
    FLOPs for 4x the output-lane utilization — a win for Cout <= 32, and
    unlike the 3x3 block kernel above (4x FLOPs) the input stays natural, so
    there is no space-to-depth materialization on the data path.
    """
    k, _, cin, cout = w.shape
    assert k == 3, "block-out rewrite is derived for 3x3 kernels"
    w4 = jnp.zeros((4, 4, cin, 4 * cout), w.dtype)
    for a in range(2):
        for b in range(2):
            t = 2 * a + b
            for u in (-1, 0, 1):
                for v in (-1, 0, 1):
                    w4 = w4.at[a + u + 1, b + v + 1, :, t * cout : (t + 1) * cout].set(
                        w[u + 1, v + 1]
                    )
    return w4


def up_block_out_weights(w: jnp.ndarray) -> jnp.ndarray:
    """Stride-1 3x3 kernel (3, 3, Cin, Cout) applied to a 2x nearest-upsampled
    input -> (3, 3, Cin, 4Cout) stride-1 SAME kernel on the HALF-RES input,
    emitting 2x2 output blocks as channels.

    Nearest upsampling repeats each source pixel 2x2, so the taps of output
    pixel (2p+a, 2q+b) collapse onto source rows floor((2p+a+u)/2) in
    {p-1, p, p+1}; taps landing on the same source pixel sum their weights
    (exact — they multiply the identical value). The upsampled map is never
    materialized.
    """
    k, _, cin, cout = w.shape
    assert k == 3, "block-out rewrite is derived for 3x3 kernels"
    w3 = jnp.zeros((3, 3, cin, 4 * cout), w.dtype)
    for a in range(2):
        for b in range(2):
            t = 2 * a + b
            for u in (-1, 0, 1):
                s = (a + u) // 2  # python floor handles a+u = -1
                for v in (-1, 0, 1):
                    r = (b + v) // 2
                    w3 = w3.at[s + 1, r + 1, :, t * cout : (t + 1) * cout].add(
                        w[u + 1, v + 1]
                    )
    return w3


def conv_block_out(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Stride-1 3x3 SAME conv, NATURAL input -> block output: x (B, H, W, Cin),
    w canonical f32 (3, 3, Cin, Cout) -> (B, H/2, W/2, 4Cout).
    Exact == s2d(conv(x, w, stride 1, SAME)); weights are transformed in the
    param dtype (f32) before the compute-dtype cast so tap sums don't round."""
    return jax.lax.conv_general_dilated(
        x,
        block_out_weights(w).astype(x.dtype),
        (2, 2),
        ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def conv_up_block_out(x_lo: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Stride-1 3x3 SAME conv over the 2x nearest-upsample of ``x_lo``, block
    output: x_lo (B, P, Q, Cin), w canonical f32 (3, 3, Cin, Cout) ->
    (B, P, Q, 4Cout). Exact == s2d(conv(up2(x_lo), w, stride 1, SAME))."""
    return jax.lax.conv_general_dilated(
        x_lo,
        up_block_out_weights(w).astype(x_lo.dtype),
        (1, 1),
        "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def s2d_np(x: np.ndarray) -> np.ndarray:
    """Numpy twin of :func:`space_to_depth` (oracles/tests)."""
    *lead, H, W, C = x.shape
    x = x.reshape(*lead, H // 2, 2, W // 2, 2, C)
    x = np.moveaxis(x, -4, -3)
    return x.reshape(*lead, H // 2, W // 2, 4 * C)
