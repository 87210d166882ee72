"""z-zero curb detection (reference: z_zero_method.cpp:5-76).

Windowed mean-vector / max-|z| stencil over the slot axis: the +-curbPoints
sums become cumulative-sum differences, the windowed maxima a short static
chain of shifted maximums (curb_points <= 30).  Fully vectorized over
(rings, slots); XLA fuses the whole thing into one elementwise pass.
"""

from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp

from urban_road_filter_tpu.config import FilterConfig
from urban_road_filter_tpu.constants import LABEL_CURB
from urban_road_filter_tpu.ops.geometry import RingLayout

F32 = jnp.float32


def z_zero(layout: RingLayout, cfg: FilterConfig) -> RingLayout:
    cp = int(cfg.curb_points)
    p = layout.x.shape[-1]
    if p < 2 * cp + 1:
        return layout

    def sh(a, k):  # a[j+k]; wrap garbage masked by the j-range test below
        return jnp.roll(a, -k, axis=-1)

    x, y, z = layout.x, layout.y, layout.z

    d = jnp.sqrt((sh(x, cp) - sh(x, -cp)) ** 2 + (sh(y, cp) - sh(y, -cp)) ** 2)

    # Windowed sums of (p_k - p_j) as direct shifted adds.  NOT cumsum
    # differences: a running f32 cumsum of coordinates reaches ~1e5 where
    # the ulp is ~4e-3, so the difference of two cumsum values loses ~1000x
    # more precision than direct summation and can flip the angle test for
    # near-collinear neighborhoods.  This form also matches the fused
    # Pallas kernel term-for-term (bit-equality).
    va1 = jnp.zeros_like(x)
    va2 = jnp.zeros_like(x)
    vb1 = jnp.zeros_like(x)
    vb2 = jnp.zeros_like(x)
    absz = jnp.abs(z)
    max1 = absz
    max2 = absz
    for k in range(1, cp + 1):
        va1 += sh(x, -k) - x
        va2 += sh(y, -k) - y
        vb1 += sh(x, k) - x
        vb2 += sh(y, k) - y
        max1 = jnp.maximum(max1, sh(absz, -k))
        max2 = jnp.maximum(max2, sh(absz, k))
    inv = F32(1) / F32(cp)
    va1, va2, vb1, vb2 = va1 * inv, va2 * inv, vb1 * inv, vb2 * inv

    bracket = (va1 * vb1 + va2 * vb2) / (
        jnp.sqrt(va1 * va1 + va2 * va2) * jnp.sqrt(vb1 * vb1 + vb2 * vb2))
    # Cosine-space threshold (see ops/xzero.py): alpha <= angleFilter2
    # <=> bracket >= cos(angleFilter2); NaN brackets fail both forms.
    # cfg.cos_z is host-precomputed (config.py) and may be a dynamic operand.
    cos_thresh = jnp.asarray(cfg.cos_z, F32)

    ch = jnp.asarray(cfg.curb_height, F32)
    cond = (
        (d < F32(5.0))
        & (bracket >= cos_thresh)
        & ((max1 - absz >= ch) | (max2 - absz >= ch))
        & (jnp.abs(max1 - max2) >= F32(0.05))
    )
    j_idx = jnp.arange(p)[None, :]
    n = layout.counts[:, None]
    cond = cond & (j_idx >= cp) & (j_idx <= n - 1 - cp)

    label = jnp.where(cond, LABEL_CURB, layout.label)
    return layout._replace(label=label)
