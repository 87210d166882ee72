"""x-zero curb detection (reference: x_zero_method.cpp:7-71).

Re-derived as a pure stencil over the slot axis of the (rings, slots) layout.
The reference's per-ring sequential loop carries no real data dependence:
the synthetic `newY` ladder (0.01-spaced, x_zero_method.cpp:24-27) is a
constant table, and each window (j, j+cp/2, j+cp) is independent.  One
fused elementwise pass, vectorized over all rings and slots.
"""

from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp

from urban_road_filter_tpu.config import FilterConfig
from urban_road_filter_tpu.constants import LABEL_CURB
from urban_road_filter_tpu.ops.geometry import RingLayout

F32 = jnp.float32


def _new_y_table(p: int) -> np.ndarray:
    """newY[j] = j * 0.01, float64 accumulation rounded to f32 (matches the
    oracle; the C++ accumulates sequentially in f32, <=1 ulp apart)."""
    return (np.arange(p, dtype=np.float64) * 0.01).astype(np.float32)


def x_zero(layout: RingLayout, cfg: FilterConfig, new_y=None) -> RingLayout:
    """``new_y`` (optional): (P,) or (rings, P) newY values per slot.  The
    azimuth-sharded path passes GLOBAL-ring-position ladder values here so
    the f32 differences match the single-device pipeline bit-for-bit
    (VERDICT r3 item 7); default is the local 0-based table."""
    cp = int(cfg.curb_points)
    p = layout.x.shape[-1]
    if p < 2 * cp + 1:
        return layout
    if new_y is None:
        new_y = jnp.asarray(_new_y_table(p))

    def sh(a, k):  # a[j+k] along the slot axis (wrap garbage is masked out)
        return jnp.roll(a, -k, axis=-1)

    x, y, z = layout.x, layout.y, layout.z
    h = cp // 2
    dny1 = sh(new_y, h) - new_y   # newY[p2]-newY[j], constant per slot
    dny2 = sh(new_y, cp) - sh(new_y, h)
    dny3 = sh(new_y, cp) - new_y

    d = jnp.sqrt((sh(x, cp) - x) ** 2 + (sh(y, cp) - y) ** 2)
    x1 = jnp.sqrt(dny1 ** 2 + (sh(z, h) - z) ** 2)
    x2 = jnp.sqrt(dny2 ** 2 + (sh(z, cp) - sh(z, h)) ** 2)
    x3 = jnp.sqrt(dny3 ** 2 + (sh(z, cp) - z) ** 2)

    bracket = (x3 * x3 - x1 * x1 - x2 * x2) / (F32(-2) * x1 * x2)
    # acos(clip(b)) * 180/pi <= angleFilter1  <=>  b >= cos(angleFilter1):
    # acos is monotone decreasing, so the threshold moves to cosine space —
    # one transcendental less per point, and the form Mosaic can lower (no
    # acos primitive on TPU).  cfg.cos_x is host-precomputed in float64
    # (config.py) and may arrive as a dynamic operand (no-retrace hot-swap).
    cos_thresh = jnp.asarray(cfg.cos_x, F32)

    ch = jnp.asarray(cfg.curb_height, F32)
    cond = (
        (d < F32(5.0))
        & (bracket >= cos_thresh)
        & ((jnp.abs(z - sh(z, h)) >= ch) | (jnp.abs(sh(z, cp) - sh(z, h)) >= ch))
        & (jnp.abs(z - sh(z, cp)) >= F32(0.05))
    )

    # j ranges over [cp, n-1-cp] (x_zero_method.cpp:30); the mark lands on
    # p2 = j + cp/2 (cpp:66).
    j_idx = jnp.arange(p)[None, :]
    n = layout.counts[:, None]
    cond = cond & (j_idx >= cp) & (j_idx <= n - 1 - cp)
    mark = jnp.roll(cond, h, axis=-1)  # mark[j + cp//2] = cond[j]

    label = jnp.where(mark, LABEL_CURB, layout.label)
    return layout._replace(label=label)
