"""Pallas TPU kernels for the hot stencil ops.

`fused_xz_zero` runs BOTH curb-detection stencils (x-zero, x_zero_method.cpp
and z-zero, z_zero_method.cpp) in a single VMEM-resident pass per ring row:
the XLA versions stream ~2*curb_points shifted copies of each field through
HBM; here each (ring, P) row is loaded once, all shifted windows are
computed in VMEM with pltpu.roll, and one label row is written back —
cutting HBM traffic from O(curb_points) passes to exactly one read + one
write.

Math and branch semantics are identical to ops/xzero.py / ops/zzero.py
(tests assert bit-equality of the produced marks); see those modules for
the reference file:line citations.
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from urban_road_filter_tpu.config import FilterConfig
from urban_road_filter_tpu.constants import LABEL_CURB
from urban_road_filter_tpu.ops.geometry import RingLayout
from urban_road_filter_tpu.ops.xzero import _new_y_table

F32 = jnp.float32


def _kernel(params_ref, x_ref, y_ref, z_ref, n_ref, lbl_ref, ny_ref,
            out_ref, *, cp: int, do_x: bool, do_z: bool):
    p = x_ref.shape[-1]
    x = x_ref[...]
    y = y_ref[...]
    z = z_ref[...]
    new_y = ny_ref[...]
    n = n_ref[...]  # (RB, 1) per-ring point counts
    # Thresholds ride SMEM (config hot-swap without re-trace):
    # [cos(angleFilter1), cos(angleFilter2), curbHeight].
    cos1 = params_ref[0, 0]
    cos2 = params_ref[0, 1]
    ch = params_ref[0, 2]
    h = cp // 2

    def sh(a, k):  # a[j+k] along each row (wrap garbage masked by j-range)
        return pltpu.roll(a, (-k) % p, axis=len(a.shape) - 1)

    j_idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, len(x.shape) - 1)
    j_ok = (j_idx >= cp) & (j_idx <= n - 1 - cp)

    label = lbl_ref[...]

    if do_x:
        d = jnp.sqrt((sh(x, cp) - x) ** 2 + (sh(y, cp) - y) ** 2)
        x1 = jnp.sqrt((sh(new_y, h) - new_y) ** 2 + (sh(z, h) - z) ** 2)
        x2 = jnp.sqrt((sh(new_y, cp) - sh(new_y, h)) ** 2
                      + (sh(z, cp) - sh(z, h)) ** 2)
        x3 = jnp.sqrt((sh(new_y, cp) - new_y) ** 2 + (sh(z, cp) - z) ** 2)
        bracket = (x3 * x3 - x1 * x1 - x2 * x2) / (F32(-2) * x1 * x2)
        # Cosine-space threshold (no acos in Mosaic; see ops/xzero.py).
        cond = ((d < F32(5.0)) & (bracket >= cos1)
                & ((jnp.abs(z - sh(z, h)) >= ch)
                   | (jnp.abs(sh(z, cp) - sh(z, h)) >= ch))
                & (jnp.abs(z - sh(z, cp)) >= F32(0.05))
                & j_ok)
        mark_x = pltpu.roll(cond.astype(jnp.int32), h % p,
                            axis=len(x.shape) - 1) > 0
        label = jnp.where(mark_x, LABEL_CURB, label)

    if do_z:
        d = jnp.sqrt((sh(x, cp) - sh(x, -cp)) ** 2
                     + (sh(y, cp) - sh(y, -cp)) ** 2)
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
            jnp.sqrt(va1 * va1 + va2 * va2)
            * jnp.sqrt(vb1 * vb1 + vb2 * vb2))
        cond = ((d < F32(5.0)) & (bracket >= cos2)
                & ((max1 - absz >= ch) | (max2 - absz >= ch))
                & (jnp.abs(max1 - max2) >= F32(0.05))
                & j_ok)
        label = jnp.where(cond, LABEL_CURB, label)

    out_ref[...] = label


def fused_xz_zero(layout: RingLayout, cfg: FilterConfig,
                  interpret: bool = False) -> RingLayout:
    """x-zero + z-zero in one Pallas pass.  Grid over rings; each program
    owns one full (1, P) row in VMEM."""
    cp = int(cfg.curb_points)
    r, p = layout.x.shape
    if p < 2 * cp + 1 or not (cfg.x_zero_method or cfg.z_zero_method):
        return layout
    rb = 8 if r % 8 == 0 else r  # rings per block (sublane multiple of 8)
    new_y = jnp.broadcast_to(jnp.asarray(_new_y_table(p)), (rb, p))

    kernel = functools.partial(
        _kernel, cp=cp, do_x=bool(cfg.x_zero_method),
        do_z=bool(cfg.z_zero_method))

    # cfg.cos_x / cos_z are host-precomputed in float64 (config.py) and may
    # be dynamic operands; stage them + curb_height through SMEM.
    params = jnp.stack([jnp.asarray(cfg.cos_x, F32),
                        jnp.asarray(cfg.cos_z, F32),
                        jnp.asarray(cfg.curb_height, F32)]).reshape(1, 3)

    row = lambda i: (i, 0)
    new_label = pl.pallas_call(
        kernel,
        grid=(r // rb,),
        in_specs=[
            pl.BlockSpec((1, 3), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),  # thresholds
            pl.BlockSpec((rb, p), row, memory_space=pltpu.VMEM),  # x
            pl.BlockSpec((rb, p), row, memory_space=pltpu.VMEM),  # y
            pl.BlockSpec((rb, p), row, memory_space=pltpu.VMEM),  # z
            pl.BlockSpec((rb, 1), row, memory_space=pltpu.VMEM),  # counts
            pl.BlockSpec((rb, p), row, memory_space=pltpu.VMEM),  # label
            pl.BlockSpec((rb, p), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rb, p), row, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, p), jnp.int32),
        interpret=interpret,
    )(params, layout.x, layout.y, layout.z, layout.counts[:, None],
      layout.label, new_y)

    return layout._replace(label=new_label)
