"""Mosaic capability probes for the byte-limb (s8) placement path.

Run each probe in a FRESH process (a failed Mosaic compile poisons the
axon server state for the rest of the process — CLAUDE.md):

    python tools/probe_i8_place.py 1   # i32 -> i8 astype after elementwise mul
    python tools/probe_i8_place.py 2   # M-stacked s8 x s8 -> s32 dot_general
    python tools/probe_i8_place.py 3   # full A-build: bytes * one-hot -> i8, dot

Round-3 recorded dead ends this routes around: elementwise i8 mul fails to
legalize, and an i1 mask cannot retile (8,128)->(32,128) for an i8 select.
Here the arithmetic happens in i32 (legal) and only the final convert
produces i8 — if the convert legalizes, the byte-limb kernel is buildable.
"""

from __future__ import annotations

import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    which = int(sys.argv[1]) if len(sys.argv) > 1 else 1

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    I32, I8, F32 = jnp.int32, jnp.int8, jnp.float32
    G, C, W = 64, 2048, 128

    if which == 1:
        def kern(x_ref, oh_ref, out_ref):
            a = (x_ref[...] - 128) * oh_ref[...]  # i32 elementwise (legal)
            out_ref[...] = a.astype(I8)  # the probe: i32 -> i8 convert

        x = jnp.asarray(np.random.default_rng(0).integers(0, 256, (G, C)),
                        I32)
        oh = jnp.asarray(np.random.default_rng(1).integers(0, 2, (G, C)),
                         I32)
        out = pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec((G, C), lambda: (0, 0))] * 2,
            out_specs=pl.BlockSpec((G, C), lambda: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((G, C), I8),
        )(x, oh)
        got = np.asarray(out)
        want = ((np.asarray(x) - 128) * np.asarray(oh)).astype(np.int8)
        assert np.array_equal(got, want), "i32->i8 astype wrong values"
        print("probe 1 OK: i32->i8 astype legalizes and is exact")

    elif which == 2:
        M = 13 * G

        def kern(a_ref, b_ref, out_ref):
            out_ref[...] = jax.lax.dot_general(
                a_ref[...], b_ref[...], (((1,), (1,)), ((), ())),
                preferred_element_type=I32)

        rng = np.random.default_rng(2)
        a = jnp.asarray(rng.integers(-128, 128, (M, C)), I8)
        b = jnp.asarray(rng.integers(0, 2, (W, C)), I8)
        out = pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec((M, C), lambda: (0, 0)),
                      pl.BlockSpec((W, C), lambda: (0, 0))],
            out_specs=pl.BlockSpec((M, W), lambda: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((M, W), I32),
        )(a, b)
        got = np.asarray(out)
        want = np.asarray(a).astype(np.int32) @ np.asarray(b).astype(
            np.int32).T
        assert np.array_equal(got, want), "s8 dot wrong values"
        print("probe 2 OK: (832, 2048) x (128, 2048) s8 dot -> s32 exact")

    elif which == 3:
        from urban_road_filter_tpu.ops.place import group_place_pallas

        rng = np.random.default_rng(3)
        n, g, cap = 8192, 64, 256
        ids = jnp.asarray(rng.integers(0, g, n), I32)
        # unique (id, pos) pairs: running rank per group
        idn = np.asarray(ids)
        pos_np = np.zeros(n, np.int32)
        cnt = np.zeros(g, np.int32)
        for i, gid in enumerate(idn):
            pos_np[i] = cnt[gid]
            cnt[gid] += 1
        pos = jnp.asarray(pos_np)
        vals = [jnp.asarray(rng.normal(size=n) * 40, F32) for _ in range(3)]
        outs = group_place_pallas(ids, pos, vals, g, cap, byte_limbs=True)
        # NumPy ground truth (NOT the interpret path: on the axon backend
        # interpret-mode dots drop the mid/lo limb precision — bf16 results).
        want = []
        for v in vals:
            w = np.zeros((g, cap), np.float32)
            w[idn, pos_np] = np.asarray(v)
            want.append(w)
        bad = 0
        for fi, (o, w) in enumerate(zip(outs, want)):
            o, w = np.asarray(o), np.asarray(w)
            if not np.array_equal(o, w):
                bad += 1
                m = o != w
                r, s = np.nonzero(m)
                print(f"field {fi}: {m.sum()}/{m.size} mismatch")
                for k in range(min(5, len(r))):
                    go, wa = o[r[k], s[k]], w[r[k], s[k]]
                    print(f"  ({r[k]},{s[k]}): got {go} ({np.float32(go).view(np.uint32):08x})"
                          f" want {wa} ({np.float32(wa).view(np.uint32):08x})")
        assert bad == 0, "mismatch"
        print("probe 3 OK: byte-limb placement bit-equal to NumPy scatter")

    elif which == 4:
        # Isolate the in-kernel byte decompose/reconstruct (no MXU dot):
        # f32 -> i32 bitcast -> 4 (byte-128) i8 rows -> +128, shift-or,
        # bitcast back.  If this is exact, the mismatch is in the A-tile
        # one-hot product or the row-block slicing.
        def kern(v_ref, out_ref):
            vi = jax.lax.bitcast_convert_type(v_ref[...], I32)  # (8, C)
            blks = []
            for k in range(4):
                b = jax.lax.shift_right_logical(vi, I32(8 * k)) & I32(0xFF)
                blks.append((b - I32(128)).astype(I8))
            back = [b.astype(I32) + I32(128) for b in blks]
            oi = (back[0] | jax.lax.shift_left(back[1], I32(8))
                  | jax.lax.shift_left(back[2], I32(16))
                  | jax.lax.shift_left(back[3], I32(24)))
            out_ref[...] = jax.lax.bitcast_convert_type(oi, F32)

        rng = np.random.default_rng(4)
        v = jnp.asarray(rng.normal(size=(8, C)) * 40, F32)
        out = pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec((8, C), lambda: (0, 0))],
            out_specs=pl.BlockSpec((8, C), lambda: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((8, C), F32),
        )(v)
        got, want = np.asarray(out), np.asarray(v)
        eq = got.view(np.uint32) == want.view(np.uint32)
        assert eq.all(), f"{(~eq).sum()}/{eq.size} mismatch"
        print("probe 4 OK: in-kernel byte decompose/reconstruct bit-exact")


if __name__ == "__main__":
    main()
