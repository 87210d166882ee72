"""Probe: are Mosaic (Pallas TPU) transcendentals bit-equal to XLA's?

The fused ingest kernel (PERF round-5 roadmap #2 / VERDICT r3 item 6)
wants to compute, inside one Pallas pass, the values the XLA ingest
fusions produce today:

  * star polar bins:  fi = atan2(y, x)               (star.py:120)
  * vertical angles:  asin(|z|/d), acos(|z|/d)       (geometry.py:49-56)

Any ulp difference vs the XLA ops shifts 1-degree bin / ring-interval
edges, turning the bench's parity gate into a classification exercise —
so the kernel is only worth building for the ops that match BITWISE.
Mosaic has no acos (CLAUDE.md); the probe checks the pi/2 - asin
identity against XLA's acos instead.

Run on the real TPU:  python tools/probe_ingest_math.py
A FAILED Mosaic compile poisons the axon server for this process
(CLAUDE.md); each op is probed in its own child process.
"""

from __future__ import annotations

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OPS = ("atan2", "asin", "acos_identity", "sqrt_mod")


def probe(op: str) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows, lanes = 64, 128
    rng = np.random.default_rng(7)
    # Representative ingest ranges: coordinates in [-40, 40], plus the
    # awkward cases (tiny |x|, exact zeros, near-axis).
    x = rng.uniform(-40, 40, (rows, lanes)).astype(np.float32)
    y = rng.uniform(-40, 40, (rows, lanes)).astype(np.float32)
    x[0, :8] = 0.0
    y[0, 4:8] = 0.0
    u = rng.uniform(0.0, 1.0, (rows, lanes)).astype(np.float32)
    u[0, :4] = (0.0, 1.0, 0.5, 0.9999999)

    def kern(a_ref, b_ref, o_ref):
        a, b = a_ref[:], b_ref[:]
        if op == "atan2":
            o_ref[:] = jnp.arctan2(a, b)
        elif op == "asin":
            o_ref[:] = jnp.arcsin(a)
        elif op == "acos_identity":
            o_ref[:] = jnp.float32(np.pi / 2) - jnp.arcsin(a)
        else:  # sqrt + f32 mul + trunc-to-int + mod (the bin arithmetic)
            r = jnp.sqrt(a * a + b * b)
            o_ref[:] = (r * jnp.float32(0.017453293)).astype(jnp.int32).astype(
                jnp.float32)

    run = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((rows, lanes), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )

    if op == "atan2":
        want = jax.jit(lambda a, b: jnp.arctan2(a, b))(y, x)
        got = run(jnp.asarray(y), jnp.asarray(x))
    elif op == "asin":
        want = jax.jit(lambda a, b: jnp.arcsin(a))(u, u)
        got = run(jnp.asarray(u), jnp.asarray(u))
    elif op == "acos_identity":
        want = jax.jit(lambda a, b: jnp.arccos(a))(u, u)
        got = run(jnp.asarray(u), jnp.asarray(u))
    else:
        want = jax.jit(lambda a, b: (jnp.sqrt(a * a + b * b)
                                     * jnp.float32(0.017453293)
                                     ).astype(jnp.int32).astype(jnp.float32)
                       )(y, x)
        got = run(jnp.asarray(y), jnp.asarray(x))

    gw = np.asarray(want)
    gg = np.asarray(got)
    same = (gw == gg) | (np.isnan(gw) & np.isnan(gg))
    ulp = np.abs(gw.view(np.int32).astype(np.int64)
                 - gg.view(np.int32).astype(np.int64))
    print(f"{op}: bit_equal={bool(same.all())} "
          f"n_diff={int((~same).sum())}/{same.size} "
          f"max_ulp={int(ulp[~same].max()) if (~same).any() else 0}")


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] in OPS:
        import numpy as np
        import jax.numpy as jnp

        np.asarray(jnp.zeros(8))  # absorb first-D2H warm-up
        probe(sys.argv[1])
        return
    here = os.path.abspath(__file__)
    for op in OPS:
        r = subprocess.run([sys.executable, here, op], capture_output=True,
                           text=True)
        out = (r.stdout + r.stderr).strip().splitlines()
        tail = [ln for ln in out if ln.startswith(op)] or out[-2:]
        print("\n".join(tail) if tail else f"{op}: NO OUTPUT rc={r.returncode}")


if __name__ == "__main__":
    main()
