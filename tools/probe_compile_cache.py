"""Probe the JAX persistent compilation cache on the axon backend
(VERDICT r4 item 7: cold-start is minutes per process vs the reference
node's milliseconds, /root/reference/src/main.cpp:37-56 — can
`jax_compilation_cache_dir` amortize it across processes?).

Runs the SAME small-but-representative pipeline graph in two consecutive
CHILD processes with a shared cache dir and times init -> first fetched
result in each.  A working cache makes the second process skip the
server-side compile; a bypassed cache (plausible on a tunneled backend
where compilation happens server-side and the executable may not be
serializable client-side) shows no improvement — either result is
recorded in PERF.md.

Usage: python tools/probe_compile_cache.py [--cache-dir DIR] [--full]
  --full uses the production 131k-pt dims (one extra multi-minute compile
  on a cold cache); default uses 16k dims so the probe stays cheap.
Run alone (never overlap TPU jobs).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
t_start = time.perf_counter()
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", {cache!r})
# Cache everything, however small/fast the compile:
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
try:
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
except Exception:
    pass  # knob absent on older jax

from urban_road_filter_tpu.config import FilterConfig, PipelineDims
from urban_road_filter_tpu.io.synthetic import SCENES, make_scan
from urban_road_filter_tpu.pipeline import pad_scan, process_batch_jit

cfg = FilterConfig()
dims = PipelineDims(max_points={pts}, rings=64, ring_capacity=1024,
                    beam_capacity=512)
scan = pad_scan(make_scan(SCENES["two_curbs"](), n_rings=64,
                          n_azimuth={pts} // 64, seed=3), dims.max_points)
pts_dev = jax.numpy.asarray(np.stack([scan] * 8))
t_import = time.perf_counter()
np.asarray(jax.numpy.zeros((8,), jax.numpy.int32))  # tunnel warm-up
t_warm = time.perf_counter()
out = process_batch_jit(pts_dev, cfg, dims)
ok = np.asarray(out.ok)
t_first = time.perf_counter()
assert bool(ok.all())
print(json.dumps({{
    "import_s": round(t_import - t_start, 2),
    "first_d2h_warmup_s": round(t_warm - t_import, 2),
    "compile_plus_first_result_s": round(t_first - t_warm, 2),
    "total_s": round(t_first - t_start, 2),
}}))
"""


def run_child(cache: str, pts: int) -> dict:
    code = CHILD.format(repo=REPO, cache=cache, pts=pts)
    proc = subprocess.run([sys.executable, "-c", code], cwd=REPO,
                          stdout=subprocess.PIPE, text=True)
    lines = [ln for ln in (proc.stdout or "").splitlines() if ln.strip()]
    if proc.returncode != 0 or not lines:
        raise RuntimeError(f"child failed rc={proc.returncode}: {lines[-3:]}")
    return json.loads(lines[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cache-dir", default=None)
    ap.add_argument("--full", action="store_true",
                    help="production 131k dims instead of the 16k probe")
    args = ap.parse_args()

    cache = args.cache_dir or tempfile.mkdtemp(prefix="urf_xla_cache_")
    os.makedirs(cache, exist_ok=True)
    pts = 131072 if args.full else 16384

    cold = run_child(cache, pts)
    entries = sum(len(fs) for _, _, fs in os.walk(cache))
    warm = run_child(cache, pts)

    result = {
        "cache_dir": cache,
        "points": pts,
        "cold": cold,
        "cache_entries_after_cold": entries,
        "warm": warm,
        "speedup_compile_s": round(
            cold["compile_plus_first_result_s"]
            - warm["compile_plus_first_result_s"], 2),
    }
    print(json.dumps(result, indent=1))
    if not args.cache_dir:
        shutil.rmtree(cache, ignore_errors=True)


if __name__ == "__main__":
    main()
