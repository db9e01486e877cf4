"""Capture a jax.profiler trace of the flagship p64/A=64 render and print the
top device ops by total time (parsed from the trace proto)."""

import glob
import gzip
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

from diner_tpu.utils.profiling import setup_compilation_cache

setup_compilation_cache()

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
from bench_r3 import build  # noqa: E402

render, variables, batch = build(64, 64, 4096)
out = jax.block_until_ready(render(variables, batch, jax.random.PRNGKey(0)))

trace_dir = "/tmp/r3trace"
with jax.profiler.trace(trace_dir):
    out = jax.block_until_ready(render(variables, batch, jax.random.PRNGKey(0)))
    import numpy as np

    np.asarray(out[0].ravel()[0])

# find the trace file
files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
print("trace files:", files)
for f in files:
    with gzip.open(f, "rt") as fh:
        data = json.load(fh)
    events = [e for e in data.get("traceEvents", [])
              if e.get("ph") == "X" and e.get("dur")]
    # aggregate by name, device track only (pid with 'TPU'/'device' in name)
    by_name = {}
    for e in events:
        n = e.get("name", "?")
        by_name[n] = by_name.get(n, 0) + e["dur"]
    top = sorted(by_name.items(), key=lambda kv: -kv[1])[:40]
    total = sum(by_name.values())
    print(f"== {f}: total {total/1e3:.1f} ms across {len(events)} events")
    for n, d in top:
        print(f"{d/1e3:10.2f} ms  {n[:110]}")
