"""Persistent TPU job worker for the sandbox's single-claim axon tunnel.

The axon terminal holds a per-process chip claim that takes minutes to
expire after a client exits (or is killed), so iterating via one-script-
per-measurement pays a ~3-5 min claim wait per invocation. This worker
claims the chip ONCE and then executes job files dropped into its spool
directory, keeping every compiled executable and the device claim warm
across jobs.

Protocol: drop `<name>.py` into --spool (default /tmp/tpu_jobs). The worker
execs it in a persistent namespace (so jobs can cache models/encodings for
later jobs), streaming stdout/stderr to `<name>.log`, then writes
`<name>.done` ("ok" or the traceback). Jobs are executed in mtime order;
a job named `quit.py` shuts the worker down cleanly (releasing the claim).

Usage: nohup python scripts/tpu_worker.py > /tmp/tpu_worker.log 2>&1 &
"""

from __future__ import annotations

import argparse
import contextlib
import io
import sys
import time
import traceback
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spool", default="/tmp/tpu_jobs")
    args = ap.parse_args()
    spool = Path(args.spool)
    spool.mkdir(parents=True, exist_ok=True)

    from diner_tpu.utils.profiling import setup_compilation_cache

    setup_compilation_cache()
    import jax

    t0 = time.time()
    dev = jax.devices()[0]
    print(f"[worker] claimed {dev} in {time.time() - t0:.1f}s", flush=True)
    (spool / "READY").write_text(str(dev))

    ns: dict = {"__name__": "__tpu_job__"}
    done = set()
    while True:
        jobs = sorted((p for p in spool.glob("*.py")
                       if p.stem not in done and p.stem != "quit"),
                      key=lambda p: p.stat().st_mtime)
        quit_job = spool / "quit.py"
        if quit_job.exists() and "quit" not in done:
            jobs.append(quit_job)
        for job in jobs:
            done.add(job.stem)
            print(f"[worker] running {job.name}", flush=True)
            buf = io.StringIO()
            t = time.time()
            ok = True
            try:
                code = compile(job.read_text(), str(job), "exec")
                with contextlib.redirect_stdout(buf), \
                        contextlib.redirect_stderr(buf):
                    exec(code, ns)
            except BaseException:  # noqa: BLE001 — report, keep serving
                ok = False
                buf.write("\n" + traceback.format_exc())
            (spool / f"{job.stem}.log").write_text(buf.getvalue())
            (spool / f"{job.stem}.done").write_text(
                ("ok" if ok else "FAIL") + f" {time.time() - t:.1f}s")
            print(f"[worker] {job.name}: {'ok' if ok else 'FAIL'} "
                  f"({time.time() - t:.1f}s)", flush=True)
            if job.stem == "quit":
                return
        time.sleep(1.0)


if __name__ == "__main__":
    main()
