"""Cluster job layer: scheduler-agnostic job specs + backend renderers.

Behavioral reference: the HTCondor submit files in
deps/TransMVSNet/condor_scripts/*.sub (single multi-accelerator training
jobs: request_cpus/request_memory/request_gpus/requirements + log plumbing)
and deps/facescape_preprocessing/process_dataset.sub (array jobs:
`queue SubjectID from <file>` with `concurrency_limits`) in
malteprinzler/diner.

Instead of hard-coding one scheduler, a job is described once as a
`JobSpec` and rendered to the backend in use:

- ``to_condor``   — an HTCondor .sub file (drop-in parity with the
  reference's cluster; GPU fields become accelerator requirements).
- ``to_jobset``   — a Kubernetes JobSet manifest targeting GKE TPU slices
  (the TPU-native deployment path): one replicated Job per host with the
  JAX distributed-init env (coordinator address / process count / id)
  injected, nodeSelectors for the accelerator type and topology, and
  completion-indexed array jobs.
- ``run_local``   — executes an array job in-process with a concurrency
  cap and bounded per-item retries (the reference's condor eviction/retry
  semantics, scaled down): used by tests and for single-machine runs.

Canonical specs mirroring the reference's submit files live in
`diner_tpu.cluster.specs`; `python -m diner_tpu.cli.submit` renders or runs
them.
"""

from __future__ import annotations

import dataclasses
import shlex
import subprocess
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Mapping, Sequence


@dataclasses.dataclass(frozen=True)
class JobSpec:
    """One schedulable unit of work.

    `command` is an argv list; the placeholder ``{item}`` in any element is
    substituted per array item (reference: `$(SubjectID)` in
    process_dataset.sub). `array_file` names a text file with one item per
    line; None means a single (non-array) job.
    """

    name: str
    command: Sequence[str]
    cpus: int = 1
    memory_mb: int = 4000
    disk_gb: int = 10
    # accelerator request, e.g. "tpu-v5e:2x4" (type:topology) or "" for CPU.
    # For the condor backend a "gpu:<count>[:<device name>]" form maps to
    # request_gpus/requirements (the reference's fields).
    accelerator: str = ""
    num_hosts: int = 1
    array_file: str | None = None
    concurrency: int | None = None
    max_retries: int = 2
    log_dir: str = "logs"
    env: Mapping[str, str] = dataclasses.field(default_factory=dict)

    def item_command(self, item: str) -> list[str]:
        return [c.replace("{item}", item) for c in self.command]


def to_condor(spec: JobSpec) -> str:
    """Render an HTCondor submit file (reference submit-file contract:
    condor_scripts/transmvsnet_train_dtu.sub:1-12, process_dataset.sub)."""
    argv = list(spec.command)
    lines = [
        f"executable = {argv[0]}",
        'arguments = "' + " ".join(
            a.replace("{item}", "$(Item)") for a in argv[1:]) + '"',
        f"request_cpus = {spec.cpus}",
        f"request_memory = {spec.memory_mb}",
        f"request_disk = {spec.disk_gb}G",
    ]
    if spec.accelerator.startswith("gpu:"):
        parts = spec.accelerator.split(":")
        lines.append(f"request_gpus = {parts[1]}")
        if len(parts) > 2:
            lines.append(f'requirements = TARGET.CUDADeviceName=="{parts[2]}"')
    elif spec.accelerator:
        lines.append(f'requirements = TARGET.AcceleratorType=="{spec.accelerator}"')
    if spec.env:
        # ONE environment command: condor submit commands are last-one-wins,
        # so per-var lines would silently drop all but the final variable
        pairs = " ".join(f"{k}={v}" for k, v in spec.env.items())
        lines.append(f'environment = "{pairs}"')
    tag = "$(ClusterId).$(Process)" + ("_$(Item)" if spec.array_file else "")
    lines += [
        f"log_root = {spec.log_dir}/{spec.name}_{tag}",
        "error = $(log_root).err",
        "output = $(log_root).out",
        "log = $(log_root).log",
    ]
    if spec.concurrency:
        lines.append(f"concurrency_limits = user.{spec.name}:{spec.concurrency}")
    if spec.array_file:
        lines.append(f"queue Item from {spec.array_file}")
    else:
        lines.append("queue")
    return "\n".join(lines) + "\n"


def _topology_chips(topology: str) -> int:
    """'2x4' -> 8; '4x4' -> 16. GKE requires a TPU pod to request exactly
    the node's chip count, so the resource limit must follow the topology."""
    chips = 1
    for part in topology.split("x"):
        chips *= int(part)
    return chips


def to_jobset(spec: JobSpec, image: str = "diner-tpu:latest",
              port: int = 8476) -> dict:
    """Render a Kubernetes JobSet manifest (as a dict; dump with yaml) for
    GKE TPU slices — the TPU-native analog of the reference's condor layer.

    Multi-host jobs get `spec.num_hosts` indexed completions with the JAX
    distributed-init env pointing at completion 0's pod DNS name
    (JobSet pods are named <jobset>-<replicatedJob>-<jobIndex>-<podIndex>
    on the jobset-named headless service). Array jobs become indexed
    completions over the items file: each pod resolves its own item by
    line number (JOB_COMPLETION_INDEX) from the items file, which must be
    available inside the image/volume at the recorded path.
    """
    acc_type, _, topology = spec.accelerator.partition(":")
    node_selector = {}
    if acc_type.startswith("tpu"):
        node_selector["cloud.google.com/gke-tpu-accelerator"] = acc_type
        if topology:
            node_selector["cloud.google.com/gke-tpu-topology"] = topology
    env = [{"name": k, "value": str(v)} for k, v in spec.env.items()]
    # pod hostname convention: <jobset>-<replicatedJob>-<jobIndex>-<podIndex>,
    # subdomain = the JobSet's headless service (named after the JobSet)
    coordinator = f"{spec.name}-work-0-0.{spec.name}:{port}"
    if spec.num_hosts > 1:
        env += [
            {"name": "JAX_COORDINATOR_ADDRESS", "value": coordinator},
            {"name": "JAX_NUM_PROCESSES", "value": str(spec.num_hosts)},
            {"name": "JAX_PROCESS_ID",
             "valueFrom": {"fieldRef": {"fieldPath":
                 "metadata.annotations['batch.kubernetes.io/job-completion-index']"}}},
        ]

    if spec.array_file:
        n_items = None
        try:
            n_items = len([ln for ln in
                           Path(spec.array_file).read_text().splitlines()
                           if ln.strip()])
        except OSError:
            raise ValueError(
                f"array_file {spec.array_file!r} must be readable at render "
                "time so the JobSet completion count matches the items")
        completions = n_items
        # each indexed pod picks its line from the items file; {item} may be
        # embedded in a longer path ("...RAW/{item}") so substitute in place
        def word(c: str) -> str:
            if "{item}" not in c:
                return shlex.quote(c)
            return '"' + (c.replace("\\", "\\\\").replace('"', '\\"')
                          .replace("{item}", "${ITEM}")) + '"'

        item_cmd = " ".join(word(c) for c in spec.command)
        command = ["/bin/sh", "-c",
                   f'ITEM=$(sed -n "$((JOB_COMPLETION_INDEX+1))p" '
                   f'{shlex.quote(spec.array_file)}) && exec {item_cmd}']
    else:
        completions = spec.num_hosts
        command = list(spec.command)

    container = {
        "name": spec.name,
        "image": image,
        "command": command,
        "env": env,
        "resources": {"limits": {
            "cpu": str(spec.cpus),
            "memory": f"{spec.memory_mb}Mi",
            # each pod runs on ONE node of the slice and must request exactly
            # that node's chips: total topology chips / hosts
            **({"google.com/tpu":
                str(_topology_chips(topology) // max(spec.num_hosts, 1))}
               if acc_type.startswith("tpu") and topology else {}),
        }},
    }
    job_template = {
        "spec": {
            "completions": completions,
            "parallelism": (min(spec.concurrency, completions)
                            if spec.concurrency else completions),
            "completionMode": "Indexed",
            "backoffLimit": spec.max_retries,
            "template": {
                "spec": {
                    "nodeSelector": node_selector,
                    "restartPolicy": "Never",
                    "subdomain": spec.name,
                    "containers": [container],
                },
            },
        },
    }
    return {
        "apiVersion": "jobset.x-k8s.io/v1alpha2",
        "kind": "JobSet",
        "metadata": {
            "name": spec.name,
            **({"annotations": {"diner-tpu/array-items-file":
                                spec.array_file}}
               if spec.array_file else {}),
        },
        "spec": {
            "replicatedJobs": [{"name": "work", "replicas": 1,
                                "template": job_template}],
        },
    }


def run_local(spec: JobSpec, items: Sequence[str] | None = None,
              log_dir: str | Path | None = None,
              runner=subprocess.run) -> dict:
    """Execute the job (or its array items) locally with the spec's
    concurrency cap and bounded retries. Returns {item: returncode}.

    The reference gets retries from condor's evict/requeue machinery;
    here each item is retried up to `max_retries` times on nonzero exit.
    """
    log_dir = Path(log_dir or spec.log_dir)
    log_dir.mkdir(parents=True, exist_ok=True)
    if items is None:
        if spec.array_file:
            items = [ln.strip() for ln in
                     Path(spec.array_file).read_text().splitlines()
                     if ln.strip()]
        else:
            items = [""]

    def run_one(item: str) -> int:
        argv = spec.item_command(item)
        tag = item or "job"
        log = log_dir / f"{spec.name}_{tag}.log"
        for attempt in range(spec.max_retries + 1):
            with open(log, "a") as fh:
                fh.write(f"+ attempt {attempt}: {shlex.join(argv)}\n")
                fh.flush()
                proc = runner(argv, stdout=fh, stderr=subprocess.STDOUT)
            rc = proc.returncode
            if rc == 0:
                return 0
        return rc

    # duplicate array lines would race on the same log file and collapse
    # into one result key — run each distinct item once, like condor's
    # queue-from dedups identical procs by args
    items = list(dict.fromkeys(items))
    workers = spec.concurrency or len(items) or 1
    with ThreadPoolExecutor(max_workers=max(1, workers)) as pool:
        results = dict(zip(items, pool.map(run_one, items)))
    return results
