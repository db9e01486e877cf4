"""Canonical job specs — the reference's submit files, one per entry.

Behavioral reference (malteprinzler/diner):
  deps/TransMVSNet/condor_scripts/transmvsnet_train_dtu.sub        (8 accel)
  deps/TransMVSNet/condor_scripts/transmvsnet_train_facescape.sub
  deps/TransMVSNet/condor_scripts/transmvsnet_train_multiface.sub
  deps/TransMVSNet/condor_scripts/transmvsnet_write_facescape.sub
  deps/TransMVSNet/condor_scripts/transmvsnet_write_multiface.sub
  deps/facescape_preprocessing/process_dataset.sub                 (array job)

Resource shapes follow the reference where they are workload statements
(cpus/memory/disk); the accelerator request is the TPU-native equivalent of
the reference's 8x RTX 2080 Ti (one v5e-2x4 slice). Paths are parameterized
by {data}/{out} and resolved by the submit CLI.
"""

from __future__ import annotations

from diner_tpu.cluster.jobs import JobSpec

PY = "python"

SPECS = {
    "mvs-train-dtu": JobSpec(
        name="mvs-train-dtu",
        command=[PY, "-m", "diner_tpu.cli.mvs", "train",
                 "--datapath", "{data}/dtu_training",
                 "--listfile", "lists/dtu/train.txt",
                 "--logdir", "{out}/mvs_dtu"],
        cpus=16, memory_mb=80000, disk_gb=100,
        accelerator="tpu-v5-lite-podslice:2x4",
    ),
    "mvs-train-facescape": JobSpec(
        name="mvs-train-facescape",
        command=[PY, "-m", "diner_tpu.cli.mvs", "train",
                 "--dataset", "facescape",
                 "--datapath", "{data}/FACESCAPE_PROCESSED",
                 "--listfile", "unused",
                 "--logdir", "{out}/mvs_facescape"],
        cpus=16, memory_mb=80000, disk_gb=100,
        accelerator="tpu-v5-lite-podslice:2x4",
    ),
    "mvs-train-multiface": JobSpec(
        name="mvs-train-multiface",
        command=[PY, "-m", "diner_tpu.cli.mvs", "train",
                 "--dataset", "multiface",
                 "--datapath", "{data}/MULTIFACE_PROCESSED",
                 "--listfile", "unused",
                 "--logdir", "{out}/mvs_multiface"],
        cpus=16, memory_mb=80000, disk_gb=100,
        accelerator="tpu-v5-lite-podslice:2x4",
    ),
    "mvs-write-facescape": JobSpec(
        name="mvs-write-facescape",
        command=[PY, "-m", "diner_tpu.cli.mvs", "write",
                 "--dataset", "facescape",
                 "--datapath", "{data}/FACESCAPE_PROCESSED",
                 "--listfile", "unused",
                 "--ckpt", "{out}/mvs_facescape/ckpts"],
        cpus=7, memory_mb=70000, disk_gb=100,
        accelerator="tpu-v5-lite-podslice:2x4",
    ),
    "mvs-write-multiface": JobSpec(
        name="mvs-write-multiface",
        command=[PY, "-m", "diner_tpu.cli.mvs", "write",
                 "--dataset", "multiface",
                 "--datapath", "{data}/MULTIFACE_PROCESSED",
                 "--listfile", "unused",
                 "--ckpt", "{out}/mvs_multiface/ckpts"],
        cpus=7, memory_mb=70000, disk_gb=100,
        accelerator="tpu-v5-lite-podslice:2x4",
    ),
    # array job: one FaceScape subject per item, CPU-only, 10 at a time
    # (process_dataset.sub: request_cpus=1, 34 GB, concurrency 10,
    # `queue SubjectID from incomplete_subjects.txt`)
    "facescape-preprocess": JobSpec(
        name="facescape-preprocess",
        command=[PY, "-m", "diner_tpu.preprocess.facescape_pipeline",
                 "--dir-in", "{data}/FACESCAPE_RAW/{item}",
                 "--dir-out", "{data}/FACESCAPE_PROCESSED/{item}"],
        cpus=1, memory_mb=34000, disk_gb=300,
        array_file="assets/data_splits/facescape/subjects.txt",
        concurrency=10,
    ),
    # multi-host DINER training (scripts/train_multihost.sh per host)
    "diner-train-dtu-multihost": JobSpec(
        name="diner-train-dtu-multihost",
        command=["scripts/train_multihost.sh", "configs/train_dtu.yaml",
                 "{out}/diner_dtu"],
        cpus=16, memory_mb=80000, disk_gb=100,
        accelerator="tpu-v5-lite-podslice:4x4",
        num_hosts=4,
    ),
}
