"""Cluster job layer: condor/jobset rendering + local array execution."""

import subprocess

import numpy as np
import yaml

from diner_tpu.cluster import SPECS, JobSpec, run_local, to_condor, to_jobset


def test_condor_render_single_job():
    sub = to_condor(SPECS["mvs-train-dtu"])
    assert "request_cpus = 16" in sub
    assert "request_memory = 80000" in sub
    assert 'requirements = TARGET.AcceleratorType=="tpu-v5-lite-podslice:2x4"' in sub
    assert sub.strip().endswith("queue")


def test_condor_render_array_job():
    sub = to_condor(SPECS["facescape-preprocess"])
    assert "queue Item from assets/data_splits/facescape/subjects.txt" in sub
    assert "concurrency_limits = user.facescape-preprocess:10" in sub
    assert "$(Item)" in sub  # per-item substitution in arguments


def test_condor_gpu_form():
    spec = JobSpec(name="x", command=["/bin/bash", "t.sh"],
                   accelerator="gpu:8:NVIDIA GeForce RTX 2080 Ti")
    sub = to_condor(spec)
    assert "request_gpus = 8" in sub
    assert 'TARGET.CUDADeviceName=="NVIDIA GeForce RTX 2080 Ti"' in sub


def test_jobset_multihost_env():
    manifest = to_jobset(SPECS["diner-train-dtu-multihost"])
    yaml.safe_dump(manifest)  # serializable
    tmpl = manifest["spec"]["replicatedJobs"][0]["template"]["spec"]
    assert tmpl["completions"] == 4
    pod = tmpl["template"]["spec"]
    assert pod["subdomain"] == "diner-train-dtu-multihost"
    sel = pod["nodeSelector"]
    assert sel["cloud.google.com/gke-tpu-accelerator"] == "tpu-v5-lite-podslice"
    assert sel["cloud.google.com/gke-tpu-topology"] == "4x4"
    cont = pod["containers"][0]
    env = {e["name"]: e.get("value") for e in cont["env"]}
    assert {"JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
            "JAX_PROCESS_ID"} <= set(env)
    # coordinator follows the JobSet pod DNS convention
    # <jobset>-<replicatedJob>-<jobIndex>-<podIndex>.<jobset-subdomain>
    assert env["JAX_COORDINATOR_ADDRESS"].startswith(
        "diner-train-dtu-multihost-work-0-0.diner-train-dtu-multihost:")
    # per-POD chip request: topology total / hosts (4x4=16 chips, 4 hosts
    # -> 4 chips per node)
    assert cont["resources"]["limits"]["google.com/tpu"] == "4"


def test_jobset_array_fanout():
    manifest = to_jobset(SPECS["facescape-preprocess"])
    tmpl = manifest["spec"]["replicatedJobs"][0]["template"]["spec"]
    assert tmpl["completions"] == 359      # one per subjects.txt line
    assert tmpl["parallelism"] == 10       # spec concurrency cap
    cmd = tmpl["template"]["spec"]["containers"][0]["command"]
    assert cmd[0] == "/bin/sh"
    assert "JOB_COMPLETION_INDEX" in cmd[2]   # per-pod item resolution
    assert "${ITEM}" in cmd[2]                # embedded-path substitution


def test_condor_env_single_line():
    spec = JobSpec(name="envjob", command=["run"], env={"A": "1", "B": "2"})
    sub = to_condor(spec)
    env_lines = [l for l in sub.splitlines() if l.startswith("environment")]
    assert env_lines == ['environment = "A=1 B=2"']


def test_run_local_array_concurrency_and_retries(tmp_path):
    items_file = tmp_path / "items.txt"
    items_file.write_text("a\nb\nc\n")
    spec = JobSpec(name="echo", command=["echo", "item={item}"],
                   array_file=str(items_file), concurrency=2, max_retries=1,
                   log_dir=str(tmp_path / "logs"))
    results = run_local(spec)
    assert results == {"a": 0, "b": 0, "c": 0}
    log = (tmp_path / "logs" / "echo_a.log").read_text()
    assert "item=a" in log

    # a failing item is retried max_retries times and reported nonzero
    calls = []

    def fake_runner(argv, **kw):
        calls.append(argv)
        return subprocess.CompletedProcess(argv, returncode=3)

    spec_fail = JobSpec(name="fail", command=["false", "{item}"],
                        max_retries=2, log_dir=str(tmp_path / "logs"))
    results = run_local(spec_fail, items=["x"], runner=fake_runner)
    assert results == {"x": 3}
    assert len(calls) == 3  # initial + 2 retries


def test_submit_cli_renders(tmp_path, capsys):
    from diner_tpu.cli.submit import main

    rc = main(["mvs-train-dtu", "--backend", "condor", "--data", "/d",
               "--out", "/o", "--dir", str(tmp_path)])
    assert rc == 0
    path = tmp_path / "mvs-train-dtu.sub"
    text = path.read_text()
    assert "/d/dtu_training" in text and "/o/mvs_dtu" in text

    rc = main(["facescape-preprocess", "--backend", "jobset",
               "--dir", str(tmp_path)])
    assert rc == 0
    manifest = yaml.safe_load((tmp_path / "facescape-preprocess.yaml").read_text())
    assert manifest["kind"] == "JobSet"


def test_ply_mesh_reader_ascii_and_binary(tmp_path):
    from diner_tpu.fusion.ply import read_ply_mesh

    ascii_ply = tmp_path / "quad.ply"
    ascii_ply.write_text(
        "ply\nformat ascii 1.0\n"
        "element vertex 4\nproperty float x\nproperty float y\nproperty float z\n"
        "element face 1\nproperty list uchar int vertex_indices\n"
        "end_header\n"
        "0 0 0\n1 0 0\n1 1 0\n0 1 0\n"
        "4 0 1 2 3\n")
    v, f = read_ply_mesh(ascii_ply)
    assert v.shape == (4, 3) and f.shape == (2, 3)  # quad fan-triangulated
    np.testing.assert_array_equal(f, [[0, 1, 2], [0, 2, 3]])

    bin_ply = tmp_path / "tri.ply"
    header = (b"ply\nformat binary_little_endian 1.0\n"
              b"element vertex 3\nproperty float x\nproperty float y\n"
              b"property float z\n"
              b"element face 1\nproperty list uchar int vertex_indices\n"
              b"end_header\n")
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    body = verts.tobytes() + np.uint8(3).tobytes() + \
        np.array([0, 1, 2], np.int32).tobytes()
    bin_ply.write_bytes(header + body)
    v, f = read_ply_mesh(bin_ply)
    np.testing.assert_allclose(v, verts)
    np.testing.assert_array_equal(f, [[0, 1, 2]])


def test_facescape_subject_driver(tmp_path):
    """Synthetic raw-subject layout -> process_subject produces the
    loader-ready files (process_dataset.py contract)."""
    import imageio.v2 as imageio
    import json

    from diner_tpu.preprocess.facescape_pipeline import process_subject

    raw = tmp_path / "raw" / "1_neutral"
    raw.mkdir(parents=True)
    # a 1m-deep quad in front of two cameras at the origin
    (tmp_path / "raw" / "1_neutral.ply").write_text(
        "ply\nformat ascii 1.0\n"
        "element vertex 4\nproperty float x\nproperty float y\nproperty float z\n"
        "element face 1\nproperty list uchar int vertex_indices\n"
        "end_header\n"
        "-0.3 -0.3 1\n0.3 -0.3 1\n0.3 0.3 1\n-0.3 0.3 1\n"
        "4 0 1 2 3\n")
    H = W = 64
    K = [[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]]
    rt = np.eye(4)[:3].tolist()
    params = {}
    for i in range(2):
        params[f"{i}_K"] = K
        params[f"{i}_Rt"] = rt
        params[f"{i}_distortion"] = [0, 0, 0, 0, 0]
        params[f"{i}_valid"] = i == 0 or True
        imageio.imwrite(raw / f"{i}.png",
                        np.full((H, W, 3), 128, np.uint8))
    params["1_valid"] = False  # one invalid view must be skipped
    (raw / "params.json").write_text(json.dumps(params))

    out = tmp_path / "processed"
    done = process_subject(tmp_path / "raw", out, crop_out=32)
    assert len(done) == 1
    pose_dir = out / "1"
    assert (pose_dir / "view_00000" / "rgba.png").exists()
    assert (pose_dir / "view_00000" / "depth.png").exists()
    assert not (pose_dir / "view_00001").exists()  # invalid view skipped
    cams = json.loads((pose_dir / "cameras.json").read_text())
    assert "0" in cams and len(cams) == 1
    # depth decodes back to ~1 m where the quad projects
    from diner_tpu.data.codecs import read_depth_png
    d = read_depth_png(pose_dir / "view_00000" / "depth.png")
    assert np.isclose(d[d > 0].mean(), 1.0, atol=0.01)
