"""True multi-process data-parallel test (VERDICT r1 item 2).

Spawns TWO ``jax.distributed`` CPU processes (4 virtual devices each -> one
8-device global mesh), each feeding only its rank-half of the global batch
through ``parallel.mesh.shard_batch`` and running one real train step, plus the
Trainer COCO shard-merge protocol.  Asserts:

  * both processes end with IDENTICAL params/batch_stats/loss (replicated
    outputs agree bit-for-bit across processes), and
  * those match a single-process run of the SAME global batch on this test
    process's own 8-device mesh (so the multi-process feeding reconstructs
    exactly the right global array — the failure mode of ``device_put`` with a
    global sharding on local data), and
  * rank 0 ends with BOTH ranks' COCO detections after the shard merge.

Reference capability: multi-process DDP via torch.distributed.launch
(reference dist_train.sh:7-10, train.py:40-43).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _worker_env(n_local_devices):
    from orienmask_tpu.utils.envs import cpu_subprocess_env

    env = cpu_subprocess_env(n_local_devices)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def test_two_process_train_step_and_coco_merge(tmp_path):
    port = _free_port()
    coordinator = f"localhost:{port}"
    env = _worker_env(4)
    script = os.path.join(HERE, "dist_worker.py")

    procs = [
        subprocess.Popen(
            [sys.executable, script, coordinator, "2", str(pid), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, cwd=REPO,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"

    r0 = np.load(tmp_path / "rank0.npz")
    r1 = np.load(tmp_path / "rank1.npz")
    assert int(r0["n_devices"]) == 8 and int(r0["n_local"]) == 4

    # both processes agree bit-for-bit on the replicated training state
    # (n_coco_results legitimately differs: rank 0 holds the merged shards)
    for key in r0.files:
        if key == "n_coco_results":
            continue
        np.testing.assert_array_equal(r0[key], r1[key], err_msg=key)

    # ... and match a single-process ground-truth run on the full global batch
    from orienmask_tpu.parallel.mesh import data_mesh

    sys.path.insert(0, HERE)
    from dist_worker import global_batch, run_one_step

    mesh = data_mesh(n_devices=8)
    params, stats, loss = run_one_step(mesh, global_batch())
    assert np.allclose(loss, float(r0["loss"]), rtol=1e-6, atol=1e-7)
    import jax

    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(
            {"params": params, "batch_stats": stats})[0]:
        flat[jax.tree_util.keystr(path)] = np.asarray(leaf)
    for key, expected in flat.items():
        np.testing.assert_allclose(
            r0[key], expected, rtol=1e-5, atol=1e-6, err_msg=key)

    # COCO shard merge: rank 0 ended with both ranks' detections
    assert int(r0["n_coco_results"]) == 2
    assert int(r1["n_coco_results"]) == 1
    # rank 1's temp shard file was consumed
    assert not (tmp_path / "_coco_shard_1.json").exists()
