"""Full-CLI multi-process rehearsal (VERDICT r3 task 4).

Runs ``train.py`` ITSELF (not a worker script) as a 2-process
``jax.distributed`` CPU job (4 virtual devices each -> one 8-device global
mesh) on a mini dataset for 4 epochs with ``val_freq=2``,
``async_checkpoint: true`` — exercising together, across real process
boundaries, what previously only ran one step deep: run-dir stamp broadcast,
rank-sharded loaders, SyncBN + grad all-reduce, val-epoch COCO shard merge,
async checkpointing, and kill -9 of BOTH processes + 2-process ``-r`` resume.

Asserts the killed-and-resumed trajectory ends BIT-IDENTICAL to the
uninterrupted 2-process run, and that a single-process run of the same
global batch schedule matches at the first-epoch LOSS level (the loaders'
rank-strided split permutes samples WITHIN each global batch — the loss is
placement-invariant to fp noise, but parameter trajectories diverge
chaotically from ~1e-8 BN reduction noise through the discrete obj-ignore
threshold; see the measured-drift comment at the run-C assertions).

Reference capability: dist_train.sh + DDP epoch loop
(reference trainer/trainer.py:27-133).
"""

import glob
import json
import os
import signal
import socket
import subprocess
import sys
import time

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


def _make_config(root, log_dir, epochs=4):
    """Mini config: 16 images, slim backbone, 96^2, global batch 8."""
    from orienmask_tpu.config.base import ANCHORS_MASK

    # reuse the synthetic mini-dataset generator from the trainer test
    from tests.test_trainer import _make_dataset

    list_file, img_dir, anno_file, gt_file = _make_dataset(root, n_images=16)
    size = 96
    grids = [[size // 32] * 2, [size // 16] * 2, [size // 8] * 2]
    anchors = [[4, 6], [8, 10], [12, 8], [10, 20], [20, 16], [18, 36],
               [36, 28], [48, 60], [60, 50]]
    dataset = dict(type="COCODataset", list_file=list_file, image_dir=img_dir,
                   anno_file=anno_file, with_mask=True, with_info=True)
    transform = dict(type="COCOTransform", pipeline=[
        dict(type="Resize", size=(size, size), pad_needed=False, warp_p=0.,
             jitter=0., random_place=False, pad_p=0., pad_ratio=0., pad_value=0),
        dict(type="ToArray"),
        dict(type="Normalize", mean=(0, 0, 0), std=(255, 255, 255)),
    ])
    loader = dict(type="DataLoader", dataset=dataset, transform=transform,
                  batch_size=1, num_workers=0, shuffle=True,
                  max_instances=8, pack_masks=True, collate=dict(type="collate"))
    return dict(
        name="cli2proc", n_device=8, epochs=epochs, accumulate=1,
        monitor="segm_AP", monitor_mode="max", log_dir=log_dir,
        val_freq=2, save_freq=2, temp_save_freq=1, log_freq=1, seed=0,
        trainer="Trainer", compute_dtype="float32", async_checkpoint=True,
        model=dict(type="OrienMaskYOLOFPNPlus", num_anchors=3, num_classes=80,
                   pretrained=None, freeze_backbone=False,
                   backbone_batchnorm_eval=False,
                   backbone_stage_blocks=[1, 1, 1, 1, 1]),
        train_loader=loader,
        val_loader=dict(loader, shuffle=False),
        val_gt_file=gt_file,
        loss=dict(type="OrienMaskYOLOMultiScaleLoss", grid_size=grids,
                  image_size=[size, size], anchors=anchors,
                  anchor_mask=ANCHORS_MASK, num_classes=80,
                  center_region=0.6, valid_region=0.6, label_smooth=False,
                  obj_ignore_threshold=0.7, weight=[1, 1, 1, 1, 1, 20, 20],
                  scales_weight=[1, 1, 1], target_chunk=4),
        postprocess=dict(type="OrienMaskYOLOPostProcess", grid_size=grids,
                         image_size=[size, size], anchors=anchors,
                         anchor_mask=ANCHORS_MASK, num_classes=80,
                         conf_thresh=0.005,
                         nms=dict(type="batched_nms", threshold=0.5),
                         nms_pre=50, nms_post=10, orien_thresh=0.3),
        optimizer=dict(type="SGD", lr=1e-3, momentum=0.9, weight_decay=5e-4),
        lr_scheduler=dict(type="StepWarmUpLR", warmup_type="linear",
                          warmup_iter=4, warmup_ratio=0.1,
                          milestones=[100, 200], gamma=0.1),
    )


def _launch(cfg_path, resume=None, n_procs=2, extra=()):
    port = _free_port()
    procs = []
    for pid in range(n_procs):
        cmd = [sys.executable, os.path.join(REPO, "train.py"), "-c", cfg_path]
        if resume:
            cmd += ["-r", resume]
        if n_procs > 1:
            cmd += ["--coordinator", f"localhost:{port}",
                    "--num-processes", str(n_procs), "--process-id", str(pid)]
        cmd += list(extra)
        procs.append(subprocess.Popen(
            cmd, env=_worker_env(8 // n_procs), cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    return procs


def _finish(procs, timeout=1500):
    outs = []
    deadline = time.time() + timeout
    for p in procs:
        try:
            out, _ = p.communicate(timeout=max(1, deadline - time.time()))
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            outs.append(out)
            raise AssertionError(
                "train.py process timed out; output:\n" + out[-4000:])
        outs.append(out)
    # aggregate EVERY failing rank's output: rank 0's failure is usually a
    # collective cascade from another rank's real error
    failing = [(i, p.returncode, out) for i, (p, out) in
               enumerate(zip(procs, outs)) if p.returncode != 0]
    assert not failing, "\n\n".join(
        f"train.py rank {i} rc={rc}; output:\n{out[-4000:]}"
        for i, rc, out in failing)
    return outs


def _first_epoch_loss(log_path):
    """loss_sum ALL from the first [EPOCH 1] TRAIN table."""
    txt = open(log_path).read()
    block = txt.split("[EPOCH 1]")[1].split("[EPOCH 2]")[0]
    for line in block.splitlines():
        if line.startswith("| loss_sum"):
            return float(line.split("|")[-2])
    raise AssertionError(f"no epoch-1 loss_sum table in {log_path}")


def _run_dir(log_dir):
    dirs = sorted(glob.glob(os.path.join(log_dir, "cli2proc_*")))
    assert dirs, f"no run dir under {log_dir}"
    return dirs[-1]


def _load_params(ckpt_path):
    from orienmask_tpu.trainer.checkpoint import load_checkpoint

    st = load_checkpoint(ckpt_path)
    return st


def _flat(tree):
    import jax

    return np.concatenate([np.asarray(x).ravel()
                           for x in jax.tree_util.tree_leaves(tree)])


def test_cli_two_process_tiny_always_on(tmp_path):
    """Always-on sibling of the slow kill/resume rehearsal (VERDICT r4 task
    5): the default suite must exercise a REAL 2-process ``train.py`` spawn —
    coordinator rendezvous, run-dir stamp broadcast, rank-sharded loaders,
    SyncBN + grad all-reduce across process boundaries — not only the
    in-process CPU-mesh stand-ins.  Kept cheap: 1 epoch, 8 images, no val
    (val_freq > epochs), tiny shapes; the full kill -9 + resume + 3-run
    equivalence matrix stays in the slow-marked test below."""
    cfg = _make_config(str(tmp_path / "data"), str(tmp_path / "logs"),
                       epochs=1)
    # no val epoch (val_freq > epochs) -> the epoch-1 save rides the
    # temp-checkpoint branch (epochN.ckpt only lands on val epochs,
    # trainer/base.py cadence == reference trainer/base.py:143-171)
    cfg.update(val_freq=99, save_freq=1, temp_save_freq=1)
    # 8 of the generated 16 images: one global batch per epoch
    lf = cfg["train_loader"]["dataset"]["list_file"]
    names = open(lf).read().split()[:8]
    open(lf, "w").write("\n".join(names) + "\n")
    cfg_path = str(tmp_path / "cfg.json")
    json.dump(cfg, open(cfg_path, "w"))

    _finish(_launch(cfg_path), timeout=900)
    run = _run_dir(str(tmp_path / "logs"))
    assert os.path.exists(os.path.join(run, "temp.ckpt"))
    log = open(os.path.join(run, "train.log")).read()
    assert "[EPOCH 1]" in log and "loss_sum" in log
    # both ranks wrote into ONE run dir (stamp broadcast worked): exactly one
    # run dir exists under log_dir
    assert len(glob.glob(os.path.join(str(tmp_path / "logs"),
                                      "cli2proc_*"))) == 1
    # the checkpoint is loadable and finite
    st = _load_params(os.path.join(run, "temp.ckpt"))
    assert np.isfinite(_flat(st["params"])).all()


@pytest.mark.slow
def test_full_cli_two_process_kill_resume(tmp_path):
    cfg = _make_config(str(tmp_path / "data"), str(tmp_path / "logsA"))
    cfg_path = str(tmp_path / "cfgA.json")
    json.dump(cfg, open(cfg_path, "w"))

    # ---- run A: uninterrupted 2-process CLI run --------------------------
    _finish(_launch(cfg_path))
    run_a = _run_dir(str(tmp_path / "logsA"))
    assert os.path.exists(os.path.join(run_a, "epoch2.ckpt"))
    assert os.path.exists(os.path.join(run_a, "epoch4.ckpt"))
    assert os.path.exists(os.path.join(run_a, "temp.ckpt"))  # epochs 1,3
    state_a = _load_params(os.path.join(run_a, "epoch4.ckpt"))

    # both processes agreed on ONE run dir (stamp broadcast) and the val
    # epochs scored real COCO stats from the merged shards
    log = open(os.path.join(run_a, "train.log")).read()
    assert log.count("[EPOCH 4]") >= 1
    # the val epochs scored real COCO stats from the merged shards: the
    # 12-stat SEGM line and the segm_AP monitor decision both logged
    assert "SEGM" in log and "Monitor" in log

    # ---- run B: kill BOTH processes mid-epoch-3, resume from epoch2 ------
    cfg_b = dict(cfg, log_dir=str(tmp_path / "logsB"))
    cfg_b_path = str(tmp_path / "cfgB.json")
    json.dump(cfg_b, open(cfg_b_path, "w"))
    procs = _launch(cfg_b_path)
    run_b = None
    deadline = time.time() + 1500
    try:
        while time.time() < deadline:
            dirs = glob.glob(os.path.join(str(tmp_path / "logsB"), "cli2proc_*"))
            if dirs:
                run_b = sorted(dirs)[-1]
                log_path = os.path.join(run_b, "train.log")
                if (os.path.exists(os.path.join(run_b, "epoch2.ckpt"))
                        and os.path.exists(log_path)
                        and "[EPOCH 3]" in open(log_path).read()):
                    break
            if any(p.poll() is not None for p in procs):
                outs = [p.communicate()[0] for p in procs]
                raise AssertionError(
                    "a process exited before the kill point:\n"
                    + "\n".join(o[-3000:] for o in outs))
            time.sleep(1.0)
        else:
            raise AssertionError("epoch2.ckpt / EPOCH 3 never appeared")
        for p in procs:  # kill -9 BOTH, mid-epoch
            p.send_signal(signal.SIGKILL)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
        for p in procs:
            p.communicate()

    # resume as a fresh 2-process job from the epoch-2 checkpoint
    _finish(_launch(cfg_b_path, resume=os.path.join(run_b, "epoch2.ckpt")))
    run_b2 = _run_dir(str(tmp_path / "logsB"))  # resume makes a new run dir
    state_b = _load_params(os.path.join(run_b2, "epoch4.ckpt"))

    # the resumed trajectory is BIT-IDENTICAL to the uninterrupted run
    np.testing.assert_array_equal(_flat(state_a["params"]),
                                  _flat(state_b["params"]))
    np.testing.assert_array_equal(_flat(state_a["batch_stats"]),
                                  _flat(state_b["batch_stats"]))
    np.testing.assert_array_equal(_flat(state_a["opt_state"]),
                                  _flat(state_b["opt_state"]))

    # ---- run C: single-process, same global batch schedule ---------------
    cfg_c = dict(cfg, log_dir=str(tmp_path / "logsC"))
    cfg_c_path = str(tmp_path / "cfgC.json")
    json.dump(cfg_c, open(cfg_c_path, "w"))
    _finish(_launch(cfg_c_path, n_procs=1))
    run_c = _run_dir(str(tmp_path / "logsC"))
    state_c = _load_params(os.path.join(run_c, "epoch4.ckpt"))

    # Equivalence standard (measured, not aspirational): the rank-strided
    # loader split gives every global batch the SAME sample set, only its
    # within-batch placement differs, so the first step's LOSS is equal to
    # fp-reduction noise (measured: identical to 7 digits).  Parameters are
    # NOT comparable at tight tolerance even after one step: ~1e-8 BN-stat
    # reduction noise flips discrete obj-ignore IoU threshold decisions in
    # the loss, a genuinely chaotic dependence (measured: 2e-4 one-step
    # param drift, 3e-2 @epoch2, 8e-2 @epoch4 — the reference's
    # nondeterministic CUDA atomics have the same property run-to-run).
    loss_a = _first_epoch_loss(os.path.join(run_a, "train.log"))
    loss_c = _first_epoch_loss(os.path.join(run_c, "train.log"))
    assert abs(loss_a - loss_c) / loss_a < 5e-3, (
        f"epoch-1 train loss diverged: {loss_a} vs {loss_c}")
    pa, pc = _flat(state_a["params"]), _flat(state_c["params"])
    denom = np.linalg.norm(pa) + 1e-12
    rel = np.linalg.norm(pa - pc) / denom
    assert rel < 0.3, f"1-proc vs 2-proc param drift {rel:.2e}"
