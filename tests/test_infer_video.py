"""CLI test for the streaming --video infer mode (VERDICT r1 item 10).

Runs ``infer.py --video <frames_dir>`` end-to-end in a subprocess on a tiny
160x160 config with random weights: the double-buffered StreamingPipeline
must process every frame, emit visualized outputs, and report FPS.
Reference analogue: the infer.py -d image-loop (reference infer.py:144-172).
"""

import json
import os
import subprocess
import sys

import cv2
import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

SIZE = 160


def _tiny_config():
    return {
        "n_device": 1,
        "compute_dtype": "float32",
        "stream_depth": 2,
        "model": {
            "type": "OrienMaskYOLOFPNPlus",
            "num_anchors": 3,
            "num_classes": 80,
            "pretrained": None,
            "freeze_backbone": False,
            "backbone_batchnorm_eval": False,
        },
        "transform": {
            "type": "FastCOCOTransform",
            "pipeline": [
                {"type": "Resize", "size": (SIZE, SIZE),
                 "interpolation": "bilinear", "align_corners": False},
                {"type": "Normalize", "mean": (0, 0, 0), "std": (255, 255, 255)},
            ],
        },
        "postprocess": {
            "type": "OrienMaskYOLOPostProcess",
            "grid_size": [[SIZE // 32] * 2, [SIZE // 16] * 2, [SIZE // 8] * 2],
            "image_size": [SIZE, SIZE],
            "anchors": [[12, 16], [19, 36], [40, 28], [36, 75], [76, 55],
                        [72, 146], [142, 110], [192, 243], [459, 401]],
            "anchor_mask": [[6, 7, 8], [3, 4, 5], [0, 1, 2]],
            "num_classes": 80,
            "conf_thresh": 0.05,
            "nms": {"type": "batched_nms", "threshold": 0.5},
            "nms_pre": 100,
            "nms_post": 20,
            "orien_thresh": 0.3,
        },
        "visualizer": {
            "type": "InferenceVisualizer",
            "dataset": "COCO",
            "with_mask": True,
            "conf_thresh": 0.3,
            "alpha": 0.6,
            "line_thickness": 1,
        },
    }


def test_infer_video_streaming_cli(tmp_path):
    frames = tmp_path / "frames"
    frames.mkdir()
    rng = np.random.default_rng(0)
    n_frames = 4
    for i in range(n_frames):
        img = rng.integers(0, 255, (120, 180, 3), np.uint8)
        cv2.imwrite(str(frames / f"f{i:03d}.jpg"), img)

    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(_tiny_config()))
    outdir = tmp_path / "out"

    from orienmask_tpu.utils.envs import cpu_subprocess_env

    env = cpu_subprocess_env()

    proc = subprocess.run(
        [sys.executable, "infer.py", "-c", str(cfg_path), "--video",
         str(frames), "--random-weights", "-v", "-o", str(outdir)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    assert f"Streamed {n_frames} frames" in proc.stdout
    assert "fps)" in proc.stdout
    outs = sorted(os.listdir(outdir))
    assert len(outs) == n_frames, outs
    first = cv2.imread(str(outdir / outs[0]))
    assert first is not None and first.shape == (120, 180, 3)


def test_infer_video_output_implies_visualize(tmp_path):
    """--video with -o but without -v must still produce rendered frames
    (previously it silently wrote nothing)."""
    frames = tmp_path / "frames"
    frames.mkdir()
    rng = np.random.default_rng(1)
    for i in range(2):
        img = rng.integers(0, 255, (120, 180, 3), np.uint8)
        cv2.imwrite(str(frames / f"f{i:03d}.jpg"), img)

    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(_tiny_config()))
    outdir = tmp_path / "out"

    from orienmask_tpu.utils.envs import cpu_subprocess_env

    proc = subprocess.run(
        [sys.executable, "infer.py", "-c", str(cfg_path), "--video",
         str(frames), "--random-weights", "-o", str(outdir)],
        cwd=REPO, env=cpu_subprocess_env(), capture_output=True, text=True,
        timeout=900,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    assert "implies --visualize" in proc.stdout
    assert len(os.listdir(outdir)) == 2


def test_infer_image_dir_skips_non_images(tmp_path):
    """-d on a directory with stray non-image entries (annotation json,
    subdir) must process only the images instead of crashing in cv2."""
    imgdir = tmp_path / "imgs"
    imgdir.mkdir()
    rng = np.random.default_rng(2)
    for i in range(2):
        img = rng.integers(0, 255, (120, 180, 3), np.uint8)
        cv2.imwrite(str(imgdir / f"im{i}.jpg"), img)
    (imgdir / "annotations.json").write_text("{}")
    (imgdir / "subdir").mkdir()

    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(_tiny_config()))
    outdir = tmp_path / "out"

    from orienmask_tpu.utils.envs import cpu_subprocess_env

    proc = subprocess.run(
        [sys.executable, "infer.py", "-c", str(cfg_path), "-d", str(imgdir),
         "--random-weights", "-v", "-o", str(outdir)],
        cwd=REPO, env=cpu_subprocess_env(), capture_output=True, text=True,
        timeout=900,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    outs = sorted(os.listdir(outdir))
    assert outs == ["im0.jpg", "im1.jpg"], outs
