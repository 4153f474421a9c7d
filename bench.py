"""Driver benchmark: end-to-end image->masks FPS at 544x544, batch=1, one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: 42.7 FPS (reference, RTX 2080Ti, README.md:5).
"""

import json
import time

import numpy as np


def main():
    import os

    import cv2
    import jax

    # Persistent compile cache: the axon relay occasionally serves multi-minute
    # compiles; caching keeps repeat bench runs inside the supervisor timeout.
    # Host-keyed: a stale cross-machine cache loads bad AOT code (utils/cache.py).
    from orienmask_tpu.utils.cache import enable_compile_cache

    enable_compile_cache(os.path.dirname(os.path.abspath(__file__)))

    from orienmask_tpu.config import (
        orienmask_yolo_coco_544_anchor4_fpn_plus_infer as cfg,
    )
    import orienmask_tpu.models as model_module
    from orienmask_tpu.pipeline import InferencePipeline
    from orienmask_tpu.trainer.builder import build, build_postprocess, build_transform

    import sys

    # Liveness signal for the supervisor: backend init is the step that
    # wedges; everything after (compile) is slow but alive.
    jax.devices()
    print("bench: backend live", file=sys.stderr, flush=True)

    model_cfg = dict(cfg["model"])
    model_cfg["pretrained"] = None
    model = build(model_cfg, model_module)
    variables = model.init_variables(jax.random.PRNGKey(0))
    # ORIENMASK_BENCH_WEIGHTS=<ckpt>: bench with TRAINED weights — real
    # detection counts through the NMS fixpoint + mask assembly instead of
    # random-weight score collapse (VERDICT r2 task 8). Default stays random
    # (weight-independent conv cost) so the driver needs no checkpoint.
    wpath = os.environ.get("ORIENMASK_BENCH_WEIGHTS")
    if wpath:
        from orienmask_tpu.trainer.checkpoint import load_checkpoint

        state = load_checkpoint(wpath, model)
        variables = {"params": state["params"],
                     "batch_stats": state["batch_stats"]}
        print(f"bench: loaded weights from {wpath}", file=sys.stderr, flush=True)
    transform = build_transform(cfg["transform"])
    postprocess = build_postprocess(cfg["postprocess"], pack_masks=True)
    pipeline = InferencePipeline(
        model, variables, transform, postprocess,
        compute_dtype=cfg.get("compute_dtype", "bfloat16"),
    )

    try:
        img = cv2.cvtColor(
            cv2.imread("/root/reference/assets/000000163126.jpg"), cv2.COLOR_BGR2RGB
        )
    except Exception:
        img = np.random.default_rng(0).integers(0, 255, (480, 640, 3), np.uint8)
    image = np.ascontiguousarray(img, np.uint8)[None]

    # ORIENMASK_BENCH_INT8=1: post-training int8 conv path (models/quantize.py)
    # calibrated on the bench image (throughput is calibration-independent;
    # accuracy A/B lives in tools/validate_int8.py).  With the knob set the
    # run measures int8 AND THEN bf16 in the same process, printing one JSON
    # line per variant (int8 first) so a driver that sets the knob tracks
    # both paths in one BENCH record (VERDICT r4 task 7); without it the
    # driver contract is unchanged (single bf16 line).
    int8 = bool(os.environ.get("ORIENMASK_BENCH_INT8"))
    if int8:
        pipeline.quantize_int8(image)
        print("bench: int8 quantized", file=sys.stderr, flush=True)

    # Methodology = reference parity: the 42.7 FPS headline times
    # 'Forward & Postprocess' with the image already device-resident and
    # masks staying on-device (CUDA events, infer.py:155-156 + timer.py).
    # Here: device-staged input, full fused program (resize+normalize+forward+
    # decode+NMS+mask assembly+bit-pack) per frame, outputs device-resident,
    # one sync for the whole run (per-call syncs through this environment's
    # remote relay cost ~25ms of pure tunnel overhead).
    import jax.numpy as jnp

    from orienmask_tpu.utils.profiler import trace

    def measure(pipe, suffix, ceiling_mult):
        # compile + warmup
        for _ in range(10):
            out = pipe.run_device(image)
        jax.block_until_ready(out["mask"])
        dev_image = jnp.asarray(image)
        # Median of several windows: device op time is stable run-to-run
        # (profiler sums agree to <1%), but host dispatch through the relay
        # adds multi-% jitter to any single window.
        n = 200
        rates = []
        with trace(os.environ.get("ORIENMASK_PROFILE_DIR") if not suffix
                   else None):
            for _ in range(5):
                start = time.perf_counter()
                outs = [pipe.run_device(dev_image) for _ in range(n)]
                jax.block_until_ready(outs)
                rates.append(n / (time.perf_counter() - start))
        # Physical sanity floor (relay hazard: after kill -9 of a wedged
        # client, block_until_ready can return early and a window reports
        # impossible rates). The 544^2 forward alone is 193.6 GFLOP/frame
        # (tools/flops.py, analytic conv count == XLA cost analysis) -> at
        # the v5e's 197 TF/s bf16 peak nothing real beats ~0.98 ms/frame.
        # bf16 ceiling ~1017 FPS; int8 conv (394 TOP/s MXU path) doubles it.
        ceiling_fps = (197e12 / 193.6e9) * ceiling_mult
        real = [r for r in rates if r <= ceiling_fps]
        dropped = len(rates) - len(real)
        if dropped:
            print(f"bench: dropped {dropped} window(s) beating the "
                  f"{ceiling_fps:.0f} FPS conv-FLOP ceiling (relay artifact)",
                  file=sys.stderr, flush=True)
        assert real, "every window beat the physical FLOP ceiling - relay broken"
        fps = sorted(real)[len(real) // 2]
        # prove the host path works end-to-end (outside the timed region)
        np.asarray(outs[-1]["mask"])
        np.asarray(outs[-1]["bbox"])

        print(json.dumps({
            "metric": "e2e_fps_544_bs1" + suffix,
            "value": round(fps, 2),
            "unit": "images/s",
            "vs_baseline": round(fps / 42.7, 3),
            # in-process window envelope; cross-process envelope:
            # tools/bench_envelope.py
            "window_min": round(min(real), 2),
            "window_max": round(max(real), 2),
            "n_windows": len(real),
        }), flush=True)

    if int8:
        measure(pipeline, "_int8", 2.0)
        # fresh bf16 pipeline (quantize_int8 swapped this one's programs):
        # the knob means "report BOTH paths", int8 line first for tools that
        # read the knob's historical single-line contract
        pipeline = InferencePipeline(
            model, variables, transform, postprocess,
            compute_dtype=cfg.get("compute_dtype", "bfloat16"),
        )
        measure(pipeline, "", 1.0)
    else:
        measure(pipeline, "", 1.0)


def _supervised():
    """Run main() in a child process with a first-progress watchdog + retry.

    The axon TPU relay occasionally wedges a fresh client at backend init
    (0% CPU forever, no output); a healthy child prints "backend live" to
    stderr within seconds. So: no liveness line within `wedge_timeout` =>
    kill and retry cheaply; once live, allow the full budget (remote
    compiles can take minutes on a cold cache).
    """
    import os
    import subprocess
    import sys
    import threading
    import time

    wedge_timeout = 180.0
    # the int8 knob measures two variants in one child — double the budget
    full_timeout = 900.0 if os.environ.get("ORIENMASK_BENCH_INT8") else 480.0
    n_attempts = 6
    for attempt in range(n_attempts):
        env = dict(os.environ, ORIENMASK_BENCH_CHILD="1")
        proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        live = threading.Event()
        err_tail = []

        def _drain(stream=proc.stderr, live=live, tail=err_tail):
            for line in stream:
                tail.append(line)
                del tail[:-40]
                if "backend live" in line:
                    live.set()

        t = threading.Thread(target=_drain, daemon=True)
        t.start()
        start = time.monotonic()
        result = None
        while True:
            rc = proc.poll()
            elapsed = time.monotonic() - start
            if rc is not None:
                result = proc.stdout.read()
                break
            if (not live.is_set() and elapsed > wedge_timeout) \
                    or elapsed > full_timeout:
                proc.kill()
                proc.wait()
                # salvage: a child can print its result then wedge at
                # teardown (the same relay wedge class) — don't discard it
                result = proc.stdout.read()
                break
            time.sleep(1.0)
        if result:
            # forward EVERY JSON line (the int8 knob makes the child emit two
            # variants; the last line stays the bf16 headline either way)
            json_lines = [l for l in result.splitlines() if l.startswith("{")]
            if json_lines:
                for line in json_lines:
                    print(line)
                return
        if attempt == n_attempts - 1:
            sys.stderr.write("".join(err_tail[-20:]))
        # Two distinct relay failure modes: a wedge (caught above by the
        # watchdog after wedge_timeout) and a FAST register() failure at
        # interpreter boot ("axon not in the list of known backends", exits
        # in seconds). Fast failures are transient — a later boot can
        # succeed while earlier ones fail — so back off instead of burning
        # all attempts inside one bad window.
        if time.monotonic() - start < wedge_timeout:
            time.sleep(30.0)
    raise SystemExit(f"bench: no result after {n_attempts} supervised attempts")


if __name__ == "__main__":
    import os

    if os.environ.get("ORIENMASK_BENCH_CHILD"):
        main()
    else:
        _supervised()
