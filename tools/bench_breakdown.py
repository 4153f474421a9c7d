"""Per-stage timing breakdown of the bs=1 inference path on chip.

Times each subprogram with the pipelined methodology bench.py uses (device-
resident I/O, N submissions, one sync): folded forward alone, detection
(decode+selection+NMS) alone, mask assembly alone, full fused pipeline.
Identifies where the remaining frame time goes.

--size S (default 544, /32-divisible) rebuilds the transform/postprocess at
that resolution the same way the 736 streaming config does (grid = S/32,
S/16, S/8; anchors stay in input pixels, config/base.py:237-250) — used to
anchor tools/spatial_cost_model.py at large resolutions (1088).

Run:  python tools/bench_breakdown.py [N] [--size 1088]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

_ap = argparse.ArgumentParser()
_ap.add_argument("n", nargs="?", type=int, default=200)
_ap.add_argument("--size", type=int, default=544)
_ap.add_argument("--int8", action="store_true",
                 help="quantize the pipeline first (models/quantize.py) and "
                      "break down the int8 frame")
_ap.add_argument("--spatial-tail", action="store_true",
                 help="also time parallel/spatial.run_batch_spatial on a "
                      "1-wide space mesh (the row-sharded tail program's "
                      "degenerate single-chip case) — pins the spatial cost "
                      "model's tail inputs to measured values (VERDICT r4 "
                      "task 6)")
_args = _ap.parse_args()
N, SIZE = _args.n, _args.size
assert SIZE % 32 == 0, "input size must be /32-divisible (model contract)"
t0 = time.time()


def tick(m):
    print(f"[{time.time()-t0:6.1f}s] {m}", flush=True)


def timed(name, fn, *args):
    outs = [fn(*args) for _ in range(10)]  # warmup/compile
    jax.block_until_ready(outs)
    start = time.perf_counter()
    outs = [fn(*args) for _ in range(N)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - start) / N
    tick(f"{name:40s} {dt*1e3:7.3f} ms  ({1/dt:7.1f}/s)")
    return dt


def main():
    import cv2

    from orienmask_tpu.config import (
        orienmask_yolo_coco_544_anchor4_fpn_plus_infer as cfg,
    )
    import orienmask_tpu.models as mm
    from orienmask_tpu.models.layers import default_ctx
    from orienmask_tpu.pipeline import InferencePipeline
    from orienmask_tpu.trainer.builder import build, build_postprocess, \
        build_transform

    mc = dict(cfg["model"])
    mc["pretrained"] = None
    model = build(mc, mm)
    variables = model.init_variables(jax.random.PRNGKey(0))
    tf_cfg, pp_cfg = cfg["transform"], cfg["postprocess"]
    if SIZE != 544:
        import copy
        tf_cfg, pp_cfg = copy.deepcopy(tf_cfg), copy.deepcopy(pp_cfg)
        tf_cfg["pipeline"][0]["size"] = [SIZE, SIZE]
        pp_cfg["image_size"] = [SIZE, SIZE]
        pp_cfg["grid_size"] = [[SIZE // s, SIZE // s] for s in (32, 16, 8)]
    transform = build_transform(tf_cfg)
    pp = build_postprocess(pp_cfg, pack_masks=True)
    pipe = InferencePipeline(model, variables, transform, pp,
                            compute_dtype=cfg.get("compute_dtype", "bfloat16"))
    tick(f"devices: {jax.devices()}")

    img = cv2.cvtColor(cv2.imread("/root/reference/assets/000000163126.jpg"),
                       cv2.COLOR_BGR2RGB)
    image_u8 = jnp.asarray(np.ascontiguousarray(img, np.uint8)[None])
    x544 = jnp.asarray(
        cv2.resize(img, (SIZE, SIZE)).astype(np.float32)[None] / 255.0)

    ctx = default_ctx(train=False, dtype=jnp.bfloat16)
    if _args.int8:
        pipe.quantize_int8(np.ascontiguousarray(img, np.uint8)[None])
        tick("int8-quantized (calibrated on the bench image)")
    folded = pipe.folded

    fwd = jax.jit(lambda f, xx: model.apply_folded(f, xx, ctx))
    t_fwd = timed("folded forward (%s)" % ("int8" if _args.int8 else "bf16"),
                  fwd, folded, x544)

    detect = jax.jit(lambda pred: jax.vmap(pp._detect_image)(
        [p[0] for p in pred]))
    pred = jax.block_until_ready(fwd(folded, x544))
    t_det = timed("decode+topk+NMS (detect only)", detect, pred)

    full_pp = jax.jit(pp._run_batch)
    t_pp = timed("full postprocess (incl masks)", full_pp, pred)

    t_all = timed("fused pipeline (resize..masks)", pipe.run_device, image_u8)

    tick(f"sum fwd+pp = {(t_fwd+t_pp)*1e3:.3f} ms vs fused {t_all*1e3:.3f} ms")
    tick(f"mask assembly ~= {(t_pp-t_det)*1e3:.3f} ms; "
         f"detect-only ~= {t_det*1e3:.3f} ms")

    if _args.spatial_tail:
        # The row-sharded tail program (upsample + rasterize under shard_map)
        # on a 1-wide space axis: semantically identical to _run_batch's tail
        # (tests/test_spatial.py), so its single-chip stage time is the
        # [measured] anchor the S>1 projections scale from.
        import functools

        from orienmask_tpu.parallel.spatial import (run_batch_spatial,
                                                    spatial_mesh)

        mesh1 = spatial_mesh(1)
        sp_tail = jax.jit(functools.partial(run_batch_spatial, pp, mesh1))
        t_sp = timed("spatial tail S=1 (detect + sharded masks)", sp_tail, pred)
        tick(f"spatial-tail masks ~= {(t_sp-t_det)*1e3:.3f} ms "
             f"(replicated-tail masks {(t_pp-t_det)*1e3:.3f} ms)")


if __name__ == "__main__":
    main()
