"""Per-stage timing breakdown of the 544x544 bs=1 inference path on chip.

Times each subprogram with the pipelined methodology bench.py uses (device-
resident I/O, N submissions, one sync): folded forward alone, detection
(decode+selection+NMS) alone, mask assembly alone, full fused pipeline.
Identifies where the remaining frame time goes.

Run:  python tools/bench_breakdown.py [N]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200
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
    transform = build_transform(cfg["transform"])
    pp = build_postprocess(cfg["postprocess"], pack_masks=True)
    pipe = InferencePipeline(model, variables, transform, pp,
                            compute_dtype=cfg.get("compute_dtype", "bfloat16"))
    tick(f"devices: {jax.devices()}")

    img = cv2.cvtColor(cv2.imread("/root/reference/assets/000000163126.jpg"),
                       cv2.COLOR_BGR2RGB)
    image_u8 = jnp.asarray(np.ascontiguousarray(img, np.uint8)[None])
    x544 = jnp.asarray(
        cv2.resize(img, (544, 544)).astype(np.float32)[None] / 255.0)

    ctx = default_ctx(train=False, dtype=jnp.bfloat16)
    folded = pipe.folded

    fwd = jax.jit(lambda f, xx: model.apply_folded(f, xx, ctx))
    t_fwd = timed("folded forward (bf16)", fwd, folded, x544)

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


if __name__ == "__main__":
    main()
