"""End-to-end learning-loop validation: overfit 4 synthetic images, measure COCO AP.

Exercises targets -> loss -> gradients -> SGD -> decode -> NMS -> mask assembly ->
LiteCOCOeval jointly; no real COCO data is needed.  ~20 min on the 1-core CPU host.

Recorded results (800 steps, slim backbone @96x96):
    2026-08-16: OVERFIT bbox AP=0.889 segm AP=0.583 (6 dets over 6 GT)
    2026-08-18 (native-evaluator stack: om_rle_decode/om_coco_match):
                OVERFIT bbox AP=0.873 segm AP=0.645

Run:  python tools/overfit_validation.py
"""
import json, os, sys, time
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
from orienmask_tpu.utils.cache import enable_compile_cache
enable_compile_cache("/root/repo")
sys.path.insert(0, "/root/repo/tests")
import numpy as np
import jax.numpy as jnp

from orienmask_tpu.models.darknet import DarkNet53
DarkNet53.STAGE_BLOCKS = (1, 1, 1, 1, 1)

from orienmask_tpu.models import OrienMaskYOLOFPNPlus
from orienmask_tpu.ops.loss import OrienMaskYOLOMultiScaleLoss
from orienmask_tpu.ops.postprocess import OrienMaskYOLOPostProcess
from orienmask_tpu.optim import SGD
from orienmask_tpu.parallel.mesh import data_mesh, shard_batch
from orienmask_tpu.trainer.train_state import make_train_step
from orienmask_tpu.eval.lite_cocoeval import COCOGroundTruth, LiteCOCOeval
from orienmask_tpu.eval import rle

t0 = time.time()
def tick(m): print(f"[{time.time()-t0:6.1f}s] {m}", flush=True)

size = 96
B = 4
grids = [[size//32]*2, [size//16]*2, [size//8]*2]
anchors = [[4,6],[8,10],[12,8],[10,20],[20,16],[18,36],[36,28],[48,60],[60,50]]
amask = [[6,7,8],[3,4,5],[0,1,2]]
NC = 4

rng = np.random.default_rng(0)
images = rng.uniform(-1, 1, (B, size, size, 3)).astype(np.float32)
gt_bbox = np.zeros((B, 8, 4), np.float32)
gt_cls = np.zeros((B, 8), np.int32)
gt_mask = np.zeros((B, 8, size, size), bool)
gt_valid = np.zeros((B, 8), bool)
coco_images, coco_anns = [], []
aid = 1
for b in range(B):
    n = int(rng.integers(1, 3))
    for k in range(n):
        bw, bh = rng.uniform(0.3, 0.6), rng.uniform(0.3, 0.6)
        cx, cy = rng.uniform(bw/2, 1-bw/2), rng.uniform(bh/2, 1-bh/2)
        gt_bbox[b, k] = [cx, cy, bw, bh]
        c = int(rng.integers(0, NC))
        gt_cls[b, k] = c
        x1, y1 = int((cx-bw/2)*size), int((cy-bh/2)*size)
        x2, y2 = int((cx+bw/2)*size), int((cy+bh/2)*size)
        gt_mask[b, k, y1:y2, x1:x2] = True
        gt_valid[b, k] = True
        coco_anns.append({"id": aid, "image_id": b, "category_id": c+1,
                          "bbox": [x1, y1, x2-x1, y2-y1], "area": (x2-x1)*(y2-y1),
                          "iscrowd": 0,
                          "segmentation": [[x1, y1, x2, y1, x2, y2, x1, y2]]})
        aid += 1
    coco_images.append({"id": b, "height": size, "width": size})
gt = COCOGroundTruth({"images": coco_images,
                      "categories": [{"id": i+1} for i in range(NC)],
                      "annotations": coco_anns})

model = OrienMaskYOLOFPNPlus(num_anchors=3, num_classes=NC)
variables = model.init_variables(jax.random.PRNGKey(0))
loss = OrienMaskYOLOMultiScaleLoss(
    grid_size=grids, image_size=[size, size], anchors=anchors, anchor_mask=amask,
    num_classes=NC, obj_ignore_threshold=0.7, weight=[1,1,1,1,1,20,20],
    scales_weight=[1,1,1], target_chunk=4)
optimizer = SGD(lr=1e-3, momentum=0.9, weight_decay=0.0)
mesh = data_mesh(n_devices=1)
train_step, init_state = make_train_step(model, loss, optimizer, mesh, size)
state = init_state(variables)
batch = {"image": images, "bbox": gt_bbox, "cls": gt_cls, "mask": gt_mask,
         "valid": gt_valid}
sb = shard_batch(batch, mesh)
tick("setup")

steps = 800
for i in range(steps):
    lr = 1e-4 if i < 50 else 1e-3
    state, logs = train_step(state, sb, lr, True)
    if i % 100 == 0:
        tick(f"step {i} loss={float(logs['loss']):.2f}")
tick(f"final loss={float(logs['loss']):.2f}")

pp = OrienMaskYOLOPostProcess(
    grid_size=grids, image_size=[size, size], anchors=anchors, anchor_mask=amask,
    num_classes=NC, conf_thresh=0.05, nms=dict(threshold=0.5),
    nms_pre=50, nms_post=10, orien_thresh=0.3)
out, _ = model.forward({"params": state["params"], "batch_stats": state["batch_stats"]},
                       jnp.asarray(images))
dets = pp(out)
results_bbox, results_segm = [], []
for b, det in enumerate(dets):
    for bb, c in zip(det["bbox"], det["cls"]):
        x1 = (bb[0]-bb[2]/2)*size; y1 = (bb[1]-bb[3]/2)*size
        results_bbox.append({"image_id": b, "category_id": int(c)+1,
                             "bbox": [float(x1), float(y1), float(bb[2]*size), float(bb[3]*size)],
                             "score": float(bb[4])})
    for m, bb, c in zip(det["mask"], det["bbox"], det["cls"]):
        results_segm.append({"image_id": b, "category_id": int(c)+1,
                             "segmentation": rle.encode(m.astype(np.uint8)),
                             "score": float(bb[4])})
bbox_ap = LiteCOCOeval(gt, results_bbox, "bbox").summarize()[0]
segm_ap = LiteCOCOeval(gt, results_segm, "segm").summarize()[0]
print(f"OVERFIT bbox AP={bbox_ap:.3f} segm AP={segm_ap:.3f} "
      f"({len(results_bbox)} dets)", flush=True)
