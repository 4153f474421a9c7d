import time
import numpy as np
import jax, jax.numpy as jnp

t0 = time.time()
def tick(m): print(f"[{time.time()-t0:6.1f}s] {m}", flush=True)

from orienmask_tpu.models import OrienMaskYOLOFPNPlus
from orienmask_tpu.ops.loss import OrienMaskYOLOMultiScaleLoss
from orienmask_tpu.optim import SGD
from orienmask_tpu.parallel.mesh import data_mesh, shard_batch
from orienmask_tpu.trainer.train_state import make_train_step
from orienmask_tpu.config.base import ANCHORS_YOLOV4, ANCHORS_MASK
from orienmask_tpu.ops.maskops import pack_bits

model = OrienMaskYOLOFPNPlus(num_anchors=3, num_classes=80)
variables = model.init_variables(jax.random.PRNGKey(0))
tick("init")
loss = OrienMaskYOLOMultiScaleLoss(
    grid_size=[[17,17],[34,34],[68,68]], image_size=[544,544],
    anchors=ANCHORS_YOLOV4, anchor_mask=ANCHORS_MASK, num_classes=80,
    obj_ignore_threshold=0.7, weight=[1,1,1,1,1,20,20], scales_weight=[1,1,1],
    target_chunk=8)
optimizer = SGD(lr=1e-3, momentum=0.9, weight_decay=5e-4)
mesh = data_mesh()

for B in (16, 32):
    try:
        key = jax.random.PRNGKey(1)
        k1, k2 = jax.random.split(key)
        batch = {
            "image": jax.random.normal(k1, (B,544,544,3), jnp.float32),
            "bbox": jnp.tile(jnp.asarray([[0.5,0.5,0.3,0.3]],jnp.float32),(100,1))[None].repeat(B,0),
            "cls": jnp.zeros((B,100), jnp.int32),
            "mask": pack_bits(jax.random.uniform(k2, (B,100,544,544)) < 0.2),
            "valid": jnp.tile(jnp.arange(100)[None,:] < 16, (B,1)),
        }
        jax.block_until_ready(batch)
        train_step, init_state = make_train_step(model, loss, optimizer, mesh,
                                                 image_w=544, compute_dtype=jnp.bfloat16)
        state = init_state(variables)
        state, logs = train_step(state, batch if False else shard_batch(batch, mesh), 1e-3, True)
        jax.block_until_ready(state["params"])
        tick(f"B={B} compiled, loss={float(logs['loss']):.1f}")
        sb = shard_batch(batch, mesh)
        t = time.time()
        for _ in range(8):
            state, logs = train_step(state, sb, 1e-3, True)
        jax.block_until_ready(state["params"])
        dt = (time.time()-t)/8
        print(f"train bf16 B={B}: {dt*1000:.1f} ms -> {B/dt:.1f} img/s", flush=True)
        del state, batch
    except Exception as e:
        print(f"B={B} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)
