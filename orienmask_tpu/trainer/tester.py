"""COCO test loop with per-stage timing (reference trainer/tester.py)."""

import itertools

import jax
from tabulate import tabulate
from tqdm import tqdm

from ..eval.coco_eval import COCOMetrics
from ..utils import timer


class Tester:
    def __init__(self, model, variables, postprocess, test_loader, checkpoint_dir,
                 gt_file, compute_dtype="float32", mesh=None):
        """``mesh``: optional data mesh — shards each eval batch over the
        devices (the loader's ``pad_last`` keeps batch shapes static, so the
        split is always even when ``batch_size %% n_devices == 0``). The
        reference restricts test.py to one GPU (reference test.py:23); here
        multi-chip evaluation is a config knob (``n_device``)."""
        import jax.numpy as jnp

        self.model = model
        self.variables = variables
        self.postprocess = postprocess
        self.test_loader = test_loader
        self.checkpoint_dir = checkpoint_dir
        self.gt_file = gt_file
        self.dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
        self.coco_metrics = COCOMetrics(
            gt_file=gt_file,
            cat2label=test_loader.dataset.CAT2LABEL,
            with_mask=getattr(test_loader.dataset, "with_mask", True),
            save_dir=checkpoint_dir,
        )
        folded = model.fold(variables)
        from ..models.layers import default_ctx
        from .train_state import _image_f32

        self._batch_sharding = None
        fwd = lambda f, im: model.apply_folded(  # noqa: E731
            f, _image_f32(im), default_ctx(dtype=self.dtype))
        # _image_f32: accept uint8-transported loader batches like the
        # train/eval steps do (no-op for float images).
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.mesh import batch_sharding

            n = len(mesh.devices.flatten())
            assert test_loader.batch_size % n == 0, (
                f"test batch_size={test_loader.batch_size} not divisible by "
                f"{n} devices")
            self._batch_sharding = batch_sharding(mesh)
            rep = NamedSharding(mesh, P())
            from ..parallel.mesh import replicate_global

            folded = replicate_global(folded, mesh)
            self._fwd = jax.jit(fwd, in_shardings=(rep, self._batch_sharding))
        else:
            self._fwd = jax.jit(fwd)
        self._folded = folded

    def test(self):
        timer.reset()
        n_iter = len(self.test_loader)
        for batch in tqdm(self.test_loader, total=n_iter):
            image = jax.device_put(batch["image"], self._batch_sharding)
            info = batch.get("info")

            with timer.timer("Network Forward") as t:
                predict = self._fwd(self._folded, image)
                t.sync(predict)

            with timer.timer("Postprocess") as t:
                device_out = self.postprocess.apply_device(predict)
                t.sync(device_out)

            with timer.timer("Convert Format"):
                detections = self.postprocess.to_host_list(device_out)
                dets = self.coco_metrics.to_coco_format(info, detections)

            self.coco_metrics.update_results(dets)

        self.coco_metrics.coco_eval(per_cats=True)
        self.display_coco_eval("bbox")
        if self.coco_metrics.with_mask:
            self.display_coco_eval("segm")

        timer_log = timer.get_all_elapsed_time()
        bs = self.test_loader.batch_size
        print("\n" + "-" * 68)
        print(f"Speed Statistics (batch size = {bs})")
        for key, value in timer_log.items():
            print("%s: %.3fms (%.3ffps)" % (key, value / bs, 1000 * bs / value))

    def display_coco_eval(self, eval_type="bbox"):
        if eval_type == "bbox":
            stats = self.coco_metrics.bbox_eval_stats
            per_cats = self.coco_metrics.bbox_eval_per_cats_stats
        else:
            stats = self.coco_metrics.segm_eval_stats
            per_cats = self.coco_metrics.segm_eval_per_cats_stats

        table = tabulate(
            [list(stats)], tablefmt="pipe", floatfmt=".3f",
            headers=["AP", "AP50", "AP75", "APS", "APM", "APL",
                     "AR1", "AR10", "AR100", "ARS", "ARM", "ARL"],
            numalign="left",
        )
        print(f"\nCOCO eval {eval_type}: \n" + table)

        pairs = list(zip(self.test_loader.dataset.CLASSES, per_cats))
        if pairs:
            n_cols = min(6, len(pairs) * 2)
            flat = list(itertools.chain(*pairs))
            rows = itertools.zip_longest(*[flat[i::n_cols] for i in range(n_cols)])
            table = tabulate(rows, tablefmt="pipe", floatfmt=".3f",
                             headers=["category", "AP"] * (n_cols // 2), numalign="left")
            print(f"\nPer-category {eval_type} AP: \n" + table)
