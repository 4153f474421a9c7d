"""Training / validation run loops (reference trainer/trainer.py).

Host loop responsibilities only: feed sharded batches, evaluate the LR schedule,
collect device-scalar logs asynchronously (fetched every ``writer_freq`` steps to
keep the dispatch pipeline full), NaN abort, tensorboard, COCO validation.

NaN semantics: the reference checks ``isfinite(loss)`` every batch, which forces
a device sync per step; here logs are drained every ``writer_freq`` steps, so a
NaN aborts within one logging window instead of one step — the async dispatch
pipeline stays full in exchange.  The jitted step itself carries an on-device
guard (train_state.py): a non-finite microbatch updates nothing (grads dropped,
optimizer skipped, BN stats held), so every step in the window after the NaN is
a harmless no-op-or-normal step and the state the abort leaves behind — and the
temp checkpoint ``-r`` resumes from — is always finite.  Use
utils.debug.enable_nan_debugging() to trap the exact op when hunting one down.
"""

import os
import sys

import jax
import numpy as np
from tqdm import tqdm

from ..eval.coco_eval import COCOMetrics
from ..eval.counter import EvalCounter
from ..parallel.mesh import shard_batch
from .base import BaseTrainer
from .train_state import make_eval_step, make_train_step


class Trainer(BaseTrainer):
    def __init__(self, model, loss, optimizer, lr_scheduler, config,
                 train_loader, val_loader, postprocess, mesh,
                 variables, resume=None, weights=None):
        super().__init__(config, resume, weights)
        self.model = model
        self.loss = loss
        self.optimizer = optimizer
        self.lr_scheduler = lr_scheduler
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.postprocess = postprocess
        self.mesh = mesh

        import jax.numpy as jnp

        dtype = jnp.bfloat16 if config.get("compute_dtype") == "bfloat16" else jnp.float32
        # 2-D (data, space) mesh => spatial training: the train batch gets
        # per-leaf placement (image rows sharded over space) and the step
        # adopts it; eval/val stays data-sharded (space axis replicated).
        self.spatial = mesh.devices.ndim == 2
        self.train_step, init_state = make_train_step(
            model, loss, optimizer, mesh,
            accumulate=self.accumulate, compute_dtype=dtype,
            follow_batch_sharding=self.spatial,
            remat=config.get("remat", False),
        )
        self.eval_step = make_eval_step(model, loss, mesh, dtype)
        self.state = init_state(variables)

        self.coco_metrics = None
        if val_loader is not None and config.get("val_gt_file"):
            self.coco_metrics = COCOMetrics(
                gt_file=config["val_gt_file"],
                cat2label=val_loader.dataset.CAT2LABEL,
                with_mask=getattr(val_loader.dataset, "with_mask", True),
                save_dir=self.checkpoint_dir,
            )
        self._restore_if_needed()

    # ------------------------------------------------------------- state mgmt

    def _checkpoint_state(self, epoch):
        return {
            "epoch": epoch,
            "params": self.state["params"],
            "batch_stats": self.state["batch_stats"],
            "opt_state": self.state["opt_state"],
            "monitor_best": self.monitor_best,
            "config": self.config,
        }

    def _load_state(self, ckpt, strict):
        # replicate_global: every rank read the same checkpoint file; in
        # multi-process runs the replicated global arrays are assembled from
        # those identical per-rank host values (no cross-host transfer).
        from ..parallel.mesh import replicate_global

        new_state = dict(self.state)
        new_state["params"] = replicate_global(ckpt["params"], self.mesh)
        new_state["batch_stats"] = replicate_global(
            ckpt["batch_stats"], self.mesh)
        if strict and "opt_state" in ckpt:
            new_state["opt_state"] = replicate_global(
                ckpt["opt_state"], self.mesh)
        self.state = new_state

    # ------------------------------------------------------------ train epoch

    def _train_epoch(self, epoch):
        self.logger.info("Train on epoch %d" % epoch)
        self.train_loader.set_epoch(epoch)

        counter = EvalCounter()
        n_iter = len(self.train_loader)
        iterator = enumerate(self.train_loader, 1)
        if self.device_rank == 0:
            iterator = tqdm(iterator, total=n_iter,
                            postfix={"lr": "-1.00e0", "loss": "-1.0000"})

        pending = []  # (step, device loss_log) awaiting host fetch

        def drain():
            for step_idx, log in pending:
                host = {k: float(v) for k, v in jax.device_get(log).items()}
                if host.get("skipped", 0) > 0 and np.isfinite(host["loss"]):
                    # finite loss but non-finite grads: the on-device guard
                    # dropped the update (train_state.py); surface it.
                    self.logger.warning(
                        f"non-finite gradients at batch {step_idx}: "
                        "update skipped by the NaN guard")
                if not np.isfinite(host["loss"]):
                    self.logger.error(
                        "Error: nan or inf found. Training stops at epoch "
                        f"{epoch} batch {step_idx}.")
                    for k, v in host.items():
                        self.logger.error(f"{k}: {v}")
                    sys.exit(1)
                counter.update("loss", host.pop("loss"))
                for k, v in host.items():
                    counter.update(k, v)
            pending.clear()

        for batch_idx, batch in iterator:
            step = (epoch - 1) * n_iter + batch_idx
            actual_step = step // self.accumulate
            lr = self.lr_scheduler(actual_step)
            do_step = (batch_idx % self.accumulate == 0) or (batch_idx == n_iter)
            if self.spatial:
                from ..parallel.spatial import shard_spatial_batch

                sharded = shard_spatial_batch(batch, self.mesh)
            else:
                sharded = shard_batch(batch, self.mesh)
            sharded.pop("info", None)
            self.state, loss_log = self.train_step(self.state, sharded, lr, do_step)
            pending.append((batch_idx, loss_log))

            if step % self.writer_freq == 0:
                drain()
                if self.device_rank == 0:
                    if self.tensorboard is not None:
                        self.tensorboard.add_scalar("lr", lr, actual_step)
                        self.tensorboard.add_scalar(
                            "train/loss", counter.average("loss"), actual_step)
                        for key in self.loss.loss_id:
                            self.tensorboard.add_scalar(
                                f"train/{key}", counter.average(key), actual_step)
                    if hasattr(iterator, "set_postfix"):
                        iterator.set_postfix({
                            "lr": "%.2e" % lr,
                            "loss": "%.4f" % counter.average("loss"),
                        })
                counter.reset()

            # NOTE: compares the raw microbatch counter, while the schedule
            # consumes step//accumulate — with accumulate>1 this stops after
            # max_iter/accumulate optimizer steps. Reference-parity quirk
            # (reference trainer.py:99-105 steps its scheduler only every
            # `accumulate` batches yet stops at raw step == max_iter); no
            # shipped config combines max_iter with accumulate>1.
            if hasattr(self.lr_scheduler, "max_iter") and \
                    step == getattr(self.lr_scheduler, "max_iter", None):
                drain()
                if self.device_rank == 0:
                    from .checkpoint import save_checkpoint

                    path = os.path.join(self.checkpoint_dir, f"batch_{step}.ckpt")
                    save_checkpoint(path, self._checkpoint_state(epoch))
                    self.logger.info(f"Saving checkpoint at {path}")
                sys.exit(0)

        drain()
        train_log = {}
        if self.device_rank == 0:
            train_log["train_loss"] = counter.average_epoch("loss")
            for key in self.loss.loss_id:
                train_log[f"train_{key}"] = counter.average_epoch(key)
        counter.reset_epoch()

        if self.val_loader is not None and epoch % self.val_freq == 0:
            train_log.update(self._val_epoch(epoch))
        return train_log

    # -------------------------------------------------------------- val epoch

    def _val_epoch(self, epoch):
        self.logger.info("Validate after epoch %d" % epoch)
        if self.coco_metrics is not None:
            self.coco_metrics.reset()
        counter = EvalCounter()
        n_iter = len(self.val_loader)
        iterator = enumerate(self.val_loader, 1)
        if self.device_rank == 0:
            iterator = tqdm(iterator, total=n_iter)

        for batch_idx, batch in iterator:
            info = batch.get("info")
            # Wrap-padded samples (loader pad_last) carry info['_pad']: weight
            # them 0 so val loss/metric counters match short-batch evaluation
            # exactly (the COCO path filters them separately).
            if info is not None:
                batch = dict(batch, sample_weight=np.asarray(
                    [0.0 if i.get("_pad") else 1.0 for i in info], np.float32))
            sharded = shard_batch(batch, self.mesh)
            sharded.pop("info", None)
            out, loss_log, metric_log = self.eval_step(
                self.state["params"], self.state["batch_stats"], sharded
            )
            host_loss = {k: float(v) for k, v in jax.device_get(loss_log).items()}
            counter.update("loss", host_loss.pop("loss"))
            for k, v in host_loss.items():
                counter.update(k, v)
            for k, v in jax.device_get(metric_log).items():
                counter.update(k, (float(v[0]), float(v[1])))
            if self.coco_metrics is not None and info is not None:
                dev_out = self.postprocess.apply_device(out)
                if jax.process_count() > 1:
                    # Global batch-sharded outputs: fetch only this process's
                    # rows (device_get would span non-addressable devices);
                    # their order matches the local loader batch, so pairing
                    # with the local ``info`` below is exact.
                    from ..parallel.mesh import local_shard

                    dev_out = local_shard(dev_out)
                detections = self.postprocess.to_host_list(dev_out)
                dets = self.coco_metrics.to_coco_format(info, detections)
                self.coco_metrics.update_results(dets)

        self._merge_coco_shards()
        val_log = {}
        if self.device_rank == 0:
            coco_log = self.coco_metrics.coco_eval() if self.coco_metrics else {}
            if self.tensorboard is not None:
                self.tensorboard.add_scalar("val/loss", counter.average("loss"), epoch)
                for key in self.loss.loss_id:
                    self.tensorboard.add_scalar(
                        f"val/{key}", counter.average(key), epoch)
                for key, value in coco_log.items():
                    self.tensorboard.add_scalar(f"val/{key}", value, epoch)
            val_log["val_loss"] = counter.average_epoch("loss")
            for key in self.loss.loss_id:
                val_log[f"val_{key}"] = counter.average_epoch(key)
            for key in self.loss.metric_id:
                val_log[f"val_{key}"] = counter.average_epoch(key)
            for key, value in coco_log.items():
                val_log[f"val_{key}"] = value
        counter.reset_epoch()
        return val_log

    def _merge_coco_shards(self):
        """Multi-host COCO result gathering (reference trainer.py:175-181): the
        val loader is rank-sharded, so each host holds 1/world of the
        detections; non-zero ranks dump their shard, rank 0 merges after a
        cross-host barrier.  Loss/metric counters need no merging — they are
        global device scalars already (GSPMD reductions span the whole mesh)."""
        from ..utils.envs import get_world_size

        if self.coco_metrics is None or get_world_size() < 2:
            return
        import os

        from jax.experimental import multihost_utils

        if self.device_rank != 0:
            self.coco_metrics.save_as_json(os.path.join(
                self.checkpoint_dir, f"_coco_shard_{self.device_rank}.json"))
        multihost_utils.sync_global_devices("coco_shards")
        if self.device_rank == 0:
            for r in range(1, get_world_size()):
                path = os.path.join(self.checkpoint_dir, f"_coco_shard_{r}.json")
                self.coco_metrics.update_from_json(path)
                os.remove(path)

    # ---------------------------------------------------------------- logging

    def _log_result(self, result):
        from tabulate import tabulate

        rows = []
        for loss_id in self.loss.loss_suffix:
            key = "train_{}_" + loss_id
            row = [loss_id]
            for scale_id in self.loss.scales_prefix:
                row.append(result.get(key.format(scale_id), ""))
            row.append(result.get(key.format("cross_scale"), ""))
            rows.append(row)
        table = tabulate(rows, headers=["TRAIN", *self.loss.scales_prefix, "ALL"],
                         floatfmt=".3f", tablefmt="pipe")
        self.logger.info("\n" + table)

        first_val = "val_{}_{}".format(self.loss.scales_prefix[0], self.loss.loss_suffix[0])
        if first_val in result:
            rows = []
            for item in list(self.loss.loss_suffix) + list(self.loss.metric_suffix):
                key = "val_{}_" + item
                row = [item]
                for scale_id in self.loss.scales_prefix:
                    row.append(result.get(key.format(scale_id), ""))
                row.append(result.get(key.format("cross_scale"), ""))
                rows.append(row)
            table = tabulate(rows, headers=["VAL", *self.loss.scales_prefix, "ALL"],
                             floatfmt=".3f", tablefmt="pipe")
            self.logger.info("\n" + table)
            if self.coco_metrics is not None and len(self.coco_metrics.bbox_eval_stats):
                self.logger.info("BBOX " + " ".join(
                    "%.3f" % k for k in self.coco_metrics.bbox_eval_stats))
                if self.coco_metrics.with_mask:
                    self.logger.info("SEGM " + " ".join(
                        "%.3f" % k for k in self.coco_metrics.segm_eval_stats))
