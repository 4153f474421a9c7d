"""Base trainer: run directory, logging, epoch loop, checkpoint/resume
(reference trainer/base.py).

Differences are TPU-native only: model/optimizer state are jax pytrees (see
trainer/checkpoint.py), and there are no dist.barrier call sites — cross-device
work happens inside compiled steps.
"""

import datetime
import json
import logging
import math
import os

import jax

from ..utils.envs import get_device_rank, get_world_size
from .checkpoint import CheckpointManager, load_checkpoint, save_checkpoint


class BaseTrainer:
    def __init__(self, config, resume=None, weights=None):
        self.config = config
        self.device_rank = get_device_rank()

        if resume is not None:
            self.checkpoint_dir = os.path.dirname(resume)
        else:
            stamp = datetime.datetime.now().strftime("%m%d_%H%M%S")
            if get_world_size() > 1:
                # Every rank must derive the SAME run dir: a second-boundary
                # race in per-process timestamps would point ranks at
                # directories rank 0 never created. Broadcast rank 0's stamp.
                from ..utils.envs import broadcast_str

                stamp = broadcast_str(stamp)
            self.checkpoint_dir = os.path.join(
                config["log_dir"], config["name"] + "_" + stamp
            )
            if self.device_rank == 0:
                os.makedirs(self.checkpoint_dir, exist_ok=True)
                with open(os.path.join(self.checkpoint_dir, "config.json"), "w") as fh:
                    json.dump(config, fh, indent=4)
            if get_world_size() > 1:
                # wait for rank 0's run dir (shared FS) before anyone logs into
                # it — the reference's dist.barrier at trainer/base.py:50
                from jax.experimental import multihost_utils

                multihost_utils.sync_global_devices("run_dir")

        logging.basicConfig(
            level=logging.INFO if self.device_rank == 0 else logging.ERROR,
            format="%(asctime)s %(message)s",
            handlers=[
                logging.FileHandler(os.path.join(self.checkpoint_dir, "train.log")),
                logging.StreamHandler(),
            ],
            force=True,
        )
        self.logger = logging.getLogger(self.__class__.__name__)

        self.accumulate = config.get("accumulate", 1)
        self.epochs = config["epochs"]
        self.val_freq = config.get("val_freq", 1)
        self.save_freq = config.get("save_freq", 1)
        self.temp_save_freq = config.get("temp_save_freq", 1)
        self.monitor = "val_" + config["monitor"]
        self.monitor_mode = config["monitor_mode"]
        assert self.monitor_mode in ("min", "max", "off")
        self.monitor_best = math.inf if self.monitor_mode == "min" else -math.inf
        self.start_epoch = 1
        self.writer_freq = config.get("log_freq", 50) * self.accumulate

        try:
            from tensorboardX import SummaryWriter
            self.tensorboard = SummaryWriter(self.checkpoint_dir)
        except Exception:
            self.tensorboard = None

        self.ckpt_manager = CheckpointManager(
            self.checkpoint_dir, self.save_freq, self.logger,
            # async_checkpoint: fetch+serialize state in a worker thread while
            # the next epoch trains (checkpoint.py module doc). Default off =
            # reference-parity synchronous saving.
            async_save=config.get("async_checkpoint", False),
        )
        self._resume_path = resume
        self._weights_path = weights

    # subclasses call after building model/optimizer state
    def _restore_if_needed(self):
        if self._resume_path is not None:
            self._resume_checkpoint(self._resume_path)
        elif self._weights_path is not None:
            self._set_weights(self._weights_path)

    def train(self):
        for epoch in range(self.start_epoch, self.epochs + 1):
            self.logger.info("\n" + "-" * 68)
            self.logger.info("[EPOCH %d]" % epoch)
            start = datetime.datetime.now()
            result = self._train_epoch(epoch)
            self.logger.info(
                "Finish at {}, Runtime: {}".format(
                    datetime.datetime.now(), datetime.datetime.now() - start
                )
            )
            if self.device_rank == 0:
                self._log_result(result)
            if epoch % self.val_freq == 0 and self.device_rank == 0:
                best = False
                if self.monitor_mode != "off":
                    assert self.monitor in result, \
                        f"Can't recognize monitor item named {self.monitor}"
                    value = result[self.monitor]
                    improved = (value < self.monitor_best
                                if self.monitor_mode == "min"
                                else value > self.monitor_best)
                    if improved:
                        self.logger.info("Monitor is improved from %f to %f"
                                         % (self.monitor_best, value))
                        self.monitor_best = value
                        best = True
                    else:
                        self.logger.info("Monitor is not improved from %f"
                                         % self.monitor_best)
                self.ckpt_manager.save(epoch, self._checkpoint_state(epoch), save_best=best)
            elif self.device_rank == 0 and epoch % self.temp_save_freq == 0:
                # Failure-recovery temp checkpoint. Cadence is configurable
                # (``temp_save_freq``, default 1 = every non-val epoch like the
                # reference's per-epoch saving): pulling ~500MB of state
                # through a slow host link each epoch can dominate short
                # epochs, and a coarser cadence only widens the resume window.
                self.ckpt_manager.save(epoch, self._checkpoint_state(epoch), temp=True)
        self.ckpt_manager.wait()  # drain any in-flight async save
        if jax.process_count() > 1:
            # Leave train() together: rank 0 trails the others by a full
            # COCO-scoring + checkpoint tail each epoch, and an early exit
            # by any rank turns that skew into a coordination-service
            # shutdown-barrier kill of the whole job.
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices("orienmask:train_end")

    def _train_epoch(self, epoch):
        raise NotImplementedError

    def _checkpoint_state(self, epoch):
        raise NotImplementedError

    def _log_result(self, result):
        for k, v in result.items():
            self.logger.info(f"{k}: {v}")

    def _resume_checkpoint(self, path):
        self.logger.info(f"Loading checkpoint: {path}")
        ckpt = load_checkpoint(path, getattr(self, "model", None))
        self.start_epoch = ckpt.get("epoch", 0) + 1
        self.monitor_best = ckpt.get("monitor_best", self.monitor_best)
        if "config" in ckpt:
            for key in ("model", "optimizer", "lr_scheduler"):
                assert ckpt["config"].get(key) == self.config.get(key), \
                    f"{key} configuration differs from the checkpoint's"
        self._load_state(ckpt, strict=True)
        self.logger.info(f"Checkpoint '{path}' (epoch {self.start_epoch - 1}) loaded")

    def _set_weights(self, path):
        self.logger.info(f"Loading weights: {path}")
        ckpt = load_checkpoint(path, getattr(self, "model", None))
        self._load_state(ckpt, strict=False)

    def _load_state(self, ckpt, strict):
        raise NotImplementedError
