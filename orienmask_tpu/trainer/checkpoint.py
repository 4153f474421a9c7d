"""Checkpoint save/restore (reference trainer/base.py:143-204 semantics).

Full training state ``{epoch, params, batch_stats, opt_state, monitor_best,
config}`` is serialized as a pickle of host numpy pytrees.  Cadence and naming
mirror the reference: ``epochN.ckpt`` every ``save_freq`` epochs,
``best_epochN.ckpt`` + ``best_model.ckpt`` symlink on monitor improvement (stale
best deleted), ``temp.ckpt`` on non-val epochs.  The embedded config is
load-bearing: test/infer rebuild the exact model from it.

Also loads reference ``.pth`` checkpoints transparently (torch format -> converted
weights), so published OrienMask weights drop in without retraining.

Async mode (``async_checkpoint: true`` in the train config): the device->host
state fetch is the slow part — ~500 MB of params+momentum+BN stats, measured
~50 s/epoch through the axon relay (docs/PERFORMANCE.md) — and it needs no
device compute, so ``CheckpointManager(async_save=True)`` runs the whole
fetch+serialize in a worker thread while the next epoch trains.  The train
step donates its state arg (train_state.py donate_argnums=(0,)), so the live
pytree's buffers are invalidated by the very next step on TPU; ``save()``
therefore takes a device-side copy (cheap async dispatch, no host sync) on
the calling thread BEFORE returning, and only the copy crosses into the
worker.  device_get on the copy is thread-safe; at most one save is in
flight (each save joins the previous one, preserving file-write order), and
worker exceptions re-raise on the next save()/wait().  Default off =
reference-parity synchronous saving.
"""

import os
import pickle
import threading

import jax
import numpy as np


def _to_host(tree):
    # only materialize device arrays; leave config strings/scalars untouched
    return jax.tree_util.tree_map(
        lambda x: np.asarray(x) if isinstance(x, jax.Array) else x, tree
    )


def save_checkpoint(path, state):
    # atomic: a crash mid-write must not leave a truncated file where resume
    # (-r temp.ckpt) or test.py would trust it
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        pickle.dump(_to_host(state), fh, protocol=4)
    os.replace(tmp, path)


def load_checkpoint(path, model=None):
    """Load a .ckpt (ours) or .pth (reference torch) checkpoint.

    For ``.pth`` files ``model`` must be given; returns a state dict with only
    ``params``/``batch_stats`` (+config if embedded).
    """
    if path.endswith(".pth"):
        import torch

        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        from ..models.convert import torch_to_variables

        sd = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
        variables = torch_to_variables(model, sd)
        state = {"params": variables["params"], "batch_stats": variables["batch_stats"]}
        if isinstance(ckpt, dict) and "config" in ckpt:
            state["config"] = ckpt["config"]
            state["epoch"] = ckpt.get("epoch", 0)
        return state
    with open(path, "rb") as fh:
        return pickle.load(fh)


class CheckpointManager:
    def __init__(self, checkpoint_dir, save_freq, logger=None, async_save=False):
        self.dir = checkpoint_dir
        self.save_freq = save_freq
        self.logger = logger
        self.async_save = async_save
        self._worker = None
        self._worker_error = None

    def _log(self, msg):
        if self.logger:
            self.logger.info(msg)

    def wait(self):
        """Join the in-flight async save (no-op when idle / synchronous).
        Call before reading a file this manager may still be writing, and at
        the end of training."""
        if self._worker is not None:
            self._worker.join()
            self._worker = None
        if self._worker_error is not None:
            err, self._worker_error = self._worker_error, None
            raise err

    def save(self, epoch, state, save_best=False, temp=False):
        if not (epoch % self.save_freq == 0 or save_best or temp):
            return
        if not self.async_save:
            self._save_now(epoch, _to_host(state), save_best, temp)
            return
        self.wait()  # one in flight: keeps write order, surfaces errors

        # The caller's train step donates the state buffers, so the live
        # pytree dies on the next step.  Device-side copy here (async
        # dispatch, returns immediately); the copy owns fresh buffers that
        # survive donation.
        snapshot = jax.tree_util.tree_map(
            lambda x: x.copy() if isinstance(x, jax.Array) else x, state
        )

        def run():
            try:
                # device->host fetch happens HERE, off the training thread
                self._save_now(epoch, _to_host(snapshot), save_best, temp)
            except BaseException as e:  # re-raised by the next save()/wait()
                self._worker_error = e

        self._worker = threading.Thread(target=run, name="ckpt-save", daemon=True)
        self._worker.start()

    def _save_now(self, epoch, state, save_best, temp):
        if epoch % self.save_freq == 0:
            path = os.path.join(self.dir, f"epoch{epoch}.ckpt")
            save_checkpoint(path, state)
            self._log(f"Saving checkpoint at {path}")
        if save_best:
            rel = f"best_epoch{epoch}.ckpt"
            path = os.path.join(self.dir, rel)
            save_checkpoint(path, state)
            link = os.path.join(self.dir, "best_model.ckpt")
            if os.path.islink(link):
                stale = os.path.join(self.dir, os.readlink(link))
                if os.path.exists(stale):
                    os.remove(stale)
                os.remove(link)
            os.symlink(rel, link)
            self._log(f"Saving current best at {path}")
        if temp:
            path = os.path.join(self.dir, "temp.ckpt")
            save_checkpoint(path, state)
            self._log(f"Saving temp checkpoint at {path}")
