"""Infrastructure coverage: timer registry, config composition, checkpoint cadence."""

import os
import time

import numpy as np

from orienmask_tpu.config.base import construct_config
from orienmask_tpu.trainer.checkpoint import CheckpointManager, load_checkpoint
from orienmask_tpu.utils import timer


def test_construct_config_merge_and_pop():
    base = {"a": 1, "b": {"c": 2, "d": 3}, "e": [1, 2]}
    out = construct_config(base, update={"b": {"c": 9}, "e": [5]}, pop=["b.d"])
    assert out == {"a": 1, "b": {"c": 9}, "e": [5]}
    assert base["b"] == {"c": 2, "d": 3}  # base untouched (deepcopy)


def test_timer_registry():
    timer.reset()
    for _ in range(3):
        with timer.timer("stage a"):
            time.sleep(0.01)
    with timer.timer("stage b"):
        time.sleep(0.02)
    log = timer.get_all_elapsed_time()
    assert set(log) == {"stage a", "stage b"}
    # only lower bounds: the 1-core CI box has unbounded scheduling jitter
    assert log["stage a"] >= 10
    assert log["stage b"] >= 20
    timer.reset()
    assert timer.get_all_elapsed_time() == {}


def test_checkpoint_cadence_and_best_symlink(tmp_path):
    mgr = CheckpointManager(str(tmp_path), save_freq=2)
    state = {"epoch": 0, "params": {"w": np.ones(3)}, "batch_stats": {},
             "opt_state": {}, "monitor_best": 0.0, "config": {"model": "m"}}

    mgr.save(1, dict(state, epoch=1), temp=True)
    assert os.path.exists(tmp_path / "temp.ckpt")
    assert not os.path.exists(tmp_path / "epoch1.ckpt")

    mgr.save(2, dict(state, epoch=2), save_best=True)
    assert os.path.exists(tmp_path / "epoch2.ckpt")
    assert os.path.islink(tmp_path / "best_model.ckpt")
    assert os.readlink(tmp_path / "best_model.ckpt") == "best_epoch2.ckpt"

    mgr.save(4, dict(state, epoch=4), save_best=True)
    # stale best removed, symlink retargeted (reference trainer/base.py:158-166)
    assert not os.path.exists(tmp_path / "best_epoch2.ckpt")
    assert os.readlink(tmp_path / "best_model.ckpt") == "best_epoch4.ckpt"

    ckpt = load_checkpoint(str(tmp_path / "best_model.ckpt"))
    assert ckpt["epoch"] == 4
    assert ckpt["config"] == {"model": "m"}
    np.testing.assert_array_equal(ckpt["params"]["w"], np.ones(3))


def test_cpu_collective_cache_guard_installed():
    """conftest enables the persistent compile cache; the guard must route
    multi-device CPU executables around it (cache-deserialized XLA:CPU
    collectives wedge at rendezvous — utils/cache.py failure mode 2)."""
    from jax._src import compiler

    from orienmask_tpu.utils.cache import _install_cpu_collective_cache_guard

    assert getattr(compiler.compile_or_get_cached, "_omtpu_cpu_guard", False)
    before = compiler.compile_or_get_cached
    _install_cpu_collective_cache_guard()  # idempotent: no double-wrap
    assert compiler.compile_or_get_cached is before


def test_temp_save_freq_cadence(tmp_path):
    """temp_save_freq thins the per-epoch failure-recovery checkpoint (default
    1 = reference parity: a temp save on every non-val epoch)."""
    from orienmask_tpu.trainer.base import BaseTrainer

    class Stub(BaseTrainer):
        def _train_epoch(self, epoch):
            return {}

        def _checkpoint_state(self, epoch):
            return {"epoch": epoch, "params": {}, "batch_stats": {},
                    "opt_state": {}, "monitor_best": 0.0, "config": self.config}

    cfg = {"name": "cadence", "epochs": 5, "val_freq": 99, "save_freq": 99,
           "temp_save_freq": 3, "monitor": "segm_AP", "monitor_mode": "off",
           "log_dir": str(tmp_path)}
    saves = []
    t = Stub(cfg)
    t.ckpt_manager.save = lambda epoch, state, **kw: saves.append(epoch)
    t.train()
    assert saves == [3]  # epochs 1,2,4,5 skipped

    cfg2 = dict(cfg, name="cadence2")
    cfg2.pop("temp_save_freq")
    saves2 = []
    t2 = Stub(cfg2)
    t2.ckpt_manager.save = lambda epoch, state, **kw: saves2.append(epoch)
    t2.train()
    assert saves2 == [1, 2, 3, 4, 5]  # default: every epoch (parity)


def test_async_checkpoint_equivalence_and_errors(tmp_path):
    """async_save=True writes the same bytes-equivalent state off-thread;
    worker exceptions surface on the next wait()/save()."""
    import pickle

    import jax.numpy as jnp

    state = {"epoch": 3, "params": {"w": jnp.arange(5.0)},
             "batch_stats": {}, "opt_state": {"m": jnp.ones(2)},
             "monitor_best": 0.5, "config": {"model": "m"}}

    sync = CheckpointManager(str(tmp_path / "s"), save_freq=1)
    os.makedirs(tmp_path / "s")
    sync.save(3, state, save_best=True)

    os.makedirs(tmp_path / "a")
    amgr = CheckpointManager(str(tmp_path / "a"), save_freq=1, async_save=True)
    amgr.save(3, state, save_best=True)
    amgr.wait()

    for name in ("epoch3.ckpt", "best_epoch3.ckpt", "best_model.ckpt"):
        a = load_checkpoint(str(tmp_path / "a" / name))
        s = load_checkpoint(str(tmp_path / "s" / name))
        np.testing.assert_array_equal(a["params"]["w"], s["params"]["w"])
        np.testing.assert_array_equal(a["opt_state"]["m"], s["opt_state"]["m"])
        assert a["epoch"] == 3 and a["config"] == {"model": "m"}
    # no stray .tmp files (atomic rename)
    assert not [f for f in os.listdir(tmp_path / "a") if f.endswith(".tmp")]

    # error propagation: unpicklable leaf -> raised at wait(), manager reusable
    bad = dict(state, config={"fh": open(__file__)})
    amgr.save(4, bad, temp=True)
    try:
        amgr.wait()
        raise AssertionError("expected pickling error")
    except TypeError:
        pass
    bad["config"]["fh"].close()
    amgr.save(5, state, temp=True)  # manager still works after the error
    amgr.wait()
    assert load_checkpoint(str(tmp_path / "a" / "temp.ckpt"))["epoch"] == 3


def test_async_checkpoint_survives_donation(tmp_path, monkeypatch):
    """Regression: train_step donates its state arg (train_state.py
    donate_argnums=(0,)), so on TPU the live pytree's buffers die on the
    next step while the async worker is still fetching.  CPU ignores
    donation, so we mimic it deterministically: delay the worker's
    device->host fetch and explicitly .delete() the live buffers right
    after save() returns — exactly what the next donated step does on TPU.
    save() must snapshot before returning or the write is lost."""
    import time

    import jax.numpy as jnp

    from orienmask_tpu.trainer import checkpoint as ckpt_mod

    real_to_host = ckpt_mod._to_host

    def slow_to_host(tree):
        time.sleep(0.3)  # give the caller time to delete the live buffers
        return real_to_host(tree)

    monkeypatch.setattr(ckpt_mod, "_to_host", slow_to_host)

    w = jnp.arange(1000, dtype=jnp.float32)
    state = {"epoch": 1, "params": {"w": w}, "batch_stats": {},
             "opt_state": {}, "monitor_best": 0.0, "config": {}}

    os.makedirs(tmp_path / "d")
    mgr = CheckpointManager(str(tmp_path / "d"), save_freq=1, async_save=True)
    mgr.save(1, state, temp=True)
    w.delete()  # donation: the buffers save() captured are gone
    mgr.wait()  # raises 'Array has been deleted' without the snapshot

    loaded = load_checkpoint(str(tmp_path / "d" / "temp.ckpt"))
    np.testing.assert_array_equal(
        loaded["params"]["w"], np.arange(1000, dtype=np.float32))
