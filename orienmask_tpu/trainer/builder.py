"""Config-driven component factory (reference trainer/builder.py).

Same reflection pattern: a config dict's ``type`` key is looked up in the target
module's namespace; remaining keys become constructor kwargs.  TPU-specific
wiring replaces the CUDA/DDP bits: models produce param pytrees, the optimizer is
functional SGD, data parallelism is a mesh handed to the Trainer.
"""

import copy
import functools
import random

import jax
import numpy as np

from .. import data as data_module
from .. import models as model_module
from .. import optim as optim_module
from ..eval import coco_eval  # noqa: F401  (registry completeness)
from ..ops import loss as loss_module
from ..ops import postprocess as postprocess_module
from ..parallel.mesh import data_mesh
from ..utils.envs import get_device_rank, get_world_size
from .checkpoint import load_checkpoint
from .tester import Tester
from .trainer import Trainer


def build(config, module, **kwargs):
    cfg = copy.deepcopy(config)
    cls = getattr(module, cfg.pop("type"))
    return cls(**cfg, **kwargs)


def build_func_partial(config, module, **kwargs):
    cfg = copy.deepcopy(config)
    fn = getattr(module, cfg.pop("type"))
    return functools.partial(fn, **cfg, **kwargs)


def build_model(config, ignore_pretrained=False, seed=0):
    cfg = copy.deepcopy(config)
    if ignore_pretrained:
        cfg["pretrained"] = None
    model = build(cfg, model_module)
    variables = model.init_variables(jax.random.PRNGKey(seed))
    return model, variables


def build_postprocess(config, pack_masks=True):
    # pack_masks default True: detection masks cross device->host bit-packed
    # (8x less transfer); to_host_list unpacks on the host transparently.
    cfg = copy.deepcopy(config)
    return build(cfg, postprocess_module, pack_masks=pack_masks)


def build_transform(config):
    cfg = copy.deepcopy(config)
    name = cfg.pop("type")
    transform_class = getattr(data_module, name)
    if name == "FastCOCOTransform":
        return transform_class(**cfg)
    pipeline_cfg = cfg.pop("pipeline")
    pipeline = []
    for item in pipeline_cfg:
        item = dict(item)
        op_cls = getattr(transform_class, item.pop("type"))
        pipeline.append(op_cls(**item))
    return transform_class(pipeline, **cfg)


def build_dataloader(config, seed=0, rank=0, world_size=1):
    cfg = copy.deepcopy(config)
    dataset_cfg = cfg.pop("dataset")
    transform = build_transform(cfg.pop("transform"))
    dataset_cfg["transform"] = transform
    dataset = build(dataset_cfg, data_module)
    collate_cfg = cfg.pop("collate", {"type": "collate"})
    collate_kwargs = {
        "max_instances": cfg.pop("max_instances", 100),
        # default True: GT masks cross host->device bit-packed (8x less
        # PCIe) and the Pallas painter consumes them packed natively.
        "pack_masks": cfg.pop("pack_masks", True),
    }
    # uint8 image transport (4x less host->device traffic) — only `collate`
    # supports it; the jitted steps divide by 255 on device.
    transport = cfg.pop("image_transport", None)
    if transport is not None:
        if collate_cfg.get("type", "collate") != "collate":
            raise ValueError(
                f"image_transport={transport!r} requires collate type 'collate' "
                f"(got {collate_cfg.get('type')!r})")
        if transport == "uint8":
            _check_u8_transport_normalize(transform)
        collate_kwargs["image_transport"] = transport
    collate_fn = build_func_partial(collate_cfg, data_module, **collate_kwargs)
    cfg.pop("pin_memory", None)
    return data_module.DataLoader(
        dataset, collate_fn=collate_fn, seed=seed, rank=rank,
        world_size=world_size, **cfg,
    )


def _check_u8_transport_normalize(transform):
    """uint8 transport assumes Normalize(mean 0, std 255): round(x*255) must
    invert the normalization exactly (up to quantization)."""
    pipeline = getattr(getattr(transform, "pipeline", None), "transforms", [])
    for op in pipeline:
        if type(op).__name__ == "Normalize":
            mean = tuple(float(m) for m in np.ravel(op.mean))
            std = tuple(float(v) for v in np.ravel(op.std))
            if any(m != 0.0 for m in mean) or any(v != 255.0 for v in std):
                raise ValueError(
                    "image_transport='uint8' requires Normalize(mean=0, "
                    f"std=255); got mean={mean} std={std}")
    return


def _freeze_mask(model, params):
    """Bool pytree (True = frozen) covering frozen backbone stages, or None."""
    frozen = model.frozen_param_paths()
    if not frozen:
        return None
    import jax.tree_util as jtu

    frozen_stages = {stage for (_, stage) in frozen}
    mask = jtu.tree_map(lambda _: False, params)
    mask["backbone"] = {
        stage: jtu.tree_map(lambda _: stage in frozen_stages, sub)
        for stage, sub in params["backbone"].items()
    }
    return mask


def build_optimizer(config, model=None, params=None):
    # NOTE: the lr/accumulate compensation (reference builder.py:121) lives in
    # the train step's optimizer application (train_state.apply_opt), not here.
    cfg = copy.deepcopy(config)
    assert cfg.pop("type") == "SGD", "only SGD is shipped (reference parity)"
    lr = cfg.pop("lr")
    # Optional detectron2-style param groups sub-config (reference
    # trainer/builder.py:122-126): base_lr/weight_decay are injected from the
    # optimizer config; the sub-config carries norm_weight_decay /
    # bias_lr_factor / bias_weight_decay. Here groups become per-leaf
    # lr/wd factor pytrees consumed by the functional SGD.
    pg_cfg = cfg.pop("param_groups", None)
    lr_factors = wd_factors = None
    if pg_cfg:
        assert params is not None, "param_groups needs the model params pytree"
        lr_factors, wd_factors = optim_module.param_group_factors(
            params, weight_decay=cfg.get("weight_decay", 0.0), **pg_cfg)
    freeze_mask = _freeze_mask(model, params) if (model is not None and params is not None) else None
    return optim_module.SGD(lr=lr, freeze_mask=freeze_mask,
                            lr_factors=lr_factors, wd_factors=wd_factors, **cfg)


def build_lr_scheduler(config, base_lr):
    cfg = copy.deepcopy(config)
    name = cfg.pop("type")
    cls = getattr(optim_module, name)
    return cls(base_lr=base_lr, **cfg)


def _n_devices(config):
    return config.get("n_device", config.get("n_gpu", 1))


def build_trainer(config, resume=None, weights=None):
    random.seed(config["seed"])
    np.random.seed(config["seed"])

    world_size = get_world_size()
    rank = get_device_rank()
    n_space = int(config.get("n_space", 1))
    if n_space > 1:
        # Spatial training (beyond-reference): image rows sharded n_space-way,
        # batches over the remaining devices. Works multi-process too: each
        # host feeds whole images for its own data rows and
        # shard_spatial_batch assembles the global (data, space) arrays;
        # spatial_mesh raises when n_space would straddle a process boundary.
        from ..parallel.spatial import spatial_mesh

        if jax.local_device_count() % n_space != 0:
            raise ValueError(
                f"n_space={n_space} must divide the local device count "
                f"({jax.local_device_count()}): each image's row shards must "
                f"stay on one host")
        n_data = len(jax.devices()) // n_space
        mesh = spatial_mesh(n_space=n_space, n_data=n_data)
        # loader feeds one whole image per LOCAL data row
        n_local = jax.local_device_count() // n_space
    else:
        mesh = data_mesh()
        # The mesh spans ALL processes' devices; each host's loader must feed
        # only its local share (batch_size is per device, reference-style), or
        # a multi-host run inflates the effective batch by world_size.
        n_local = jax.local_device_count()
    n_mesh = len(mesh.devices.flatten())
    n_cfg = _n_devices(config)
    # Reference train.py:39 asserts device_count == n_gpu: the config's batch
    # size is PER DEVICE, so a silent mesh-width mismatch changes the
    # effective batch/LR recipe. ORIENMASK_ANY_DEVICES=1 opts out for dev
    # boxes.
    import os as _os

    if not _os.environ.get("ORIENMASK_ANY_DEVICES"):
        assert n_mesh == n_cfg, (
            f"config n_device={n_cfg} but mesh spans {n_mesh} devices; "
            "set ORIENMASK_ANY_DEVICES=1 to train at a different scale "
            "(effective batch = batch_size x devices)")

    train_loader = build_dataloader(
        dict(_scaled_loader_cfg(config["train_loader"], n_local), drop_last=True),
        seed=config["seed"], rank=rank, world_size=world_size,
    )
    val_loader = build_dataloader(
        dict(_scaled_loader_cfg(config["val_loader"], n_local), pad_last=True),
        seed=config["seed"], rank=rank, world_size=world_size,
    )
    postprocess = build_postprocess(config["postprocess"])
    ignore_pretrained = bool(resume or weights)
    model, variables = build_model(
        config["model"], ignore_pretrained, seed=config["seed"]
    )
    loss = build(config["loss"], loss_module)
    optimizer = build_optimizer(config["optimizer"], model, variables["params"])
    lr_scheduler = build_lr_scheduler(
        config["lr_scheduler"], config["optimizer"]["lr"]
    )
    return Trainer(model, loss, optimizer, lr_scheduler, config,
                   train_loader, val_loader, postprocess, mesh, variables,
                   resume=resume, weights=weights)


def _scaled_loader_cfg(loader_cfg, n_local_devices):
    """Per-device batch size (reference: per-GPU) -> per-host global batch."""
    cfg = copy.deepcopy(loader_cfg)
    cfg["batch_size"] = cfg["batch_size"] * n_local_devices
    return cfg


def build_tester(config, checkpoint):
    import os

    test_config = copy.deepcopy(config)
    model_cfg = copy.deepcopy(test_config["model"])
    model_cfg["pretrained"] = None
    model = build(model_cfg, model_module)
    ckpt = load_checkpoint(checkpoint, model)
    if "config" in ckpt and "model" in ckpt["config"]:
        # rebuild the exact train-time model (reference builder.py:45-52)
        model_cfg = copy.deepcopy(ckpt["config"]["model"])
        model_cfg["pretrained"] = None
        model = build(model_cfg, model_module)
    variables = {"params": ckpt["params"], "batch_stats": ckpt["batch_stats"]}
    test_loader = build_dataloader(dict(test_config["test_loader"], pad_last=True))
    postprocess = build_postprocess(test_config["postprocess"])
    checkpoint_dir = os.path.dirname(checkpoint) or "."
    # Beyond the reference's single-GPU test.py (reference test.py:23):
    # n_device > 1 shards each eval batch over a data mesh.
    mesh = data_mesh(n_devices=_n_devices(test_config)) \
        if _n_devices(test_config) > 1 else None
    return Tester(model, variables, postprocess, test_loader, checkpoint_dir,
                  test_config["gt_file"], test_config.get("compute_dtype", "float32"),
                  mesh=mesh)
