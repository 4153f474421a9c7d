"""Post-training int8 quantization of the folded inference path.

TPU v5e's MXU runs int8 contractions at ~2x the bf16 rate, and the fused
inference program (pipeline.py) is conv-bound — so quantizing the folded
convs buys real end-to-end FPS.  This module is beyond-reference capability:
the reference (duwt/OrienMask) serves fp32/fp16 only (infer.py:60-76).

Scheme (standard symmetric PTQ, arranged so everything fuses into the conv):

- **Weights**: per-output-channel int8, ``wscale[c] = max|K[..., c]| / 127``.
- **Activations**: per-tensor int8 with a *static* scale from a calibration
  pass (``calibrate_folded``: an eager CPU run over a few images recording
  each quantized conv's input absmax).
- Each quantized ``ConvBNLeaky`` computes::

      q   = sat_i8(round(x * in_inv))            # fuses into prev epilogue
      y   = conv_i8i8_i32(q, qkernel)            # MXU int8 path
      out = leaky(y * oscale + bias)             # f32 epilogue, fuses
      -> cast to the compute dtype (bf16 between layers)

  with ``oscale = in_scale * wscale`` per channel.  Module boundaries stay
  bf16, so residual adds, concats, and upsamples need no scale
  harmonization; the only overhead vs a float conv is the elementwise
  quantize, which XLA fuses.

The space-to-depth phase stem quantizes too: its phase kernels are derived
from the master kernels by dtype-preserving slice/stack repacks
(models/darknet.py ``_phase_kernel_*``), so an int8 master yields an int8
phase kernel, with the per-out-channel dequant scale tiled x4 exactly like
the bias for phase-emitting convs (``exclude_stem=True`` opts the stem out).
The final logit ``Conv`` of each prediction head is never quantized (folds
to plain conv+bias, stays f32 — the accuracy-critical end of the network).

Typical use is one call on a built pipeline::

    pipe = InferencePipeline(model, variables, transform, postprocess)
    pipe.quantize_int8(calib_images)      # (N, H, W, 3) uint8
    dets, pad = pipe(img)                 # same contract, int8 convs
"""

import jax
import jax.numpy as jnp
import numpy as np

# Paths (relative to the model root) whose convs must stay float.
_STEM_PREFIXES = (("backbone", "conv1"), ("backbone", "conv2"),
                  ("backbone", "conv3", 0))


def _is_stem(path):
    return any(path[:len(p)] == p for p in _STEM_PREFIXES)


def iter_convbn(module, folded, path=()):
    """Yield (path, ConvBNLeaky, folded_leaf) for every folded conv+BN in the
    model, mirroring the fold() tree structure (Sequential -> list,
    DarkNet53 -> stage dict, DarkNetBlock -> its inner Sequential's list,
    model root -> module-name dict).  Plain ``Conv`` heads, upsamples, and
    Scale leaves are skipped by construction."""
    from .darknet import DarkNet53, DarkNetBlock
    from .layers import ConvBNLeaky, Sequential

    if isinstance(module, ConvBNLeaky):
        yield path, module, folded
    elif isinstance(module, Sequential):
        for i, (m, f) in enumerate(zip(module.modules, folded)):
            yield from iter_convbn(m, f, path + (i,))
    elif isinstance(module, DarkNetBlock):
        yield from iter_convbn(module.conv, folded, path)
    elif isinstance(module, DarkNet53):
        for name in module.stage_names:
            yield from iter_convbn(getattr(module, name), folded[name],
                                   path + (name,))
    elif hasattr(module, "_module_names"):  # _BaseOrienMask root
        for name in module._module_names():
            yield from iter_convbn(getattr(module, name), folded[name],
                                   path + (name,))


def calibrate_folded(model, folded, images, transform=None):
    """Record per-conv input absmax over ``images`` -> {path: absmax}.

    Runs the float folded forward EAGERLY on the host CPU backend (a few
    seconds for a handful of images) with the observer hook in
    ``layers.ConvBNLeaky.apply_folded`` armed.  ``images``: (N, H, W, 3)
    uint8/float raw images; ``transform`` (the pipeline's FastCOCOTransform)
    is applied per image when given, so calibration sees exactly the
    network-input distribution.
    """
    from . import layers

    cpu = jax.local_devices(backend="cpu")[0]
    folded_cpu = jax.device_put(folded, cpu)
    id2path = {id(f["kernel"]): p
               for p, _, f in iter_convbn(model, folded_cpu)}
    observed = {}
    layers._CALIB_OBSERVER = observed
    try:
        with jax.default_device(cpu):
            ctx = {"train": False, "dtype": jnp.float32}
            for img in images:
                x = jnp.asarray(img, jnp.float32)[None]
                if transform is not None:
                    x = transform.apply(x)
                model.apply_folded(folded_cpu, x, ctx)
    finally:
        layers._CALIB_OBSERVER = None
    return {id2path[i]: amax for i, amax in observed.items() if i in id2path}


def quantize_folded(model, folded, act_scales, exclude_stem=False):
    """Return a copy of ``folded`` with calibrated ConvBNLeaky leaves replaced
    by int8 leaves ``{qkernel i8, in_inv f32, oscale (cout,) f32, bias}``.

    ``act_scales``: {path: input absmax} from ``calibrate_folded``.  Convs
    with no recorded scale (or in the excluded stem) stay float.  The result
    is placed on the default device, like ``model.fold()``.
    """
    def container_copy(node):
        if isinstance(node, dict):
            return {k: container_copy(v) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return [container_copy(v) for v in node]
        return node  # array leaves are shared, not copied

    qfolded = container_copy(folded)

    def set_leaf(path, leaf):
        node = qfolded
        for k in path[:-1]:
            node = node[k]
        node[path[-1]] = leaf

    n_q = 0
    for path, module, f in iter_convbn(model, folded):
        if exclude_stem and _is_stem(path):
            continue
        amax = act_scales.get(path)
        if not amax or not np.isfinite(amax):
            continue
        k = np.asarray(f["kernel"], np.float32)
        wscale = np.maximum(np.abs(k).reshape(-1, k.shape[3]).max(axis=0),
                            1e-12) / 127.0
        qk = np.clip(np.rint(k / wscale), -127, 127).astype(np.int8)
        in_scale = float(amax) / 127.0
        set_leaf(path, {
            "qkernel": jnp.asarray(qk),
            "in_inv": jnp.float32(1.0 / in_scale),
            "oscale": jnp.asarray(in_scale * wscale, jnp.float32),
            "bias": jnp.asarray(np.asarray(f["bias"], np.float32)),
        })
        n_q += 1
    if n_q == 0:
        raise ValueError("no convs were quantized — empty/mismatched "
                         "calibration scales?")
    return jax.device_put(qfolded, jax.local_devices()[0])
