"""Fused inference pipeline: raw image -> instance masks in ONE XLA program.

This is the BASELINE.json north-star path: device-side transform (bilinear resize
to the network size + normalize), /32 pad, folded-BN bf16 forward, anchor decode,
confidence top-k, greedy class NMS, and orientation-mask assembly all trace into a
single jit per input shape (one compiled program per (H, W), cached — SURVEY.md
§5.7 per-resolution program caching).  No host round-trips inside the loop; the
only transfers are the uint8 input and the (optionally bit-packed) outputs.
"""


import jax
import jax.numpy as jnp

from .models.layers import default_ctx


class InferencePipeline:
    def __init__(self, model, variables, transform, postprocess,
                 compute_dtype="bfloat16", mesh=None, spatial_masks="auto"):
        """``mesh``: optional ``(data, space)`` mesh from
        ``parallel.spatial.spatial_mesh`` — shards the input image rows across
        devices (GSPMD conv halo exchange) for multi-chip batch-1 latency at
        large resolutions; outputs come back replicated.  Default: one device.

        ``spatial_masks``: with a mesh whose space axis > 1, also row-shard
        the postprocess tail (orientation upsample + mask rasterization) via
        ``parallel.spatial.run_batch_spatial`` instead of gathering head
        outputs to replicated first — the detect stage stays replicated
        (tiny), the HBM-bound image-resolution tail splits ~linearly.
        "auto": on whenever the network height divides evenly; True/False
        force it.
        """
        self.model = model
        self.mesh = mesh
        self.spatial_masks = spatial_masks
        self.transform = transform  # FastCOCOTransform description
        self.postprocess = postprocess
        self.dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
        folded = model.fold(variables)
        # Pre-cast conv kernels to the compute dtype once: conv2d casts its
        # kernel per call, which for 50M folded f32 params costs ~0.4ms of
        # HBM traffic per frame (~13% of the whole pipeline).  Same bits as
        # the per-call cast.  Biases stay f32 (added post-conv, per-channel).
        self.folded = jax.tree_util.tree_map_with_path(
            lambda path, leaf: leaf.astype(self.dtype)
            if path and getattr(path[-1], "key", None) == "kernel" else leaf,
            folded,
        )
        # Hoist the phase-stem kernel derivations (slice/stack repacks of
        # static weights, ~0.11 ms/frame if left in-graph) out of the
        # per-frame program — same bits, derived once here.
        pre = getattr(model, "precompute_stem_folded", None)
        if pre is not None:
            self.folded = pre(self.folded)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            # fold() commits weights to device 0; replicate them over the mesh
            # so the sharded jit's input constraint is already satisfied.
            self.folded = jax.device_put(
                self.folded, NamedSharding(mesh, P()))
        self._fns = {}  # input (H, W) -> compiled fn
        h, w = transform.size
        # transform resizes (warps) to the exact network size; pad is a no-op
        self.pad_info = (0, 0, 0, 0, h, w)

    def quantize_int8(self, calib_images, stem=False):
        """Switch the folded forward to int8 convs (models/quantize.py).

        ``calib_images``: (N, H, W, 3) uint8/float raw images used to
        calibrate the per-conv activation scales (an eager CPU pass; a
        handful of representative images suffices).  Compiled programs are
        rebuilt on next use.  ``stem=True`` also quantizes the space-to-depth
        phase stem — measured +3 FPS for −0.002 segm AP at 544² (the stem is
        bandwidth-bound, so int8 barely helps it); head logit convs always
        stay float — see the quantize module docstring for the scheme.
        """
        from .models.quantize import calibrate_folded, quantize_folded

        scales = calibrate_folded(self.model, self.folded, calib_images,
                                  transform=self.transform)
        self.folded = quantize_folded(self.model, self.folded, scales,
                                      exclude_stem=not stem)
        # quantize_folded rebuilds quantized leaves without the pre-derived
        # phase kernels — re-derive (int8 masters stay int8 through the
        # dtype-preserving repack)
        pre = getattr(self.model, "precompute_stem_folded", None)
        if pre is not None:
            self.folded = pre(self.folded)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self.folded = jax.device_put(
                self.folded, NamedSharding(self.mesh, P()))
        self._fns = {}
        return self

    def _make_run(self, in_shape):
        """The untraced (folded_weights, image_u8) -> padded-output function for
        one input shape.  Split from ``_build`` so ``serving.export_pipeline``
        can hand the exact same computation to ``jax.export``."""
        from .models.layers import phase_resize

        h, w = self.transform.size
        # Fused phase resize: when the backbone runs its space-to-depth stem,
        # the resize matmuls emit the stem's phase layout directly (a row
        # slice of the resize matrices — same FLOPs, layers.phase_resize) and
        # conv1 runs as the cheaper 2x2x12 even-spatial conv
        # (darknet._phase_kernel_im_z).  Normalization moves BEFORE the
        # resize, which commutes (per-channel affine; bilinear rows sum to 1)
        # and keeps the z zero-padding exact.
        use_phase = (
            getattr(getattr(self.model, "backbone", None), "s2d_stem", False)
            and h % 4 == 0 and w % 4 == 0
            and self.transform.interpolation == "bilinear"
        )

        # Row-shard the postprocess tail over the mesh's space axis when asked
        # (or automatically when the shape divides) — parallel/spatial.py.
        sp = self.spatial_masks
        n_space = self.mesh.shape.get("space", 1) if self.mesh is not None else 1
        use_spatial_pp = (
            n_space > 1
            and (sp is True or (sp == "auto" and h % n_space == 0)))
        if sp is True and h % n_space != 0:
            raise ValueError(
                f"spatial_masks: network height {h} not divisible by the "
                f"mesh space axis ({n_space})")

        def run(folded, image_u8):
            x = image_u8.astype(jnp.float32)
            ctx = default_ctx(train=False, dtype=self.dtype)
            if use_phase:
                mean = jnp.asarray(self.transform.mean)
                std = jnp.asarray(self.transform.std)
                z = phase_resize((x - mean) / std, h, w,
                                 self.transform.align_corners)
                predict = self.model.apply_folded(
                    folded, z, ctx, phase_hw=(h // 2, w // 2))
            else:
                x = self.transform.apply(x)
                predict = self.model.apply_folded(folded, x, ctx)
            if use_spatial_pp:
                from .parallel.spatial import run_batch_spatial

                return run_batch_spatial(self.postprocess, self.mesh, predict)
            return self.postprocess._run_batch(predict)

        return run

    def _build(self, in_shape):
        run = self._make_run(in_shape)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from .parallel.spatial import image_sharding

            rep = NamedSharding(self.mesh, P())
            return jax.jit(run, in_shardings=(rep, image_sharding(self.mesh)),
                           out_shardings=rep)
        return jax.jit(run)

    def _fn_for(self, shape):
        key = tuple(shape)
        if key not in self._fns:
            self._fns[key] = self._build(key)
        return self._fns[key]

    def run_device(self, image):
        """image: (B, H, W, 3) uint8/float (host or device) -> device output dict."""
        fn = self._fn_for(image.shape)
        return fn(self.folded, jnp.asarray(image))

    def __call__(self, image):
        """image: (B, H, W, 3) -> (list of per-image detection dicts, pad_info)."""
        out = self.run_device(image)
        return self.postprocess.to_host_list(out), self.pad_info
