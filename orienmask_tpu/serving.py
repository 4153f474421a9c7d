"""AOT export / serving: freeze the fused image->masks program to disk.

``export_pipeline`` serializes the exact per-resolution XLA program that
``pipeline.InferencePipeline`` runs (device resize/normalize + folded-BN bf16
forward + decode + NMS + mask assembly) through ``jax.export`` (StableHLO with
a versioned calling convention), next to the folded weights and a JSON
manifest.  ``load_serving`` brings it back WITHOUT any model construction,
weight folding, or retracing — a serving host needs jax + this artifact, not
the framework's model zoo.

This is a beyond-reference capability: the reference serves from the live
torch module only (reference ``infer.py:60-76`` rebuilds the model and loads
``.pth`` weights on every process start).  Artifact layout:

    manifest.json                 input/output spec, trim rules, versions
    weights.npz                   folded weights, flattened in treedef order
    program_{B}x{H}x{W}x3.jaxexp  serialized Exported, one per input shape

The weights ride OUTSIDE the programs (as call arguments), so N exported
resolutions share one weight blob instead of embedding ~100 MB of constants
each, and a weight refresh (new checkpoint, same architecture) is an npz swap
that does not touch the programs.
"""

import hashlib
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

MANIFEST = "manifest.json"
WEIGHTS = "weights.npz"
# format 2 adds arch_fingerprint + per-blob shape/digest (loader still reads
# format-1 artifacts, minus the integrity checks they never carried)
_FORMAT_VERSION = 2


def _arch_fingerprint(model, treedef, flat):
    """Architecture identity: model class + weight-tree structure + per-leaf
    shape/dtype.  A weights.npz from a different variant with a
    coincidentally equal leaf count hashes differently and is refused at
    load (the serving analogue of the reference's strict state_dict load,
    reference infer.py:83)."""
    h = hashlib.sha256()
    h.update(type(model).__name__.encode())
    h.update(str(treedef).encode())
    for leaf in flat:
        arr = np.asarray(leaf)
        h.update(repr(tuple(arr.shape)).encode())
        h.update(arr.dtype.name.encode())
    return h.hexdigest()


def _program_name(shape):
    return "program_" + "x".join(str(int(s)) for s in shape) + ".jaxexp"


def export_pipeline(pipeline, input_shapes, out_dir, platforms=None):
    """Export ``pipeline`` (an ``InferencePipeline``) for serving.

    input_shapes: list of (B, H, W, 3) uint8 input shapes — one program each
      (the per-resolution program model of SURVEY.md §5.7, frozen to disk).
    platforms: optional list for cross-platform artifacts (e.g.
      ``["tpu", "cpu"]``); default = the exporting process's backend.  Note
      the Pallas mask kernel is TPU-only — a cpu-including export must come
      from a pipeline whose postprocess was built with
      ``use_pallas_masks=False``.
    """
    if pipeline.mesh is not None:
        raise ValueError("serving export is single-device; build the "
                         "pipeline without a spatial mesh")
    if not input_shapes:
        raise ValueError("input_shapes must name at least one (B, H, W, 3)")
    os.makedirs(out_dir, exist_ok=True)

    flat, treedef = jax.tree_util.tree_flatten(pipeline.folded)
    # npz can't represent ml_dtypes extension dtypes (bfloat16 kernels come
    # back as void '|V2'): store those as same-width integer views and record
    # the true dtype in the manifest.
    blobs, weight_dtypes, weight_shapes, weight_digests = {}, [], [], []
    for i, leaf in enumerate(flat):
        arr = np.asarray(leaf)
        weight_dtypes.append(arr.dtype.name)
        weight_shapes.append(list(arr.shape))
        if arr.dtype.kind == "V":  # extension dtype (bfloat16 etc.)
            arr = arr.view("u%d" % arr.dtype.itemsize)
        # digest the STORED bytes (post-view) so the loader can verify the
        # blob before reinterpreting it
        weight_digests.append(
            hashlib.sha256(np.ascontiguousarray(arr).tobytes()).hexdigest())
        blobs["w%05d" % i] = arr
    np.savez(os.path.join(out_dir, WEIGHTS), **blobs)

    programs = {}
    for shape in input_shapes:
        shape = tuple(int(s) for s in shape)
        run = pipeline._make_run(shape)

        def run_flat(flat_w, image_u8, _run=run):
            return _run(jax.tree_util.tree_unflatten(treedef, list(flat_w)),
                        image_u8)

        exp = jax.export.export(jax.jit(run_flat), platforms=platforms)(
            tuple(jax.ShapeDtypeStruct(x.shape, x.dtype) for x in flat),
            jax.ShapeDtypeStruct(shape, jnp.uint8),
        )
        name = _program_name(shape)
        with open(os.path.join(out_dir, name), "wb") as fh:
            fh.write(exp.serialize())
        programs[name] = {"input_shape": list(shape)}

    post = pipeline.postprocess
    manifest = {
        "format_version": _FORMAT_VERSION,
        "jax_version": jax.__version__,
        "platforms": list(exp.platforms),
        "n_weights": len(flat),
        "weight_dtypes": weight_dtypes,
        "weight_shapes": weight_shapes,
        "weight_digests": weight_digests,
        "arch_fingerprint": _arch_fingerprint(pipeline.model, treedef, flat),
        "programs": programs,
        # host-side trim rules (postprocess.to_host_list semantics)
        "pack_masks": bool(post.pack_masks),
        "image_size": [int(post.image_h), int(post.image_w)],
        "pad_info": list(pipeline.pad_info),
    }
    with open(os.path.join(out_dir, MANIFEST), "w") as fh:
        json.dump(manifest, fh, indent=2)
    return manifest


def update_weights(out_dir, folded):
    """Swap in a new checkpoint's folded weights (same architecture) without
    re-exporting the programs.  Validates every leaf's shape/dtype against
    the manifest and refreshes the per-blob digests — a raw npz overwrite is
    rejected at load by design (checksum mismatch)."""
    with open(os.path.join(out_dir, MANIFEST)) as fh:
        manifest = json.load(fh)
    flat, _ = jax.tree_util.tree_flatten(folded)
    if len(flat) != manifest["n_weights"]:
        raise ValueError("new weights have %d leaves, artifact expects %d"
                         % (len(flat), manifest["n_weights"]))
    blobs, digests = {}, []
    for i, leaf in enumerate(flat):
        arr = np.asarray(leaf)
        if arr.dtype.name != manifest["weight_dtypes"][i]:
            raise ValueError("leaf %d dtype %s != manifest %s"
                             % (i, arr.dtype.name, manifest["weight_dtypes"][i]))
        if list(arr.shape) != manifest["weight_shapes"][i]:
            raise ValueError("leaf %d shape %s != manifest %s — different "
                             "model variant" % (i, list(arr.shape),
                                                manifest["weight_shapes"][i]))
        if arr.dtype.kind == "V":
            arr = arr.view("u%d" % arr.dtype.itemsize)
        digests.append(
            hashlib.sha256(np.ascontiguousarray(arr).tobytes()).hexdigest())
        blobs["w%05d" % i] = arr
    np.savez(os.path.join(out_dir, WEIGHTS), **blobs)
    manifest["weight_digests"] = digests
    with open(os.path.join(out_dir, MANIFEST), "w") as fh:
        json.dump(manifest, fh, indent=2)


class ServingModel:
    """A deserialized serving artifact.  API mirrors ``InferencePipeline``:
    ``run_device`` returns the padded device dict, ``__call__`` returns
    (per-image trimmed numpy dicts, pad_info)."""

    def __init__(self, out_dir):
        with open(os.path.join(out_dir, MANIFEST)) as fh:
            self.manifest = json.load(fh)
        if self.manifest["format_version"] > _FORMAT_VERSION:
            raise ValueError("artifact format %d is newer than this loader"
                             % self.manifest["format_version"])
        blob = np.load(os.path.join(out_dir, WEIGHTS))
        dtypes = self.manifest["weight_dtypes"]
        n = self.manifest["n_weights"]
        if len(blob.files) != n:
            raise ValueError(
                "weights.npz has %d blobs but the manifest expects %d — "
                "the weight file does not belong to this artifact"
                % (len(blob.files), n))
        shapes = self.manifest.get("weight_shapes")
        digests = self.manifest.get("weight_digests")  # absent in format 1
        weights = []
        for i in range(n):
            arr = blob["w%05d" % i]
            if digests is not None:
                got = hashlib.sha256(
                    np.ascontiguousarray(arr).tobytes()).hexdigest()
                if got != digests[i]:
                    raise ValueError(
                        "weights.npz blob w%05d checksum mismatch (corrupt "
                        "file or weights from a different export)" % i)
            arr = arr.view(np.dtype(dtypes[i]))
            if shapes is not None and list(arr.shape) != shapes[i]:
                raise ValueError(
                    "weights.npz blob w%05d has shape %s, manifest expects "
                    "%s — weights from a different model variant"
                    % (i, list(arr.shape), shapes[i]))
            weights.append(jnp.asarray(arr))
        self.weights = tuple(weights)
        self.arch_fingerprint = self.manifest.get("arch_fingerprint")
        self._dir = out_dir
        self._fns = {}
        for name, meta in self.manifest["programs"].items():
            with open(os.path.join(out_dir, name), "rb") as fh:
                exp = jax.export.deserialize(fh.read())
            self._fns[tuple(meta["input_shape"])] = jax.jit(exp.call)
        self.pad_info = tuple(self.manifest["pad_info"])
        self.image_h, self.image_w = self.manifest["image_size"]
        self.pack_masks = self.manifest["pack_masks"]

    @property
    def input_shapes(self):
        return sorted(self._fns)

    def run_device(self, image):
        key = tuple(int(s) for s in image.shape)
        if key not in self._fns:
            raise KeyError("no exported program for input shape %s "
                           "(artifact has %s)" % (key, self.input_shapes))
        # The exported program was traced on uint8 input; a silent cast here
        # would truncate float [0,1] images to zeros. Mirror the live
        # pipeline's strictness: reject anything that isn't already uint8.
        if np.dtype(getattr(image, "dtype", np.float32)) != np.uint8:
            raise TypeError(
                "ServingModel.run_device expects a uint8 HWC image "
                f"(got dtype={getattr(image, 'dtype', type(image))}); "
                "pass the raw decoded image, not a normalized float one")
        return self._fns[key](self.weights, jnp.asarray(image))

    def to_host_list(self, device_out):
        out = jax.device_get(device_out)
        results = []
        for b in range(out["bbox"].shape[0]):
            n = int(out["valid"][b].sum())
            masks = out["mask"][b, :n]
            if self.pack_masks:
                from .ops.maskops import unpack_bits_np

                masks = unpack_bits_np(masks, self.image_w)
            results.append({"bbox": out["bbox"][b, :n], "mask": masks,
                            "cls": out["cls"][b, :n]})
        return results

    def __call__(self, image):
        return self.to_host_list(self.run_device(image)), self.pad_info


def load_serving(out_dir):
    return ServingModel(out_dir)
