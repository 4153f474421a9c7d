"""Host-side augmentation pipeline (numpy + cv2) and the device-side fast transform.

Mirrors the reference transform semantics (data/transform.py): samples are dicts
``{'image': HxWx3 float32 RGB, 'bbox': (n,4) normalized cxcywh, 'cls': (n,),
'mask': [HxW uint8...], 'info': {...}}`` mutated through a Compose pipeline.
Differences from the reference are TPU-driven only:

  * ``ToArray`` replaces ``ToTensor``: output stays NHWC numpy (the TPU layout),
    instance order is shuffled exactly like the reference.
  * ``FastCOCOTransform`` is a *description* consumed by the fused jit inference
    pipeline (resize + normalize execute inside XLA, reference ran them on GPU).

Randomness uses a module-local ``numpy.random.Generator`` seeded per worker.
"""

import math

import cv2
import numpy as np

_INTERP = {
    "nearest": cv2.INTER_NEAREST,
    "linear": cv2.INTER_LINEAR,
    "area": cv2.INTER_AREA,
    "cubic": cv2.INTER_CUBIC,
    "lanczos4": cv2.INTER_LANCZOS4,
}


def _pair(x):
    return (x, x) if isinstance(x, (int, float)) else tuple(x)


class Compose:
    def __init__(self, transforms):
        self.transforms = list(transforms)

    def __call__(self, sample, rng):
        for t in self.transforms:
            sample = t(sample, rng)
        return sample


class BaseTransform:
    """Pipeline holder; ``seed`` / per-call rng threading for reproducibility."""

    def __init__(self, pipeline):
        self.pipeline = Compose(pipeline)
        self.rng = np.random.default_rng()

    def reseed(self, seed):
        self.rng = np.random.default_rng(seed)

    def __call__(self, sample, rng=None):
        return self.pipeline(sample, rng if rng is not None else self.rng)


# ----------------------------------------------------------------- image ops


def adjust_brightness(image, f):
    return np.clip(image * f, 0, 255)


def adjust_contrast(image, f):
    mean = cv2.cvtColor(image, cv2.COLOR_RGB2GRAY).mean()
    return np.clip(image * f + mean * (1 - f), 0, 255)


def adjust_saturation(image, f):
    gray = cv2.cvtColor(image, cv2.COLOR_RGB2GRAY)[..., None]
    return np.clip(image * f + gray * (1 - f), 0, 255)


def adjust_hue(image, f):
    hsv = cv2.cvtColor(image, cv2.COLOR_RGB2HSV)
    # clip (not circular wrap): saturates hue jitter near red — a reference
    # quirk preserved bit-for-bit (reference data/transform.py:43-46).
    hsv[..., 0] = np.clip(hsv[..., 0] + f * 360, 0, 360)
    return cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB)


def imresize(image, size_wh, interpolation):
    return cv2.resize(image, size_wh, interpolation=interpolation)


def impad(image, padding_tdlr, value=0.0):
    top, down, left, right = padding_tdlr
    return cv2.copyMakeBorder(image, top, down, left, right, cv2.BORDER_CONSTANT, value=value)


class COCOTransform(BaseTransform):
    class Normalize:
        def __init__(self, mean, std):
            self.mean = np.asarray(mean, np.float32)
            self.std = np.asarray(std, np.float32)

        def __call__(self, sample, rng):
            sample["image"] = (sample["image"] - self.mean) / self.std
            return sample

    class ColorJitter:
        def __init__(self, brightness=0, contrast=0, saturation=0, hue=0):
            self.brightness = self._range(brightness)
            self.contrast = self._range(contrast)
            self.saturation = self._range(saturation)
            self.hue = self._range(hue, center=0)

        @staticmethod
        def _range(v, center=1):
            if isinstance(v, (int, float)):
                if v == 0:
                    return None
                lo = max(center - v, 0) if center == 1 else center - v
                return (lo, center + v)
            return tuple(v) if v else None

        def __call__(self, sample, rng):
            ops = []
            if self.brightness:
                f = rng.uniform(*self.brightness)
                ops.append(lambda im: adjust_brightness(im, f))
            if self.contrast:
                f2 = rng.uniform(*self.contrast)
                ops.append(lambda im: adjust_contrast(im, f2))
            if self.saturation:
                f3 = rng.uniform(*self.saturation)
                ops.append(lambda im: adjust_saturation(im, f3))
            if self.hue:
                f4 = rng.uniform(*self.hue)
                ops.append(lambda im: adjust_hue(im, f4))
            order = rng.permutation(len(ops))
            img = sample["image"]
            for i in order:
                img = ops[i](img)
            sample["image"] = img
            return sample

    class RandomCrop:
        """IoU-bounded random crop keeping every box mostly inside
        (reference transform.py:218-276)."""

        def __init__(self, p=0.5, image_min_iou=0.64, bbox_min_iou=0.64):
            self.p = p
            self.image_max_ratio = image_min_iou ** 0.5
            self.bbox_max_ratio = bbox_min_iou ** 0.5

        def __call__(self, sample, rng):
            if rng.random() >= self.p:
                return sample
            height, width = sample["image"].shape[:2]
            if sample["bbox"].shape[0] == 0:
                left = int(rng.uniform(0, width * (1 - self.image_max_ratio)) + 0.5)
                right = int(rng.uniform(width * self.image_max_ratio, width) + 0.5)
                top = int(rng.uniform(0, height * (1 - self.image_max_ratio)) + 0.5)
                down = int(rng.uniform(height * self.image_max_ratio, height) + 0.5)
            else:
                bx, by, bw, bh = np.split(sample["bbox"], 4, axis=1)
                bx1, bx2 = (bx - bw / 2) * width, (bx + bw / 2) * width
                by1, by2 = (by - bh / 2) * height, (by + bh / 2) * height
                r = self.bbox_max_ratio
                b_left = (bx1 * r + bx2 * (1 - r)).min()
                b_right = (bx1 * (1 - r) + bx2 * r).max()
                b_top = (by1 * r + by2 * (1 - r)).min()
                b_down = (by1 * (1 - r) + by2 * r).max()
                left = int(rng.uniform(0, min(b_left, width * (1 - self.image_max_ratio))) + 0.5)
                right = int(rng.uniform(max(b_right, width * self.image_max_ratio), width) + 0.5)
                top = int(rng.uniform(0, min(b_top, height * (1 - self.image_max_ratio))) + 0.5)
                down = int(rng.uniform(max(b_down, height * self.image_max_ratio), height) + 0.5)

                nw, nh = right - left + 1, down - top + 1
                nx1 = np.maximum(bx1 - left, 0)
                nx2 = np.minimum(bx2 - left, nw)
                ny1 = np.maximum(by1 - top, 0)
                ny2 = np.minimum(by2 - top, nh)
                sample["bbox"] = np.hstack([
                    (nx1 + nx2) / 2 / nw, (ny1 + ny2) / 2 / nh,
                    (nx2 - nx1) / nw, (ny2 - ny1) / nh,
                ]).astype(np.float32)

            sample["image"] = sample["image"][top:down + 1, left:right + 1]
            if "mask" in sample:
                sample["mask"] = [m[top:down + 1, left:right + 1] for m in sample["mask"]]
            if "info" in sample:
                sample["info"]["crop"] = (top, down + 1, left, right + 1, height, width)
            return sample

    class Resize:
        """Letterbox resize with aspect jitter / random placement / random extra
        padding (reference transform.py:278-356); records ``info['pad']`` for the
        inverse mapping used by COCO eval."""

        def __init__(self, size, interpolation="linear", pad_needed=True, warp_p=0.,
                     jitter=0., random_place=False, pad_p=0., pad_ratio=0.,
                     pad_value=255 / 2):
            self.size = _pair(size)
            self.aspect_ratio = self.size[1] / self.size[0]
            self.interpolation = _INTERP[interpolation]
            self.pad_needed = pad_needed
            self.warp_p = warp_p
            self.jitter = jitter
            self.random_place = random_place
            self.pad_p = pad_p
            self.pad_ratio = pad_ratio
            self.pad_value = pad_value

        def __call__(self, sample, rng):
            h, w = self.size
            if self.pad_needed and rng.random() > self.warp_p:
                oh, ow = sample["image"].shape[:2]
                dh, dw = oh * self.jitter, ow * self.jitter
                new_ar = (ow + rng.uniform(-dw, dw)) / (oh + rng.uniform(-dh, dh))
                if new_ar < self.aspect_ratio:
                    nh = int(h * (1 - rng.uniform(0, self.pad_ratio)) + 0.5) \
                        if rng.random() < self.pad_p else h
                    nw = int(nh * new_ar + 0.5)
                else:
                    nw = int(w * (1 - rng.uniform(0, self.pad_ratio)) + 0.5) \
                        if rng.random() < self.pad_p else w
                    nh = int(nw / new_ar + 0.5)
                pad_left = int(rng.uniform(0, w - nw) + 0.5) if self.random_place \
                    else int((w - nw) / 2 + 0.5)
                pad_top = int(rng.uniform(0, h - nh) + 0.5) if self.random_place \
                    else int((h - nh) / 2 + 0.5)
                pad_right, pad_down = w - nw - pad_left, h - nh - pad_top

                bb = sample["bbox"]
                if bb.shape[0]:
                    bb[:, 0] = (bb[:, 0] * nw + pad_left) / w
                    bb[:, 1] = (bb[:, 1] * nh + pad_top) / h
                    bb[:, 2] = bb[:, 2] * nw / w
                    bb[:, 3] = bb[:, 3] * nh / h
                padding = (pad_top, pad_down, pad_left, pad_right)
                img = imresize(sample["image"], (nw, nh), self.interpolation)
                sample["image"] = impad(img, padding, self.pad_value)
                if "mask" in sample:
                    sample["mask"] = [
                        impad(imresize(m, (nw, nh), cv2.INTER_NEAREST), padding, 0)
                        for m in sample["mask"]
                    ]
                if "info" in sample:
                    sample["info"]["pad"] = padding + (h, w)
            else:
                sample["image"] = imresize(sample["image"], (w, h), self.interpolation)
                if "mask" in sample:
                    sample["mask"] = [imresize(m, (w, h), cv2.INTER_NEAREST)
                                      for m in sample["mask"]]
            return sample

    class RandomHorizontalFlip:
        def __init__(self, p=0.5):
            self.p = p

        def __call__(self, sample, rng):
            if rng.random() < self.p:
                sample["image"] = np.flip(sample["image"], axis=1)
                if sample["bbox"].shape[0]:
                    sample["bbox"][:, 0] = 1 - sample["bbox"][:, 0]
                if "mask" in sample:
                    sample["mask"] = [np.flip(m, axis=1) for m in sample["mask"]]
                if "info" in sample:
                    sample["info"]["hflip"] = True
            return sample

    class RandomVerticalFlip:
        def __init__(self, p=0.5):
            self.p = p

        def __call__(self, sample, rng):
            if rng.random() < self.p:
                sample["image"] = np.flip(sample["image"], axis=0)
                if sample["bbox"].shape[0]:
                    sample["bbox"][:, 1] = 1 - sample["bbox"][:, 1]
                if "mask" in sample:
                    sample["mask"] = [np.flip(m, axis=0) for m in sample["mask"]]
                if "info" in sample:
                    sample["info"]["vflip"] = True
            return sample

    class ShortEdgeResize:
        def __init__(self, short_length, max_size, interpolation="linear"):
            self.short_length = short_length
            self.max_size = max_size
            self.interpolation = _INTERP[interpolation]

        def __call__(self, sample, rng):
            h, w = sample["image"].shape[:2]
            size = rng.choice(self.short_length)
            scale = min(size / min(h, w), self.max_size / max(h, w))
            nh, nw = int(h * scale + 0.5), int(w * scale + 0.5)
            sample["image"] = imresize(sample["image"], (nw, nh), self.interpolation)
            if "mask" in sample:
                sample["mask"] = [imresize(m, (nw, nh), cv2.INTER_NEAREST)
                                  for m in sample["mask"]]
            return sample

    class Pad:
        """Pad to size_divisor; adjusts normalized boxes and records the inverse."""

        def __init__(self, size_divisor=32, pad_value=255 / 2):
            self.size_divisor = size_divisor
            self.pad_value = pad_value

        def __call__(self, sample, rng):
            height, width = sample["image"].shape[:2]
            nh = int(math.ceil(height / self.size_divisor) * self.size_divisor)
            nw = int(math.ceil(width / self.size_divisor) * self.size_divisor)
            pad_left, pad_top = (nw - width) // 2, (nh - height) // 2
            pad_right, pad_down = nw - width - pad_left, nh - height - pad_top
            bb = sample["bbox"]
            if bb.shape[0]:
                bb[:, 0] = (bb[:, 0] * width + pad_left) / nw
                bb[:, 1] = (bb[:, 1] * height + pad_top) / nh
                bb[:, 2] = bb[:, 2] * width / nw
                bb[:, 3] = bb[:, 3] * height / nh
            padding = (pad_top, pad_down, pad_left, pad_right)
            sample["image"] = impad(sample["image"], padding, self.pad_value)
            if "mask" in sample:
                sample["mask"] = [impad(m, padding, 0) for m in sample["mask"]]
            if "info" in sample:
                sample["info"]["pad"] = padding + (nh, nw)
            return sample

    class ToArray:
        """Finalize: contiguous float32 image, shuffled instances, bool mask stack."""

        def __call__(self, sample, rng):
            sample["image"] = np.ascontiguousarray(sample["image"], np.float32)
            n = sample["bbox"].shape[0]
            shuffle = rng.permutation(n)
            sample["bbox"] = np.asarray(sample["bbox"], np.float32)[shuffle]
            sample["cls"] = np.asarray(sample["cls"], np.int64)[shuffle]
            if "mask" in sample:
                if n:
                    sample["mask"] = np.stack(
                        [np.ascontiguousarray(m) > 0 for m in sample["mask"]]
                    )[shuffle]
                else:
                    sample["mask"] = np.zeros((0, *sample["image"].shape[:2]), bool)
            return sample


class FastCOCOTransform:
    """Device-side inference transform description: the jit pipeline reads
    ``size``/``mean``/``std`` and fuses resize+normalize into the forward program."""

    def __init__(self, pipeline, use_cuda=None):
        self.size = None
        self.interpolation = "bilinear"
        self.align_corners = False
        self.mean = np.zeros(3, np.float32)
        self.std = np.ones(3, np.float32)
        for item in pipeline:
            if isinstance(item, dict):
                kind, kw = item["type"], {k: v for k, v in item.items() if k != "type"}
            else:
                kind, kw = item
            if kind == "Resize":
                self.size = _pair(kw["size"])
                self.interpolation = kw.get("interpolation", "bilinear")
                if self.interpolation != "bilinear":
                    raise ValueError(
                        "FastCOCOTransform only implements bilinear resize; "
                        f"got interpolation={self.interpolation!r}")
                self.align_corners = kw.get("align_corners", False)
            elif kind == "Normalize":
                self.mean = np.asarray(kw["mean"], np.float32)
                self.std = np.asarray(kw["std"], np.float32)
            else:
                raise ValueError(f"FastCOCOTransform: unsupported op {kind}")

    def apply(self, image):
        """image: (B, H, W, 3) float array (jnp) -> resized+normalized (B, h, w, 3)."""
        import jax.numpy as jnp

        from ..models.layers import bilinear_resize

        h, w = self.size
        x = bilinear_resize(image, h, w, self.align_corners)
        return (x - jnp.asarray(self.mean)) / jnp.asarray(self.std)
