"""Per-iteration LR schedules as pure step->lr functions (reference optim/lr_scheduler.py).

The reference steps its scheduler once per optimizer iteration (milestones are in
iterations, not epochs — SURVEY.md §7 quirks); here the trainer simply evaluates
``scheduler(step)`` on the host and feeds the value into the jitted train step.
"""

import bisect
import math


class WarmupLR:
    def __init__(self, warmup_type, warmup_iter, warmup_ratio):
        assert warmup_type in ("const", "linear", "power")
        self.type = warmup_type
        self.iter = warmup_iter
        self.ratio = warmup_ratio

    def get_warmup_lr(self, iters, base_lr):
        if self.type == "const":
            return base_lr * self.ratio
        if self.type == "linear":
            return base_lr * (self.ratio + (1 - self.ratio) * iters / self.iter)
        return base_lr * ((iters / self.iter) ** self.ratio)


class StepWarmUpLR:
    """Warmup below ``warmup_iter``, multi-step gamma decay after."""

    def __init__(self, warmup_type, warmup_iter, warmup_ratio, milestones,
                 gamma=0.1, base_lr=None):
        self.warmup = WarmupLR(warmup_type, warmup_iter, warmup_ratio)
        self.milestones = sorted(milestones)
        self.gamma = gamma
        self.base_lr = base_lr

    def __call__(self, step, base_lr=None):
        base_lr = base_lr if base_lr is not None else self.base_lr
        if step <= self.warmup.iter:
            return self.warmup.get_warmup_lr(step, base_lr)
        # Reference parity (optim/lr_scheduler.py:44-48): the stateful
        # MultiStepLR never resets the group lr after warmup, so the
        # post-warmup base is whatever the LAST warmup step set — base_lr for
        # 'linear'/'power' (both end at 1.0x), but base_lr*ratio forever for
        # 'const'.
        eff_base = self.warmup.get_warmup_lr(self.warmup.iter, base_lr)
        return eff_base * self.gamma ** bisect.bisect_right(self.milestones, step)

    def state_dict(self):
        return {"milestones": self.milestones, "gamma": self.gamma}


class PolyLR:
    def __init__(self, max_iter, power=0.9, base_lr=None):
        self.max_iter = max_iter
        self.power = power
        self.base_lr = base_lr

    def __call__(self, step, base_lr=None):
        base_lr = base_lr if base_lr is not None else self.base_lr
        # Clamp at 0 past max_iter: the reference's math.pow raises a domain
        # error on the negative base (optim/lr_scheduler.py:31) — a crash in
        # the final accumulate window when max_iter underestimates the true
        # iteration count. lr=0 is the only sensible continuation.
        return base_lr * math.pow(max(0.0, 1 - step / self.max_iter), self.power)

    def state_dict(self):
        return {"max_iter": self.max_iter, "power": self.power}
