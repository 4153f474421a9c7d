"""SGD with momentum + weight decay, torch-semantics, as pure functions.

torch.optim.SGD update (the recipe the reference trains with, config/base.py:240-245):
    d    = grad + weight_decay * param
    buf  = momentum * buf + d          (buf = d on the first step)
    param -= lr * buf

``lr`` is passed per step (the schedule runs per optimizer iteration on the host,
reference trainer/trainer.py:54).  Optional per-leaf factor trees implement
detectron2-style param groups and backbone freezing (factor 0).
"""

import jax
import jax.numpy as jnp


class SGD:
    def __init__(self, lr, momentum=0.0, weight_decay=0.0,
                 lr_factors=None, wd_factors=None, freeze_mask=None):
        self.base_lr = lr
        self.momentum = momentum
        self.weight_decay = weight_decay
        self.lr_factors = lr_factors      # pytree of scalars or None
        self.wd_factors = wd_factors      # pytree of scalars or None
        self.freeze_mask = freeze_mask    # pytree of bools (True = frozen) or None

    def init(self, params):
        return {
            "momentum": jax.tree_util.tree_map(jnp.zeros_like, params),
            "step": jnp.zeros((), jnp.int32),
        }

    def apply(self, params, grads, state, lr, update_gate=None):
        """Returns (new_params, new_state). ``lr`` is the already-scheduled rate.

        ``update_gate`` (scalar bool, optional): when False the whole update —
        param, momentum buffer AND step counter — is a no-op.  The gate is a
        per-element ``where`` fused into the one elementwise pass over the
        leaves, NOT a ``lax.cond``: a cond here costs ~1 ms/step on chip
        (fusion barrier around the branch), the fused selects are free.  Used
        by the train step's NaN guard (trainer/train_state.py)."""
        m = self.momentum
        first = state["step"] == 0
        gate = None if update_gate is None else jnp.asarray(update_gate)

        def leaf(p, g, buf, lrf, wdf, frozen):
            d = g + wdf * p
            new_buf = jnp.where(first, d, m * buf + d)
            upd = lr * lrf * new_buf
            if frozen:
                return p, jnp.zeros_like(buf)
            if gate is not None:
                return jnp.where(gate, p - upd, p), jnp.where(gate, new_buf, buf)
            return p - upd, new_buf

        lrf_tree = self.lr_factors or jax.tree_util.tree_map(lambda _: 1.0, params)
        wdf_tree = self.wd_factors or jax.tree_util.tree_map(
            lambda _: self.weight_decay, params
        )
        frz_tree = self.freeze_mask or jax.tree_util.tree_map(lambda _: False, params)

        flat_p, treedef = jax.tree_util.tree_flatten(params)
        flat_g = treedef.flatten_up_to(grads)
        flat_b = treedef.flatten_up_to(state["momentum"])
        flat_lrf = treedef.flatten_up_to(lrf_tree)
        flat_wdf = treedef.flatten_up_to(wdf_tree)
        flat_frz = treedef.flatten_up_to(frz_tree)

        new_p, new_b = [], []
        for p, g, b, lf, wf, fz in zip(flat_p, flat_g, flat_b, flat_lrf, flat_wdf, flat_frz):
            np_, nb = leaf(p, g, b, lf, wf, fz)
            new_p.append(np_)
            new_b.append(nb)
        step_inc = 1 if gate is None else gate.astype(jnp.int32)
        return (
            jax.tree_util.tree_unflatten(treedef, new_p),
            {"momentum": jax.tree_util.tree_unflatten(treedef, new_b),
             "step": state["step"] + step_inc},
        )
