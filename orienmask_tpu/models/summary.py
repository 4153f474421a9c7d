"""Network summary (reference BaseModel.summary / torchsummary, model/base.py:21-25).

Shape-only: uses ``jax.eval_shape`` so no parameters are materialized and no
device compute runs — instant even for the full 544x544 model.
"""

import jax
import jax.numpy as jnp
import numpy as np


def _count(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))


def model_summary(model, input_shape=(1, 544, 544, 3), print_fn=print):
    """Print per-module parameter counts and output shapes; returns totals."""
    params_s, stats_s = jax.eval_shape(model.init, jax.random.PRNGKey(0))

    rows = []
    total = 0
    for name in model._module_names():
        n = _count(params_s[name])
        rows.append((name, n))
        total += n
    stats_total = _count(stats_s)

    x = jax.ShapeDtypeStruct(tuple(input_shape), jnp.float32)
    from .layers import default_ctx

    out, _ = jax.eval_shape(
        lambda p, s, im: model.apply(p, s, im, default_ctx()), params_s, stats_s, x
    )
    out_shapes = jax.tree_util.tree_map(lambda o: tuple(o.shape), out)

    width = max(len(r[0]) for r in rows)
    print_fn(f"[{type(model).__name__}] Network Summary  (input {tuple(input_shape)})")
    print_fn("-" * (width + 20))
    for name, n in rows:
        print_fn(f"{name:<{width}}  {n:>14,}")
    print_fn("-" * (width + 20))
    print_fn(f"{'total params':<{width}}  {total:>14,}")
    print_fn(f"{'batch-norm stats':<{width}}  {stats_total:>14,}")
    print_fn(f"outputs: {out_shapes}")
    return {"params": total, "batch_stats": stats_total, "outputs": out_shapes}
