"""Debug-mode helpers (SURVEY.md §5.2 rebuild plan).

The reference's only anomaly tooling is a commented-out
``torch.autograd.detect_anomaly()`` and NaN guards; here debug mode is first
class: ``jax_debug_nans`` flag plus a checkify wrapper that verifies loss
finiteness *inside* the compiled step with precise error locations.
"""

import jax


def enable_nan_debugging(enable=True):
    """Global NaN trap: any nan produced under jit raises with a traceback."""
    jax.config.update("jax_debug_nans", enable)


def checked(fn):
    """Wrap a jittable function with checkify float checks.

    Returns ``checked_fn(*args) -> (error, out)``; call ``error.throw()`` on the
    host to raise with the offending primitive's location.
    """
    from jax.experimental import checkify

    return checkify.checkify(fn, errors=checkify.float_checks)


def assert_finite_tree(tree, name="tree"):
    """Host-side finite check over a pytree (debug/testing)."""
    import numpy as np

    leaves = jax.tree_util.tree_leaves(tree)
    for i, leaf in enumerate(leaves):
        arr = np.asarray(leaf)
        if not np.all(np.isfinite(arr)):
            raise FloatingPointError(
                f"{name}: leaf {i} contains non-finite values "
                f"(nan={np.isnan(arr).sum()}, inf={np.isinf(arr).sum()})"
            )
