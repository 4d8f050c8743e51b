"""Debug / failure-detection utilities.

The reference's failure story is pervasive inline NaN/Inf asserts
(SURVEY.md §4) and nothing else. Equivalents here, compatible with jit:

- :func:`enable_nan_checks` — global ``jax_debug_nans`` (every jitted op
  re-run un-jitted on NaN, raising at the producing op).
- :func:`assert_finite` — pytree finiteness check via ``checkify``-free
  host callback, usable inside jitted code in debug builds.
- :func:`check_finite_tree` — host-side check for train-loop use.
- :class:`FailureDetector` — wraps the train step; on non-finite loss or
  gradient norm it dumps diagnostics and (optionally) restores the last
  checkpoint instead of continuing with a poisoned state.
"""

from __future__ import annotations

import logging
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


def enable_nan_checks(enable: bool = True):
    jax.config.update("jax_debug_nans", enable)


def assert_finite(tree: Any, name: str = "value"):
    """Inside-jit finiteness guard (debug builds): aborts with a message when
    any leaf contains NaN/Inf."""

    def _chk(path, x):
        if not jnp.issubdtype(x.dtype, jnp.floating):
            return
        ok = jnp.isfinite(x).all()

        def _cb(ok_val):
            if not bool(ok_val):
                raise FloatingPointError(
                    f"non-finite values in {name}{jax.tree_util.keystr(path)}"
                )

        jax.debug.callback(_cb, ok)

    jax.tree_util.tree_map_with_path(_chk, tree)


def check_finite_tree(tree: Any) -> bool:
    return all(
        np.isfinite(np.asarray(x)).all()
        for x in jax.tree_util.tree_leaves(tree)
        if np.issubdtype(np.asarray(x).dtype, np.floating)
    )


class FailureDetector:
    """Detects training divergence from step metrics.

    ``update`` returns True when the step is healthy. After ``patience``
    consecutive unhealthy steps the run should be restored from the last good
    checkpoint (the caller decides; this class only detects and counts).
    """

    def __init__(self, patience: int = 1, grad_norm_limit: float = 1e4):
        self.patience = patience
        self.grad_norm_limit = grad_norm_limit
        self.consecutive_bad = 0
        self.total_bad = 0

    def update(self, metrics: dict) -> bool:
        loss = float(metrics.get("live_loss", 0.0))
        gnorm = float(metrics.get("grad_norm", 0.0))
        healthy = np.isfinite(loss) and np.isfinite(gnorm) and (
            gnorm < self.grad_norm_limit
        )
        if healthy:
            self.consecutive_bad = 0
        else:
            self.consecutive_bad += 1
            self.total_bad += 1
            logger.warning(
                "unhealthy step: loss=%s grad_norm=%s (%d consecutive)",
                loss, gnorm, self.consecutive_bad,
            )
        return self.consecutive_bad < self.patience
