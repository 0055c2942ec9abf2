"""Orbax checkpoint/resume for inverse-rendering optimization.

The reference has no persistent state at all (SURVEY.md §5 "Checkpoint:
none — everything rebuilt at startup"); here optimization state
(parameter pytree + optax state + step) saves/restores via Orbax so long
inverse runs survive restarts — the standard JAX training-state story.

Layout: <dir>/step_<N>/ Orbax PyTree checkpoints; restore_latest picks
the highest step.  Arrays restore with their saved shardings dropped
(single-host restore targets the default device); the sharded train path
re-annotates via jit in_shardings.
"""

from __future__ import annotations

import os
import re
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from vct_tpu.diff.inverse import OptimState

_STEP_RE = re.compile(r"^step_(\d+)$")


def _step_dir(directory: str, step: int) -> str:
    return os.path.join(os.path.abspath(directory), f"step_{step}")


def save(directory: str, state: OptimState) -> str:
    """Write one checkpoint; returns its path."""
    path = _step_dir(directory, state.step)
    ckptr = ocp.PyTreeCheckpointer()
    payload = {
        "params": state.params,
        "opt_state": state.opt_state,
        "step": np.asarray(state.step, np.int64),
    }
    ckptr.save(path, payload, force=True)
    return path


def available_steps(directory: str):
    if not os.path.isdir(directory):
        return []
    steps = []
    for name in os.listdir(directory):
        m = _STEP_RE.match(name)
        if m:
            steps.append(int(m.group(1)))
    return sorted(steps)


def restore(directory: str, step: int, template: OptimState) -> OptimState:
    """Restore one checkpoint shaped like `template`."""
    path = _step_dir(directory, step)
    ckptr = ocp.PyTreeCheckpointer()
    payload = {
        "params": template.params,
        "opt_state": template.opt_state,
        "step": np.asarray(template.step, np.int64),
    }
    restored = ckptr.restore(path, item=payload)
    return OptimState(
        params=jax.tree_util.tree_map(jax.numpy.asarray, restored["params"]),
        opt_state=jax.tree_util.tree_map(
            jax.numpy.asarray, restored["opt_state"]),
        step=int(restored["step"]),
    )


def restore_latest(directory: str,
                   template: OptimState) -> Optional[OptimState]:
    """Latest checkpoint in `directory`, or None if there is none."""
    steps = available_steps(directory)
    if not steps:
        return None
    return restore(directory, steps[-1], template)
