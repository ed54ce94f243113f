"""Orbax checkpoint save/restore for the train state.

The TPU equivalent of the reference's Lightning ModelCheckpoint + DeepSpeed
ZeRO consolidation (SURVEY.md §5.4): sharded-array-aware save/restore of
{params, opt_state, step, rng} plus a JSON metadata sidecar
(epoch/sample counters — the reference persists these as buffers,
multiview_dust3r_module.py:91-98).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Tuple

import jax
import orbax.checkpoint as ocp


def save_train_state(path: str, state, meta: Dict[str, Any]) -> None:
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    payload = {
        "params": state.params,
        "opt_state": state.opt_state,
        "step": state.step,
        "rng": jax.random.key_data(state.rng),
    }
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)


def restore_train_state(path: str, template_state) -> Tuple[Any, Dict]:
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    template = {
        "params": template_state.params,
        "opt_state": template_state.opt_state,
        "step": template_state.step,
        "rng": jax.random.key_data(template_state.rng),
    }
    restored = ckptr.restore(path, template)
    state = type(template_state)(
        params=restored["params"],
        opt_state=restored["opt_state"],
        step=restored["step"],
        rng=jax.random.wrap_key_data(restored["rng"]),
    )
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    return state, meta
