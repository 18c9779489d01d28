"""Training state, schedules, and orbax checkpointing.

Rebuild of the reference's state handling (bhnerf/network.py:171-189 uses
flax TrainState + flax.training.checkpoints + jax_utils.replicate). Here:

* `TrainState` is a minimal pytree dataclass (params + optax state + step)
  — no replication step: under jit + NamedSharding the partitioner keeps
  params replicated across the mesh automatically;
* checkpoints are orbax (the current-jax replacement for flax checkpoints,
  SURVEY.md §2.3 row 3), directory layout `checkpoint_<step>` mirroring
  the reference so sweep-resume logic (alma.py:109) ports unchanged;
* optax adam + polynomial lr schedule, with the optional separate
  t_injection learning rate via optax.masked (network.py:176-180).
"""
from __future__ import annotations

import dataclasses
import functools
import os
import re
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class TrainState:
    step: Any
    params: Any
    opt_state: Any
    tx: Any  # optax GradientTransformation (aux / static)

    def tree_flatten(self):
        return ((self.step, self.params, self.opt_state), self.tx)

    @classmethod
    def tree_unflatten(cls, tx, children):
        return cls(*children, tx)

    @classmethod
    def create(cls, params, tx):
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=tx.init(params), tx=tx)

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state,
                                                self.params)
        new_params = optax.apply_updates(self.params, updates)
        return TrainState(self.step + 1, new_params, new_opt_state, self.tx)


@functools.lru_cache(maxsize=256)
def make_optimizer(num_iters=5000, lr_init=1e-4, lr_final=1e-6,
                   lr_inject=None):
    """adam + polynomial schedule (reference network.py:171-180).

    Cached: the returned GradientTransformation rides in TrainState's
    pytree AUX, so jitted steps specialize on its identity — handing out
    one object per unique schedule avoids silent recompiles (e.g.
    alma.chi2_df restoring dozens of checkpoints, or warmup-vs-run state
    pairs). optax transforms are stateless, sharing is safe."""
    lr = optax.polynomial_schedule(lr_init, lr_final, 1, num_iters)
    tx = optax.adam(learning_rate=lr)
    if lr_inject:
        def make_mask(match):
            def mask(tree):
                flat = _flatten_dict(tree)
                out = {k: match(k) for k in flat}
                return _unflatten_dict(out)
            return mask

        tx = optax.chain(
            optax.masked(optax.adam(learning_rate=lr_inject),
                         mask=make_mask(lambda k: k[-1] == 't_injection')),
            optax.masked(tx,
                         mask=make_mask(lambda k: k[-1] != 't_injection')),
        )
    return tx


def _flatten_dict(d, prefix=()):
    out = {}
    for k, v in d.items():
        if isinstance(v, dict):
            out.update(_flatten_dict(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def _unflatten_dict(flat):
    out = {}
    for path, v in flat.items():
        node = out
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = v
    return out


# ---------------------------------------------------------------------------
# Checkpointing (orbax)
# ---------------------------------------------------------------------------
_CKPT_RE = re.compile(r'^checkpoint_(\d+)$')


def latest_checkpoint_step(checkpoint_dir):
    checkpoint_dir = Path(checkpoint_dir)
    if not checkpoint_dir.is_dir():
        return None
    steps = [int(m.group(1)) for p in checkpoint_dir.iterdir()
             if (m := _CKPT_RE.match(p.name))]
    return max(steps) if steps else None


def save_checkpoint(checkpoint_dir, state: TrainState, step, keep=5):
    """Save params/opt_state/step under checkpoint_<step>
    (reference optimization.py:118-121 semantics).

    Multi-host: orbax `save` is a COLLECTIVE (internal
    sync_global_processes), so EVERY process must call it — orbax's
    primary-host logic makes process 0 the sole filesystem writer for
    the replicated params/opt_state (verified by the real 2-process
    integration test; a process-0-only early return deadlocks the save).
    REQUIREMENT: checkpoint_dir must be on a filesystem shared by every
    host (GCS/NFS) — restore_checkpoint runs on all processes and
    asserts they agree on the latest step, so a host-local path fails
    loudly at resume instead of desyncing."""
    import orbax.checkpoint as ocp
    checkpoint_dir = Path(checkpoint_dir).absolute()
    checkpoint_dir.mkdir(parents=True, exist_ok=True)
    payload = {
        'step': np.asarray(jax.device_get(state.step)),
        'params': jax.device_get(state.params),
        'opt_state': jax.device_get(state.opt_state),
    }
    path = checkpoint_dir / f'checkpoint_{int(step)}'
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, payload, force=True)
    # prune old checkpoints (process 0 only — concurrent rmtree of the
    # same paths would race); keep <= 0 keeps everything (steps[:-0]
    # would otherwise prune nothing for 0 but delete the NEWEST for
    # negative values)
    if jax.process_count() > 1 and jax.process_index() != 0:
        return
    if keep > 0:
        steps = sorted(int(m.group(1)) for p in checkpoint_dir.iterdir()
                       if (m := _CKPT_RE.match(p.name)))
        import shutil
        for old in steps[:-keep]:
            shutil.rmtree(checkpoint_dir / f'checkpoint_{old}',
                          ignore_errors=True)


def _assert_step_agreement(step):
    """Multi-host guard: every process must see the SAME latest
    checkpoint step. save_checkpoint writes on process 0 only, so
    checkpoint_dir MUST be on a filesystem shared by all hosts (GCS /
    NFS); without it, non-zero processes restore nothing while process 0
    resumes, and the SPMD step desyncs into a silent hang. Fail loudly
    instead."""
    if jax.process_count() <= 1:
        return
    from jax.experimental import multihost_utils
    local = np.asarray([-1 if step is None else int(step)], np.int64)
    everyone = np.asarray(multihost_utils.process_allgather(local)).ravel()
    if len(set(everyone.tolist())) > 1:
        raise RuntimeError(
            'checkpoint step disagrees across hosts: '
            f'{everyone.tolist()} (process {jax.process_index()} sees '
            f'{local[0]}). checkpoint_dir must live on a filesystem '
            'shared by ALL hosts (process 0 is the only writer); a '
            'host-local path desyncs resume and would hang the SPMD '
            'program.')


def restore_checkpoint(checkpoint_dir, state: TrainState):
    """Restore the latest checkpoint into `state` (no-op when none exists,
    mirroring flax restore_checkpoint semantics at network.py:184-189).

    Multi-host: asserts all processes agree on the latest step —
    checkpoint_dir must be a shared filesystem (see save_checkpoint)."""
    import orbax.checkpoint as ocp
    step = latest_checkpoint_step(checkpoint_dir)
    _assert_step_agreement(step)
    if step is None:
        return state
    path = Path(checkpoint_dir).absolute() / f'checkpoint_{step}'
    template = {
        'step': np.asarray(jax.device_get(state.step)),
        'params': jax.device_get(state.params),
        'opt_state': jax.device_get(state.opt_state),
    }
    with ocp.PyTreeCheckpointer() as ckptr:
        payload = ckptr.restore(path, item=template)
    return TrainState(jnp.asarray(payload['step']), payload['params'],
                      payload['opt_state'], state.tx)


def restore_params(checkpoint_dir, params_template=None):
    """Restore only params from the latest checkpoint
    (reference network.py:842-848 reads raw checkpoint dicts)."""
    import orbax.checkpoint as ocp
    step = latest_checkpoint_step(checkpoint_dir)
    if step is None:
        raise FileNotFoundError(f'no checkpoint under {checkpoint_dir}')
    path = Path(checkpoint_dir).absolute() / f'checkpoint_{step}'
    with ocp.PyTreeCheckpointer() as ckptr:
        payload = ckptr.restore(path)
    return payload['params']
