"""Cross-host evaluator reduction.

The reference relies on detectron2's distributed evaluators gathering python
state to rank 0 over torch.distributed (train_net.py:126-145).  Here every
evaluator exposes ``merge(other)``; this module all-gathers each process's
evaluator (pickled, padded to the max length) over the JAX global mesh and
merges the shards, so ``Trainer.test`` reports global metrics on every host.
Single-process runs short-circuit to a no-op.
"""

from __future__ import annotations

import pickle

import numpy as np


def merge_across_processes(evaluator):
    """All-gather evaluator state across JAX processes and merge in rank
    order.  Returns the (mutated) evaluator for convenience."""
    import jax

    if jax.process_count() == 1:
        return evaluator

    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(evaluator), dtype=np.uint8)
    n = np.int64(payload.size)
    max_n = int(multihost_utils.process_allgather(n).max())
    padded = np.zeros((max_n,), np.uint8)
    padded[: payload.size] = payload
    gathered = multihost_utils.process_allgather(padded)   # (procs, max_n)
    sizes = multihost_utils.process_allgather(n)

    merged = None
    for rank in range(gathered.shape[0]):
        other = pickle.loads(gathered[rank, : int(sizes[rank])].tobytes())
        if merged is None:
            merged = other
        else:
            merged.merge(other)
    # adopt the merged state in-place so callers keep their reference
    evaluator.__dict__.update(merged.__dict__)
    return evaluator
