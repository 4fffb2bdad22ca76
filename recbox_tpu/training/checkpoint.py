"""Checkpoint save/restore via flax msgpack serialization.

Carries the full training state {params, model_state, opt_state, step, epoch,
monitor} like recbole's checkpoint dict (`trainer/trainer.py:287-340`), vs the
reference first-party weights-only torch.save (`match_model.py:227-231`).
Atomic write (tmp + rename) so a preempted host never leaves a torn file —
the recovery story is checkpoint-resume + external re-exec (SURVEY §5.3).
"""

from __future__ import annotations

import os

from flax import serialization

__all__ = ["save_checkpoint", "load_checkpoint"]


def save_checkpoint(path: str, state: dict) -> None:
    import jax
    if jax.process_count() > 1 and jax.process_index() != 0:
        # multi-host discipline: only rank 0 writes (every process would
        # otherwise race on the same file — reference guard at
        # `third_party/recbole/trainer/trainer.py:294-295`). State passed
        # here must be host-replicated (Trainer state is; fully-sharded
        # global arrays need a process_allgather first).
        return
    dirname = os.path.dirname(os.path.abspath(path))
    os.makedirs(dirname, exist_ok=True)
    data = serialization.to_bytes(state)
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        fh.write(data)
        fh.flush()
        os.fsync(fh.fileno())   # data must be durable BEFORE the rename
    os.replace(tmp, path)
    # and the rename itself must be durable (directory entry)
    dfd = os.open(dirname, os.O_RDONLY)
    try:
        os.fsync(dfd)
    finally:
        os.close(dfd)


def load_checkpoint(path: str, template: dict) -> dict:
    """Restore into the shapes of ``template`` (a state dict of live arrays)."""
    with open(path, "rb") as fh:
        data = fh.read()
    return serialization.from_bytes(template, data)
