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

__all__ = ["save_checkpoint", "load_checkpoint", "OrbaxCheckpointer"]


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


class OrbaxCheckpointer:
    """Async, sharded checkpointing via orbax (SURVEY §5.4's "orbax-style
    sharded async checkpoint of params+optimizer" upgrade over the
    reference's synchronous torch.save, `trainer.py:287-310`).

    Saves run in a background thread (training continues while bytes land);
    sharded jax.Arrays are written per-shard without host gathering, so
    multi-host pods checkpoint tables that no single host could hold.
    Drop-in alternative to save_checkpoint/load_checkpoint:

        ckpt = OrbaxCheckpointer()
        ckpt.save(dir_path, trainer_state)      # returns immediately
        ckpt.wait()                             # barrier before exit
        state = ckpt.load(dir_path, template)
    """

    def __init__(self):
        import orbax.checkpoint as ocp
        self._ocp = ocp
        self._ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
        # meta JSON staged per save, committed only once the matching async
        # array snapshot is durable — otherwise a crash mid-flight leaves
        # NEW step/epoch meta paired with the PREVIOUS (or no) arrays and a
        # resume restores mismatched state
        self._pending_meta = None          # (tmp_path, final_path)

    @staticmethod
    def _split(state: dict):
        """Orbax handles pytrees of arrays; ints/None metadata ride JSON."""
        arrays, meta = {}, {}
        for k, v in state.items():
            if isinstance(v, (int, float, str)) or v is None:
                meta[k] = v
            else:
                arrays[k] = v
        return arrays, meta

    def _commit_pending_meta(self) -> None:
        if self._pending_meta is not None:
            tmp, final = self._pending_meta
            self._pending_meta = None
            if os.path.exists(tmp):
                os.replace(tmp, final)

    def save(self, directory: str, state: dict) -> None:
        import json
        directory = os.path.abspath(directory)
        arrays, meta = self._split(state)
        import jax
        # AsyncCheckpointer.save waits for any in-flight save before
        # starting the new one — so once it returns, the PREVIOUS snapshot
        # is durable and its staged meta can commit.
        self._ckptr.save(directory, args=self._ocp.args.StandardSave(arrays),
                         force=True)
        self._commit_pending_meta()
        if jax.process_count() == 1 or jax.process_index() == 0:
            os.makedirs(directory + ".meta", exist_ok=True)
            tmp = directory + ".meta/state.json.tmp"
            with open(tmp, "w") as fh:
                json.dump(meta, fh)
            # staged, NOT committed: the matching array save is still in
            # flight; commit happens at wait() or the next save()
            self._pending_meta = (tmp, directory + ".meta/state.json")

    def wait(self) -> None:
        self._ckptr.wait_until_finished()
        self._commit_pending_meta()

    def load(self, directory: str, template: dict) -> dict:
        import json
        # same-process save()->load(): the async save must finish AND its
        # staged meta commit before we read, or we would pair the new
        # arrays with template/stale meta. (Cross-process crash recovery
        # deliberately falls back to template meta below: a .tmp meta on
        # disk may belong to an array save that never committed, and
        # stale-meta-with-newer-arrays only re-trains a little, while
        # new-meta-with-old-arrays resumes wrong.)
        self.wait()
        directory = os.path.abspath(directory)
        arrays_t, meta_t = self._split(template)
        restored = self._ckptr.restore(
            directory, args=self._ocp.args.StandardRestore(arrays_t))
        out = dict(restored)
        meta_path = directory + ".meta/state.json"
        if os.path.exists(meta_path):
            with open(meta_path) as fh:
                out.update(json.load(fh))
        else:
            out.update(meta_t)
        return out

    def close(self) -> None:
        self._ckptr.close()            # waits for in-flight saves
        self._commit_pending_meta()
