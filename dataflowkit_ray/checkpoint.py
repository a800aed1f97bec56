"""Epoch checkpoints: {offsets, watermark, state snapshots, metrics}.

Layout::

    <ckpt_dir>/epoch=K/state-shard-<i>.bin   (pickled shard snapshot)
    <ckpt_dir>/epoch=K/meta.json             (written LAST, atomically)

A checkpoint exists iff its ``meta.json`` exists — a crash mid-write
leaves no half-checkpoint visible (same atomic-rename discipline as the
sink manifests).  The reference persists intermediate rows under
deterministic keys so encode can be redone (``/root/reference/
scrape/scrape.go:604``; SURVEY.md §4 "Checkpoint / resume"); the engine
checkpoints the *whole* cursor: offsets + watermark + keyed state.
"""

from __future__ import annotations

import json
import os
import pickle


def _fsync_dir(path: str) -> None:
    """fsync a directory so a just-renamed entry survives power loss —
    without this the data files can be durable while the rename is not,
    breaking 'checkpoint exists iff meta.json exists'."""
    fd = os.open(path, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)


def _atomic_write(path: str, data: bytes) -> None:
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)
    _fsync_dir(os.path.dirname(path) or ".")


class CheckpointStore:
    def __init__(self, ckpt_dir: str):
        self.dir = ckpt_dir
        os.makedirs(ckpt_dir, exist_ok=True)

    def _epoch_dir(self, epoch: int) -> str:
        return os.path.join(self.dir, f"epoch={epoch:05d}")

    def write(self, epoch: int, meta: dict, state_snaps: dict[str, list]) -> None:
        """``state_snaps``: name -> list of per-shard snapshot objects."""
        d = self._epoch_dir(epoch)
        os.makedirs(d, exist_ok=True)
        for name, snaps in state_snaps.items():
            for i, snap in enumerate(snaps):
                _atomic_write(
                    os.path.join(d, f"state-{name}-shard-{i}.bin"), pickle.dumps(snap)
                )
        meta = {**meta, "epoch": epoch, "state_names": {
            name: len(snaps) for name, snaps in state_snaps.items()
        }}
        _atomic_write(
            os.path.join(d, "meta.json"),
            json.dumps(meta, indent=1, sort_keys=True).encode(),
        )

    def latest(self) -> int | None:
        best = None
        if not os.path.isdir(self.dir):
            return None
        for name in os.listdir(self.dir):
            if not name.startswith("epoch="):
                continue
            if os.path.exists(os.path.join(self.dir, name, "meta.json")):
                e = int(name.split("=")[1])
                best = e if best is None else max(best, e)
        return best

    def read_meta(self, epoch: int) -> dict:
        with open(os.path.join(self._epoch_dir(epoch), "meta.json")) as f:
            return json.load(f)

    def read_state(self, epoch: int, name: str, n_shards: int) -> list:
        """Loads all shard snapshots; REFUSES a shard-count mismatch —
        silently loading fewer shards would drop keyed state and
        mis-route keys relative to the hash that wrote them."""
        meta = self.read_meta(epoch)
        written = meta.get("state_names", {}).get(name)
        if written is not None and written != n_shards:
            raise ValueError(
                f"checkpoint epoch {epoch} has {written} '{name}' shards; "
                f"resume requested {n_shards} — shard count must not change "
                "across a resume"
            )
        d = self._epoch_dir(epoch)
        out = []
        for i in range(n_shards):
            with open(os.path.join(d, f"state-{name}-shard-{i}.bin"), "rb") as f:
                out.append(pickle.load(f))
        return out

    def prune(self, keep_latest: int = 2) -> None:
        """Delete checkpoint dirs older than the newest ``keep_latest`` —
        only the latest is ever read, so disk stays O(state), not
        O(epochs x state)."""
        import shutil

        epochs = sorted(
            int(n.split("=")[1])
            for n in os.listdir(self.dir)
            if n.startswith("epoch=")
            and os.path.exists(os.path.join(self.dir, n, "meta.json"))
        )
        for e in epochs[:-keep_latest] if keep_latest else epochs:
            shutil.rmtree(self._epoch_dir(e), ignore_errors=True)
