"""Pregel-style connected-components shards: the actor-BSP execution
path of :func:`~dataflowkit_ray.stages.dedup.dedup_clusters`.

The Dataset formulation of hash-min label propagation pays two sort
exchanges plus a plan per ROUND (~3 s of fixed cost per round at any
data size — measured at sf0.01); rounds are diameter-many, so the loop
is pure coordination overhead at small scale and an avoidable 2x
exchange tax at large scale.  The engine already has the right
machinery for iterative keyed state: shard actors with vectorized
numpy state and Arrow-IPC messaging (``state/store.py``).  Here each
shard owns the nodes with ``hash(node) % n_shards == i`` — their label
and adjacency (CSR) — and a round is:

  1. every shard PROPOSES min(label[u]) to each neighbor v of its own
     nodes u, bucketing proposals by v's owner and shipping ONE Arrow
     blob per peer (actor-to-actor; the driver moves nothing);
  2. every shard APPLIES the min over its nodes' received proposals;
  3. the driver sums per-shard label totals (n_shards ints) — labels
     are monotone nonincreasing, so an unchanged global sum is the
     fixpoint.

Per round: one vectorized pass over the shard's edges + peer messages
sized by the cut edges — no sorts, no query plans, no driver data.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from dataflowkit_ray.state.store import bytes_to_table, np_int64, table_to_bytes


def _mod_shard(x: np.ndarray, n: int) -> np.ndarray:
    # nodes are int64 ids (non-negative in practice); mix the bits so
    # sequential ids spread even when n divides their stride
    h = x.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    return (h % np.uint64(n)).astype(np.int64)


@ray.remote
class CCShard:
    def __init__(self, shard_i: int, n_shards: int):
        self.i = shard_i
        self.n = n_shards
        self._node_chunks: list[np.ndarray] = []
        self._edge_chunks: list[tuple[np.ndarray, np.ndarray]] = []
        self.nodes: np.ndarray | None = None  # sorted own node ids
        self.labels: np.ndarray | None = None
        self.adj_ptr: np.ndarray | None = None  # CSR over self.nodes
        self.adj: np.ndarray | None = None
        self.inbox: list[bytes] = []
        self.peers: list | None = None

    def reset(self, *args) -> None:
        self.__init__(*args)

    def set_peers(self, peers: list) -> None:
        self.peers = peers

    # ------------------------------------------------------------ build

    def add_nodes(self, blob: bytes) -> None:
        self._node_chunks.append(np_int64(bytes_to_table(blob)["node"]))

    def add_edges(self, blob: bytes) -> None:
        t = bytes_to_table(blob)
        self._edge_chunks.append((np_int64(t["node"]), np_int64(t["nbr"])))

    def build(self) -> int:
        """Freeze staged chunks into sorted nodes + CSR adjacency."""
        self.nodes = (
            np.unique(np.concatenate(self._node_chunks))
            if self._node_chunks
            else np.empty(0, np.int64)
        )
        self.labels = self.nodes.copy()
        if self._edge_chunks:
            u = np.concatenate([c[0] for c in self._edge_chunks])
            v = np.concatenate([c[1] for c in self._edge_chunks])
            order = np.argsort(u, kind="stable")
            u, v = u[order], v[order]
            # edges whose endpoint is not a known node are dropped (the
            # ids stream defines the universe, as in the Dataset path);
            # guard the empty-shard case — fancy-indexing an empty node
            # array with the clamped position crashes
            if len(self.nodes) == 0:
                ok = np.zeros(len(u), dtype=bool)
                pos = np.zeros(len(u), dtype=np.int64)
            else:
                pos = np.searchsorted(self.nodes, u)
                ok = (pos < len(self.nodes)) & (
                    self.nodes[np.minimum(pos, len(self.nodes) - 1)] == u
                )
            u, v, pos = u[ok], v[ok], pos[ok]
            counts = np.bincount(pos, minlength=len(self.nodes))
            self.adj_ptr = np.concatenate(([0], np.cumsum(counts))).astype(np.int64)
            self.adj = v
        else:
            self.adj_ptr = np.zeros(len(self.nodes) + 1, dtype=np.int64)
            self.adj = np.empty(0, np.int64)
        self._node_chunks = []
        self._edge_chunks = []
        return int(self.labels.sum())

    # ------------------------------------------------------------ rounds

    def propose(self) -> list:
        """Compute min-label proposals (v, label[u]) for the neighbors
        of this shard's nodes, ship one Arrow blob per peer with any
        traffic, and return the delivery ack REFS (never ray.get them
        here: every shard proposes concurrently and a shard blocked in
        propose cannot serve a peer's recv — the DRIVER is the BSP
        barrier, collecting n_shards ref lists)."""
        deg = np.diff(self.adj_ptr)
        lab = np.repeat(self.labels, deg)
        v = self.adj
        if len(v) == 0:
            return []
        # only proposals that could lower something are worth shipping
        keep = lab < v  # label[u] >= v can never lower v's label below v
        v, lab = v[keep], lab[keep]
        if len(v) == 0:
            return []
        owner = _mod_shard(v, self.n)
        order = np.argsort(owner, kind="stable")
        v, lab, owner = v[order], lab[order], owner[order]
        bnd = np.searchsorted(owner, np.arange(self.n + 1))
        refs = []
        for p in range(self.n):
            s, e = bnd[p], bnd[p + 1]
            if s == e:
                continue
            blob = table_to_bytes(
                pa.table({"node": pa.array(v[s:e]), "label": pa.array(lab[s:e])})
            )
            if p == self.i:
                # a call to self would also deadlock — apply locally
                self.inbox.append(blob)
            else:
                refs.append(self.peers[p].recv.remote(blob))
        return refs

    def recv(self, blob: bytes) -> None:
        self.inbox.append(blob)

    def apply(self) -> int:
        """Fold inbox proposals into labels; returns the shard's label
        sum (the driver's fixpoint check is the global sum)."""
        if self.inbox:
            t = pa.concat_tables([bytes_to_table(b) for b in self.inbox])
            self.inbox = []
            v = np_int64(t["node"])
            lab = np_int64(t["label"])
            if len(self.nodes) == 0:
                return 0
            pos = np.searchsorted(self.nodes, v)
            ok = (pos < len(self.nodes)) & (
                self.nodes[np.minimum(pos, len(self.nodes) - 1)] == v
            )
            v_pos, lab = pos[ok], lab[ok]
            if len(v_pos):
                order = np.lexsort((lab, v_pos))
                v_pos, lab = v_pos[order], lab[order]
                first = np.ones(len(v_pos), dtype=bool)
                first[1:] = v_pos[1:] != v_pos[:-1]
                np.minimum.at(  # first per node is its min proposal
                    self.labels, v_pos[first], lab[first]
                )
        return int(self.labels.sum()) if len(self.labels) else 0

    def emit(self) -> bytes:
        return table_to_bytes(
            pa.table(
                {"node": pa.array(self.nodes), "label": pa.array(self.labels)}
            )
        )

    def emit_ref(self):
        """Put this shard's label table in the object store and return
        the ref — the driver assembles ``from_arrow_refs`` without the
        rows ever leaving the store."""
        return ray.put(
            pa.table(
                {"node": pa.array(self.nodes), "label": pa.array(self.labels)}
            )
        )

    def emit_to_sink(self, parts_dir: str, epoch: int, part_idx: int) -> dict | None:
        from dataflowkit_ray.sinks.exactly_once import write_sink_part

        if self.nodes is None or len(self.nodes) == 0:
            return None
        return write_sink_part(
            parts_dir,
            epoch,
            part_idx,
            pa.table(
                {"node": pa.array(self.nodes), "label": pa.array(self.labels)}
            ),
        )
