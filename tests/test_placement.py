"""Multi-node readiness: shard pools must SPREAD across nodes.

The real target is a multi-node cluster this sandbox cannot start, so
the spread assertion runs against a SIMULATED two-node cluster
(``ray.cluster_utils.Cluster`` — two raylets, two object stores, one
machine) in a subprocess, keeping the session-scoped single-node Ray
fixture of the other tests untouched.
"""

import subprocess
import sys

_TWO_NODE_SCRIPT = """
import ray
from ray.cluster_utils import Cluster

cluster = Cluster(
    initialize_head=True,
    head_node_args={"num_cpus": 2, "include_dashboard": False},
)
cluster.add_node(num_cpus=2)
ray.init(address=cluster.address, include_dashboard=False, logging_level="ERROR")
try:
    assert len(ray.nodes()) == 2, ray.nodes()

    from dataflowkit_ray.state.store import WindowStateShard, shard_pool

    pool = shard_pool(WindowStateShard, "placement_test", 4, ["m"])
    nodes = ray.get([s.where.remote() for s in pool])
    distinct = len(set(nodes))
    print("DISTINCT_NODES", distinct)
    assert distinct == 2, f"SPREAD pool landed on {distinct} node(s): {nodes}"
finally:
    ray.shutdown()
    cluster.shutdown()
"""


def test_shard_pool_spreads_across_two_simulated_nodes():
    r = subprocess.run(
        [sys.executable, "-c", _TWO_NODE_SCRIPT],
        capture_output=True,
        text=True,
        timeout=240,
        cwd="/root/repo",
    )
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr[-2000:]}"
    assert "DISTINCT_NODES 2" in r.stdout


def test_spawn_shard_single_node_noop(ray_session):
    """SPREAD is a no-op on one node: the helper spawns working shards
    in the plain single-node session too."""
    import ray

    from dataflowkit_ray.state.store import WindowStateShard, spawn_shard

    s = spawn_shard(WindowStateShard, ["m"])
    assert isinstance(ray.get(s.where.remote()), str)
    ray.kill(s)
