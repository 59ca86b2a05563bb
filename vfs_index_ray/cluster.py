"""Cluster attach + code-shipping (real multi-node packaging).

Everything else in this package assumes ``import vfs_index_ray`` works
on every node — true on a single machine (workers inherit the driver
cwd) or when the repo sits on shared storage, false on a real cluster
whose worker nodes have neither a checkout nor an installed wheel.
``connect()`` is the one place that closes that gap: when attaching to
a non-local address it ships this package to every node through Ray's
``runtime_env={"py_modules": [...]}``, so a bare cluster can run any
job script with zero per-node install.

Deployment contract (see README "Running on a cluster"):
  - the INDEX and CORPUS directories must be on storage every node can
    read (NFS/object store); the engine's reads are per-part pruned
    pushdowns, so replicas and build tasks share nothing else;
  - ``--scratch`` should point at node-local fast storage (it is used
    for the hive-partitioned postings spill, re-read only by the task
    that wrote it on the same wave);
  - code travels with the job via ``py_modules`` — never assume a
    worker node can see the driver's sys.path.

Reference parity: the vfs-index daemon is one static Go binary per
node (cmd/vfs-index); the Ray-native equivalent of "copy the binary"
is runtime_env code shipping, verified end-to-end by
``tests/test_multinode.py::test_three_node_build_query_code_shipping``
on a simulated 3-node cluster with no PYTHONPATH and a /tmp cwd.
"""

from __future__ import annotations

import os


def package_root() -> str:
    """Absolute path of the importable ``vfs_index_ray`` package dir."""
    return os.path.dirname(os.path.abspath(__file__))


def job_runtime_env(ship_code: bool = True) -> dict:
    """runtime_env for a cluster job: ship this package to all nodes.

    ``py_modules`` uploads the package directory once to the cluster's
    GCS and prepends it to ``sys.path`` of every worker — the moral
    equivalent of distributing the reference's static binary.
    """
    env: dict = {}
    if ship_code:
        env["py_modules"] = [package_root()]
    return env


def connect(address: str | None = None, *, num_cpus: int | None = None,
            ship_code: bool | None = None) -> None:
    """Initialise (or attach to) Ray for a job entry point.

    - ``address=None`` → ``$RAY_ADDRESS`` if set, else a fresh local
      session (the sandbox / laptop path).
    - any other address → attach to that running cluster and ship the
      package via py_modules (unless ``ship_code=False``).

    Safe to call when Ray is already initialised (no-op), so entry
    points still work under an outer driver that owns the session.
    """
    import ray
    if ray.is_initialized():
        return
    addr = address or os.environ.get("RAY_ADDRESS") or "local"
    local = addr == "local"
    if ship_code is None:
        ship_code = not local
    kwargs: dict = dict(address=addr, include_dashboard=False,
                        logging_level="ERROR")
    if local and num_cpus is not None:
        kwargs["num_cpus"] = num_cpus
    if ship_code:
        kwargs["runtime_env"] = job_runtime_env()
    else:
        # single-machine fallback: workers only need the repo on path
        repo = os.path.dirname(package_root())
        kwargs["runtime_env"] = {"env_vars": {"PYTHONPATH": repo}}
    ray.init(**kwargs)
