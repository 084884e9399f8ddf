"""Multi-host batch farming over DCN.

The reference scales to many videos with one SLURM process per GPU
(pyfvvdp/benchmark_cluster.sh:1-40) — results come back as scattered job
logs.  The TPU-native equivalent is one SPMD program over a multi-host
device mesh: every host feeds its local pairs, the batch axis shards over
every chip of every host, and the only cross-host traffic is the final
JOD gather (the pairs themselves never talk).  `fvvdp.predict_batch`
detects a multi-process runtime and assembles its inputs into global
arrays automatically; this module holds the runtime bring-up helpers.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def init_multihost(coordinator_address: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None,
                   local_device_ids: Optional[Sequence[int]] = None) -> None:
    """Bring up the distributed JAX runtime (call once, before any jax op).

    On cloud TPU pods all arguments are discovered from the environment;
    elsewhere pass them explicitly.  Afterwards ``jax.devices()`` is the
    GLOBAL device list and ``make_mesh()`` builds a cross-host mesh.
    """
    import jax
    kwargs = {}
    if local_device_ids is not None:
        kwargs["local_device_ids"] = list(local_device_ids)
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id, **kwargs)


def local_batch_to_global(mesh, spec, local_np: np.ndarray):
    """Assemble per-process batch shards into one global array.

    Every process passes the SAME local shape; rows land on the process's
    own devices (no data moves over DCN).
    """
    import jax
    from jax.sharding import NamedSharding
    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, spec), np.asarray(local_np))


def replicate_to_hosts(mesh, arr):
    """All-gather a sharded result so every process can read all of it."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    return jax.jit(lambda x: x, out_shardings=NamedSharding(mesh, P()))(arr)


def local_row_positions(mesh, n_rows_global: int):
    """Row indices of the global batch axis owned by THIS process, in the
    order `local_batch_to_global` consumed the local rows.

    The batch axis shards over the flattened mesh; each device owns a
    contiguous row block.  Returns a flat index array usable to slice this
    process's results out of a replicated global result.
    """
    import jax
    flat = list(mesh.devices.flat)
    if n_rows_global % len(flat) != 0:
        raise ValueError(f"{n_rows_global} rows do not shard evenly over "
                         f"{len(flat)} devices; row ownership is ambiguous")
    rows_per_dev = n_rows_global // len(flat)
    pid = jax.process_index()
    idx = [np.arange(pos * rows_per_dev, (pos + 1) * rows_per_dev)
           for pos, d in enumerate(flat) if d.process_index == pid]
    return np.concatenate(idx) if idx else np.zeros((0,), np.int64)
