"""Multi-process (multi-host) runtime initialization.

The reference has no distributed backend at all — its "multi-GPU" is a
single-process Python loop copying tensors between devices (reference:
utils/training_utils.py:131-303; `torch.distributed` is imported at :8 and
never used). The TPU-native equivalent (SURVEY.md §5.8) is a real backend:
`jax.distributed.initialize` connects the processes of a pod/multi-slice job,
after which `jax.devices()` is the GLOBAL device list, mesh collectives run
over ICI within a slice and DCN across slices, and each process feeds only
its addressable shard of every batch.

Three launch modes:
- single process (the default): nothing to do, `initialize_distributed` is a
  no-op unless flags are given.
- TPU pod auto-detection: `--distributed` alone calls
  `jax.distributed.initialize()` with no arguments; on Cloud TPU the runtime
  discovers coordinator/process_id from the metadata server.
- explicit: `--coordinator host:port --num_processes N --process_id I`
  (works on any backend, incl. the CPU Gloo backend used by the 2-process
  smoke test in tests/test_multihost.py).
"""

from __future__ import annotations

import jax


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None,
                           local_device_ids=None) -> bool:
    """Initialize the multi-process runtime. Returns True if initialized.

    Call BEFORE any other JAX API touches the backend. No-op (returns False)
    when no arguments are given and auto-detection is not requested — i.e.
    plain single-process runs never pay for this.
    """
    if coordinator_address is None and num_processes is None and process_id is None:
        return False
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kwargs)
    return True


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def host_put(x, sharding):
    """Place a host-global array onto a (possibly multi-process) sharding.

    Single process: a plain device_put. Multi-process: every process holds the
    same host-global batch (the data pipeline is seed-deterministic, so all
    processes assemble identical batches); each contributes only the shards it
    can address, via make_array_from_callback — no cross-host data movement.

    For batch feeding, prefer assemble_sharded_batch: it never materializes
    the full global batch on any host.
    """
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])


def assemble_sharded_batch(gather, chunk, sharding, src_shape, trg_shape,
                           touched_rows: list | None = None):
    """Per-process shard-only batch assembly (SURVEY §5.8 / VERDICT r2 #5).

    `chunk` is one global batch's window indices (windowing._iter_index_chunks
    — identical on every process by seed determinism over the index TABLE,
    which is tiny; the reference-scale waste this replaces was every process
    materializing the full global SAMPLE batch). Each process runs `gather`
    (WindowedDataset.gather — the C++ OpenMP assembler when available) only
    on the rows its addressable shards cover, then contributes them via
    make_array_from_callback. With tp>1, devices in the same 'model' group
    share a row range — the cache dedupes the gather.

    Returns (src, trg) global jax.Arrays. `touched_rows` (tests) collects the
    (start, stop) row ranges actually gathered on this process.
    """
    cache: dict = {}

    def rows(sl: slice):
        key = (sl.start, sl.stop, sl.step)
        if key not in cache:
            if touched_rows is not None:
                touched_rows.append((sl.start, sl.stop))
            cache[key] = gather(chunk[sl])
        return cache[key]

    src = jax.make_array_from_callback(
        src_shape, sharding, lambda idx: rows(idx[0])[0])
    trg = jax.make_array_from_callback(
        trg_shape, sharding, lambda idx: rows(idx[0])[1])
    return src, trg


def _needs_gather(x) -> bool:
    """True when `x` can't be host-read on this process: sharded across
    devices some of which are non-addressable (e.g. TP across hosts).
    np.asarray needs full replication or full addressability."""
    return (isinstance(x, jax.Array)
            and not (x.sharding.is_fully_replicated or x.is_fully_addressable))


def needs_cross_host_gather(tree) -> bool:
    """True when host-reading `tree` requires a COLLECTIVE (some leaf is
    sharded across non-addressable devices) — i.e. every process must join
    the host_local_params call, not just the one that wants the bytes."""
    return any(_needs_gather(x) for x in jax.tree.leaves(tree))


def host_local_params(tree):
    """Return `tree` as ordinary process-local host (numpy) arrays,
    all-gathering any leaf that is sharded across non-addressable devices
    first.

    Closes the cross-host-TP artifact gap (VERDICT r2): the model.pth
    export and the fixed-wav validation run on process 0 only, but a param
    leaf TP-sharded across hosts can neither be read (`np.asarray` requires
    full replication or full addressability) nor fed to a process-local
    jit. When needs_cross_host_gather(tree) is true this is COLLECTIVE —
    every process must call it; otherwise it is a plain local host read.

    Leaves gather ONE AT A TIME (a per-leaf identity jit with
    fully-replicated out_shardings, host-read, then dropped): replicating
    the whole tree in one program would stack a complete unsharded params
    copy on top of the live sharded state on every device — an HBM spike
    exactly in the memory-tight TP configs this function exists for. The
    per-leaf peak is one layer-stacked weight (~134 MB at the flagship
    geometry) instead of the full ~1 GB.
    """
    import numpy as np

    from jax.sharding import NamedSharding, PartitionSpec as P

    def pull(x):
        if not _needs_gather(x):
            return np.asarray(x) if isinstance(x, jax.Array) else x
        replicated = NamedSharding(x.sharding.mesh, P())
        return np.asarray(
            jax.jit(lambda a: a, out_shardings=replicated)(x))

    return jax.tree.map(pull, tree)
