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


def host_local_params(tree):
    """COLLECTIVE: return `tree` as ordinary process-local host (numpy)
    arrays, all-gathering any leaf that is sharded across non-addressable
    devices first.

    Closes the cross-host-TP artifact gap (VERDICT r2): the model.pth
    export and the fixed-wav validation run on process 0 only, but a
    param leaf TP-sharded across hosts can neither be read
    (`np.asarray` requires full replication or full addressability) nor
    fed to a process-local jit. Every process must call this whenever any
    process will use the result — the gather is one compiled identity
    program with fully-replicated out_shardings, which GSPMD lowers to
    all-gathers only for the leaves that need them.

    Cheap in the common cases: with nothing cross-host-sharded (single
    process, DP replication, single-host TP) no program runs at all and
    the leaves are host-read directly.
    """
    import numpy as np

    leaves = [x for x in jax.tree.leaves(tree) if isinstance(x, jax.Array)]
    if not any(not (x.sharding.is_fully_replicated or x.is_fully_addressable)
               for x in leaves):
        return jax.tree.map(np.asarray, tree)
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = next(x.sharding.mesh for x in leaves
                if not (x.sharding.is_fully_replicated
                        or x.is_fully_addressable))
    replicated = NamedSharding(mesh, P())
    gathered = jax.jit(
        lambda t: t,
        out_shardings=jax.tree.map(lambda _: replicated, tree))(tree)
    return jax.tree.map(np.asarray, gathered)
