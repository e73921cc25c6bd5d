"""Worker for the 2-process multi-host smoke test (tests/test_multihost.py).

Runs one process of a 2-process × 2-local-CPU-device job (4 global devices),
drives three data-parallel train steps through the real code path
(initialize_distributed → make_mesh → shard_state → host_put batches →
compiled step with gradient all-reduce over the Gloo backend), and prints the
final loss for the parent to compare across processes and against a
single-process run.

Usage: python tests/multihost_worker.py PROCESS_ID COORDINATOR
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)

process_id, coordinator = int(sys.argv[1]), sys.argv[2]

sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])
from neurosync_trainer_lite_tpu.parallel.distributed import (  # noqa: E402
    host_put,
    initialize_distributed,
)

assert initialize_distributed(coordinator, 2, process_id)
assert jax.process_count() == 2 and jax.device_count() == 4

import numpy as np  # noqa: E402

from neurosync_trainer_lite_tpu.config import tiny_config  # noqa: E402
from neurosync_trainer_lite_tpu.parallel.mesh import (  # noqa: E402
    batch_sharding,
    make_mesh,
)
from neurosync_trainer_lite_tpu.training.step import (  # noqa: E402
    init_train_state,
    make_train_step,
    shard_state,
)

cfg = tiny_config(batch_size=8, micro_batch_size=16, dp=4)
mesh = make_mesh(cfg)
state, tx = init_train_state(cfg, steps_per_epoch=4)
state = shard_state(state, cfg, mesh, tx)
step = make_train_step(cfg, tx)
sharding = batch_sharding(mesh)

# every process assembles the same seed-deterministic batch (as the real
# data pipeline does) and contributes its addressable shards
rng = np.random.default_rng(0)
src = rng.standard_normal((8, 16, cfg.input_dim)).astype(np.float32)
trg = rng.standard_normal((8, 16, cfg.output_dim)).astype(np.float32)

loss = gn = None
for i in range(3):
    state, loss, gn = step(state, host_put(src, sharding),
                           host_put(trg, sharding), jax.random.PRNGKey(i))
print(f"MULTIHOST_RESULT p{process_id} loss={float(loss):.8f} "
      f"grad_norm={float(gn):.8f}", flush=True)

# ---- per-process shard-only batch assembly (SURVEY §5.8 / VERDICT r2 #5) --
# Build a deterministic windowed dataset, assemble one global batch with
# each process gathering ONLY its addressable rows, and print (a) a window-
# table checksum — guards against per-host nondeterminism in clip discovery
# silently corrupting batches — and (b) the global batch checksum computed
# by a compiled reduction over the sharded array.
import zlib  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from neurosync_trainer_lite_tpu.data.windowing import (  # noqa: E402
    WindowedDataset,
)
from neurosync_trainer_lite_tpu.parallel.distributed import (  # noqa: E402
    assemble_sharded_batch,
)

clip_rng = np.random.default_rng(7)
clips = [(clip_rng.standard_normal((50, cfg.input_dim)).astype(np.float32),
          clip_rng.standard_normal((50, cfg.output_dim)).astype(np.float32))]
ds = WindowedDataset(clips, window=16)
table_crc = zlib.crc32(np.ascontiguousarray(ds.table).tobytes())

chunk = next(ds.index_batches(8, shuffle=True, seed=3))
touched: list = []
bsrc, btrg = assemble_sharded_batch(
    ds.gather, chunk, sharding,
    (8, 16, cfg.input_dim), (8, 16, cfg.output_dim), touched_rows=touched)
# disjoint assembly: this process gathered exactly its 2-of-4 dp shards
rows_gathered = sum(stop - start for start, stop in touched)
assert rows_gathered == 8 // 2, touched
batch_sum = float(jax.jit(lambda a, b: jnp.sum(a) + jnp.sum(b))(bsrc, btrg))
print(f"MULTIHOST_BATCH p{process_id} table_crc={table_crc} "
      f"batch_sum={batch_sum:.6f} rows_gathered={rows_gathered}", flush=True)

# ---- collective checkpoint save + sharded restore (VERDICT r2 #6) --------
ckpt_dir = sys.argv[3] if len(sys.argv) > 3 else None
if ckpt_dir:
    from neurosync_trainer_lite_tpu.training.checkpoint import (
        load_checkpoint,
        save_checkpoint,
    )
    from neurosync_trainer_lite_tpu.training.step import state_shardings

    path = ckpt_dir + "/checkpoint"
    save_checkpoint(state, epoch=2, batch_step=3, cfg=cfg,
                    checkpoint_path=path)
    shardings = state_shardings(cfg, mesh, tx)
    epoch, bstep, restored = load_checkpoint(path, cfg, steps_per_epoch=4,
                                             shardings=shardings)
    assert (epoch, bstep) == (2, 3)
    # every locally-addressable shard must round-trip bit-exactly
    for orig, back in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        for s_o, s_b in zip(orig.addressable_shards, back.addressable_shards):
            np.testing.assert_array_equal(np.asarray(s_o.data),
                                          np.asarray(s_b.data))
    # and the restored state must be USABLE: one more compiled step
    _, loss2, _ = step(restored, host_put(src, sharding),
                       host_put(trg, sharding), jax.random.PRNGKey(9))
    print(f"MULTIHOST_CKPT p{process_id} ok=1 loss={float(loss2):.8f}",
          flush=True)

# ---- cross-host-TP artifact export (host_local_params gather) -------------
# tp=4 over 2 processes x 2 devices: every attention/FFN weight is sharded
# across BOTH hosts — not fully addressable by process 0 and not replicated,
# exactly the case the process-0-only model.pth export could never handle
# without a collective gather.
from neurosync_trainer_lite_tpu.parallel.distributed import (  # noqa: E402
    host_local_params,
)

cfg_tp = tiny_config(batch_size=8, micro_batch_size=16, dp=1, tp=4)
mesh_tp = make_mesh(cfg_tp)
state_tp, tx_tp = init_train_state(cfg_tp, steps_per_epoch=4)
host_params = jax.tree.map(np.asarray, state_tp.params)  # pre-shard truth
state_tp = shard_state(state_tp, cfg_tp, mesh_tp, tx_tp)
leaves_tp = jax.tree.leaves(state_tp.params)
assert any(not (x.sharding.is_fully_replicated or x.is_fully_addressable)
           for x in leaves_tp), "tp=4 mesh unexpectedly host-local"

local = host_local_params(state_tp.params)  # collective: both processes
for a, b in zip(jax.tree.leaves(host_params), jax.tree.leaves(local)):
    np.testing.assert_array_equal(a, b)

export_ok = 1
if process_id == 0 and ckpt_dir:
    # the real artifact path: reference-format .pth round-trip on the
    # gathered params, process 0 only
    from neurosync_trainer_lite_tpu.utils.torch_interop import (
        load_torch_model,
        save_torch_model,
        torch_available,
    )

    if torch_available():
        pth = ckpt_dir + "/model_tp4.pth"
        save_torch_model(local, cfg_tp, pth)
        back = load_torch_model(pth, cfg_tp)
        for a, b in zip(jax.tree.leaves(host_params), jax.tree.leaves(back)):
            np.testing.assert_array_equal(a, np.asarray(b))
print(f"MULTIHOST_EXPORT p{process_id} ok={export_ok}", flush=True)
