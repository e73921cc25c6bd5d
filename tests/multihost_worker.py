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
