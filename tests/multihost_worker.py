"""Worker for tests/test_multihost.py: one of two processes training the
tiny flagship over a process-spanning DP×TP mesh.

Usage: python multihost_worker.py <process_id> <port>
Prints one line: MH_LOSSES <loss_step1> <loss_step2>
"""
import sys

proc, port = int(sys.argv[1]), sys.argv[2]

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)

import os  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from localregneuralde_tpu.parallel import multihost  # noqa: E402

multihost.initialize(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=2,
    process_id=proc,
)
assert jax.device_count() == 4 and jax.local_device_count() == 2

import numpy as np  # noqa: E402

from tests.multihost_common import GLOBAL_BATCH, make_batch, setup  # noqa: E402

from localregneuralde_tpu.harness.train import create_train_state  # noqa: E402
from localregneuralde_tpu.parallel import (  # noqa: E402
    make_mesh,
    make_sharded_train_step,
    sharding_rules_for_mlp_tp,
    train_state_shardings,
)

model, loss_fn, optimizer = setup()
mesh = make_mesh({"data": 2, "model": 2})
rules = sharding_rules_for_mlp_tp("model")

# identical seed on every process -> bitwise-identical host params
ts = create_train_state(model, optimizer, jax.random.PRNGKey(0))
ts_sh = train_state_shardings(ts, mesh, rules)
ts = multihost.place_train_state(ts, mesh, rules, shardings=ts_sh)

step = make_sharded_train_step(
    model, loss_fn, optimizer, mesh, rules=rules, ts_shardings=ts_sh
)

# each process loads ONLY its contiguous slice of the global batch
rows = multihost.process_batch_slice(mesh, GLOBAL_BATCH)
x, y = make_batch()
batch = multihost.global_batch((x[rows], y[rows]), mesh, GLOBAL_BATCH)

losses = []
for _ in range(2):
    ts, loss, stats = step(ts, batch, 1.0, 1e-3)
    losses.append(float(loss))  # replicated output: addressable everywhere

# exercise the checkpoint path: batch-sharded state leaves gather fine
host_ts = multihost.gather_to_host(ts)
ok = all(
    hasattr(leaf, "shape")
    for leaf in jax.tree_util.tree_leaves(host_ts.params)
)
print(
    f"MH_LOSSES {losses[0]:.8f} {losses[1]:.8f} "
    f"primary={multihost.is_primary()} gather_ok={ok}",
    flush=True,
)
