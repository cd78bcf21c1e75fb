"""Worker for tests/test_multihost.py::test_runner_end_to_end_two_process:
one of two processes running the FULL classification experiment runner
(data_parallel=gspmd) over a process-spanning mesh.

Usage: python multihost_runner_worker.py <process_id> <port> <workdir> [spc]
Prints: MH_RUNNER <best_eval_acc>
"""
import sys

proc, port, workdir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
spc = int(sys.argv[4]) if len(sys.argv) > 4 else 1

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

from tests.multihost_common import runner_cfg  # noqa: E402

from localregneuralde_tpu.harness.runner import (  # noqa: E402
    run_classification_experiment,
)

cfg = runner_cfg(workdir, steps_per_call=spc)
out = run_classification_experiment(cfg, "mhrun")
print(f"MH_RUNNER {out['best_eval_acc']:.8f}", flush=True)
