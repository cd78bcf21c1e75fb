"""Worker for tests/test_multihost.py::test_latent_runner_two_process:
one of two processes running the FULL latent-ODE (PhysioNet-family)
experiment runner (data_parallel=gspmd) over a process-spanning mesh.

Usage: python multihost_latent_worker.py <process_id> <port> <workdir>
Prints: MH_LATENT <best_eval_mse> <final_eval_nfe>
"""
import sys

proc, port, workdir = int(sys.argv[1]), sys.argv[2], sys.argv[3]

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

from tests.multihost_common import latent_cfg  # noqa: E402

from localregneuralde_tpu.harness.latent_runner import (  # noqa: E402
    run_latent_ode_experiment,
)

cfg = latent_cfg(workdir)
out = run_latent_ode_experiment(cfg, "mhlat")
print(
    f"MH_LATENT {out['best_eval_mse']:.8f} {out['final_eval_nfe']:.4f}",
    flush=True,
)
