"""Metrics, meters, and logging sinks.

Reference: ``experiments/src/logging.jl``. Three parallel sinks per run:
formatted console ProgressMeter, flushed CSV loggers, and (optional,
gated) Weights & Biases. NFE is a first-class observable — it is the paper's
headline metric.
"""
from __future__ import annotations

import csv
import os
from typing import Dict, List, Optional, Sequence


class AverageMeter:
    """Running value/sum/count/average with a format string
    (reference ``logging.jl:2-34``)."""

    def __init__(self, name: str, fmt: str = "{:.4f}"):
        self.name = name
        self.fmt = fmt
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0
        self.average = 0.0

    def update(self, val, n: int = 1):
        val = float(val)
        self.val = val
        self.sum += val * n
        self.count += n
        self.average = self.sum / max(self.count, 1)
        return self.average

    def __str__(self):
        return (
            f"{self.name} {self.fmt.format(self.val)} "
            f"({self.fmt.format(self.average)})"
        )


class ProgressMeter:
    """Batch-prefixed row of meters (reference ``logging.jl:37-62``)."""

    def __init__(self, total_steps: int, meters: Sequence[AverageMeter],
                 prefix: str = ""):
        width = len(str(total_steps))
        self.batch_fmt = f"[{{:{width}d}}/{total_steps}]"
        self.meters = list(meters)
        self.prefix = prefix

    def print(self, step: int):
        entries = [self.prefix + self.batch_fmt.format(step)]
        entries += [str(m) for m in self.meters]
        print("\t".join(entries), flush=True)

    def reset(self):
        for m in self.meters:
            m.reset()


class CSVLogger:
    """Header + flush-per-row CSV sink (reference ``logging.jl:65-85``)."""

    def __init__(self, path: str, header: Sequence[str]):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self.path = path
        self.header = list(header)
        self._fh = open(path, "w", newline="")
        self._writer = csv.writer(self._fh)
        self._writer.writerow(self.header)
        self._fh.flush()

    def log(self, row: Sequence):
        self._writer.writerow([_scalar(v) for v in row])
        self._fh.flush()

    def close(self):
        self._fh.close()


def _scalar(v):
    try:
        return float(v)
    except (TypeError, ValueError):
        return v


class WandbLogger:
    """Weights & Biases sink, gated: becomes a no-op if wandb is not
    installed or WANDB_MODE=disabled (zero-egress environments)."""

    def __init__(self, project: str, name: str, config: Dict):
        self._run = None
        try:
            import wandb  # type: ignore

            self._run = wandb.init(
                project=project, name=name, config=config, reinit=True
            )
        except Exception:
            self._run = None

    def log(self, values: Dict, step: Optional[int] = None):
        if self._run is not None:
            self._run.log(values, step=step)


def create_logger(
    log_dir: str,
    total_steps: int,
    *,
    latent_ode: bool = False,
    sde: bool = False,
    expt_name: str = "run",
    config: Optional[Dict] = None,
    wandb_project: str = "localregneuralde",
):
    """Build (train_meters, eval_meters, csv_train, csv_eval, wandb) with the
    column sets of the reference (``logging.jl:87-190``): NFE vs
    NFE Drift/Diffusion; CE vs NLL+KL; accuracy only for classification."""
    if latent_ode:
        loss_cols = ["neg_log_likelihood", "kl_div", "reg_val", "net_loss"]
    else:
        loss_cols = ["ce_loss", "reg_val", "net_loss"]
    nfe_cols = ["nfe_drift", "nfe_diffusion"] if sde else ["nfe"]
    acc_cols = [] if latent_ode else ["accuracy_top1", "accuracy_top5"]
    # reference column set (logging.jl:134-138): batch/data/fwd/bwd/opt
    # wall-clock, plus the fused step_time
    time_cols = [
        "batch_time", "data_time", "fwd_time", "bwd_time", "opt_time",
        "step_time",
    ]

    train_header = ["step"] + time_cols + loss_cols + nfe_cols + acc_cols
    eval_header = ["step"] + loss_cols + nfe_cols + acc_cols

    csv_train = CSVLogger(
        os.path.join(log_dir, "results_train.csv"), train_header
    )
    csv_eval = CSVLogger(
        os.path.join(log_dir, "results_eval.csv"), eval_header
    )

    train_meters = {
        name: AverageMeter(name)
        for name in time_cols + loss_cols + nfe_cols + acc_cols
    }
    eval_meters = {
        name: AverageMeter(name) for name in loss_cols + nfe_cols + acc_cols
    }
    wb = WandbLogger(wandb_project, expt_name, config or {})
    return {
        "train_meters": train_meters,
        "eval_meters": eval_meters,
        "csv_train": csv_train,
        "csv_eval": csv_eval,
        "wandb": wb,
        "train_header": train_header,
        "eval_header": eval_header,
    }


def get_loggable_values(meters: Dict[str, AverageMeter], header: List[str],
                        step: int) -> List:
    row = [step]
    for name in header[1:]:
        row.append(meters[name].average if name in meters else float("nan"))
    return row


def reset_meters(meters: Dict[str, AverageMeter]):
    for m in meters.values():
        m.reset()
