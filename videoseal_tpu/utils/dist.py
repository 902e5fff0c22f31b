"""Multi-host initialization helpers (parity: videoseal/utils/dist.py).

The reference parses SLURM/torchrun env vars and initializes NCCL
(dist.py:103-218). JAX equivalent: `jax.distributed.initialize()` with
coordinator discovery. These helpers mirror the reference's environment
handling (SLURM_* variables, coordinator from the first node of the
nodelist) and its rank-gated conveniences.
"""

from __future__ import annotations

import os
import re
import subprocess


def is_dist_avail_and_initialized() -> bool:
    import jax
    return jax.process_count() > 1


def get_rank() -> int:
    import jax
    return jax.process_index()


def get_world_size() -> int:
    import jax
    return jax.process_count()


def is_main_process() -> bool:
    return get_rank() == 0


def _slurm_first_host(nodelist: str) -> str:
    """First hostname from a SLURM nodelist (scontrol when available,
    else a best-effort parse of 'prefix[1-4,7]' syntax; dist.py:117-125)."""
    try:
        out = subprocess.run(["scontrol", "show", "hostnames", nodelist],
                             capture_output=True, text=True, timeout=10)
        if out.returncode == 0 and out.stdout.strip():
            return out.stdout.split()[0]
    except (OSError, subprocess.TimeoutExpired):
        pass
    m = re.match(r"([^\[,]+)(?:\[(\d+)[-,\d]*\])?", nodelist)
    if not m:
        return nodelist
    prefix, first = m.group(1), m.group(2)
    return f"{prefix}{first}" if first else prefix


def init_distributed_mode(coordinator_port: int = 29500) -> None:
    """Initialize multi-host JAX from SLURM or explicit env vars
    (parity: dist.py:85-218; NCCL init -> jax.distributed/ICI+DCN).

    Single-process environments are a no-op (dist.py:165-173 fallback).
    """
    import jax

    if "SLURM_JOB_ID" in os.environ and int(os.environ.get("SLURM_NTASKS", "1")) > 1:
        coordinator = _slurm_first_host(os.environ["SLURM_JOB_NODELIST"])
        jax.distributed.initialize(
            coordinator_address=f"{coordinator}:{coordinator_port}",
            num_processes=int(os.environ["SLURM_NTASKS"]),
            process_id=int(os.environ["SLURM_PROCID"]),
        )
    elif "JAX_COORDINATOR_ADDRESS" in os.environ or "COORDINATOR_ADDRESS" in os.environ:
        jax.distributed.initialize()  # env-driven (torchrun-style launch)
    # else: single process — nothing to do


def average_metrics(metrics: dict) -> dict:
    """Cross-host metric averaging (parity: dist.py:223-235)."""
    import jax
    if jax.process_count() == 1:
        return metrics
    import numpy as np
    from jax.experimental import multihost_utils
    keys = sorted(metrics)
    vals = np.asarray([float(metrics[k]) for k in keys])
    summed = multihost_utils.process_allgather(vals).mean(axis=0)
    return {k: float(summed[i]) for i, k in enumerate(keys)}
