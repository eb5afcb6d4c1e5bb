"""Multi-host (multi-process) initialisation — the reference's
detectron2 `launch(num_machines=..., machine_rank=..., dist_url=...)`
entry (reference tools/train_net.py:529-536) re-designed for JAX's
multi-controller SPMD runtime.

One process per host, each seeing its local TPU chips; after
`jax.distributed.initialize` the `jax.devices()` list spans ALL hosts and
the existing `make_mesh([-1], ["data"])` + `shard_batch` code scales
unchanged — gradient all-reduces ride ICI within a slice and DCN across
slices, inserted by XLA from the same shardings (no NCCL/dist_url plumbing
in model code, per SURVEY §2.4/§2.5).

Spawn semantics: the reference's mp.spawn-per-GPU becomes one command per
host, e.g. under GKE/xpk each worker runs

    WEAKCUBE_COORDINATOR=<host0>:8476 WEAKCUBE_NUM_PROCESSES=<N> \
    WEAKCUBE_PROCESS_ID=<rank> python tools/train_net.py ...

or relies on the TPU metadata auto-detection built into
jax.distributed.initialize() (no env needed on Cloud TPU VMs).
"""
from __future__ import annotations

import logging
import os

logger = logging.getLogger(__name__)

_INITIALIZED = False


def maybe_initialize_distributed() -> bool:
    """Initialise the JAX distributed runtime when multi-host training is
    requested. Returns True when running multi-process.

    Trigger rules (checked in order):
      * WEAKCUBE_COORDINATOR set -> explicit coordinator_address; requires
        WEAKCUBE_NUM_PROCESSES and WEAKCUBE_PROCESS_ID;
      * WEAKCUBE_MULTIHOST=1     -> jax.distributed.initialize() with full
        auto-detection (Cloud TPU VM metadata / SLURM / GKE);
      * otherwise                -> single-process, no-op.

    Must run before the first jax op, like the platform forcing.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return True
    import jax

    coord = os.environ.get("WEAKCUBE_COORDINATOR")
    if coord:
        n = int(os.environ["WEAKCUBE_NUM_PROCESSES"])
        pid = int(os.environ["WEAKCUBE_PROCESS_ID"])
        jax.distributed.initialize(coordinator_address=coord,
                                   num_processes=n, process_id=pid)
    elif os.environ.get("WEAKCUBE_MULTIHOST"):
        jax.distributed.initialize()
    else:
        return False
    _INITIALIZED = True
    logger.info("distributed: process %d/%d, %d local + %d global devices",
                jax.process_index(), jax.process_count(),
                jax.local_device_count(), jax.device_count())
    return True


def is_main_process() -> bool:
    """Rank-0 check for host-side side effects (checkpoint writes, event
    files, vis dumps) — the reference's comm.is_main_process()."""
    import jax
    return jax.process_index() == 0


def process_count() -> int:
    import jax
    return jax.process_count()
