"""Fault-injection and probe scorer classes for engine hardening tests.

These live in the importable package (not in ``tests/``) because Ray actor
classes are pickled by reference: a worker process must be able to
``import chameleon_entity_linking_ray.testing.faults`` to reconstruct the
actor, and the ``tests/`` directory is not on the workers' ``sys.path``.

The reference has no analogue — this is pure engine hardening evidence for
the SURVEY §4 claim that retried partitions are idempotent (no duplicated
or dropped rows after an actor death).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from chameleon_entity_linking_ray.stages.scoring import PairScorer


class CrashOncePairScorer(PairScorer):
    """PairScorer that hard-kills its worker process (``os._exit`` — a
    system failure, not an application exception) on the FIRST batch of
    the run, coordinated across actors by a sentinel file created with
    O_EXCL so exactly one actor dies. Ray restarts the actor and retries
    the batch; idempotent partition outputs mean no duplicate rows.
    """

    def __init__(self, sentinel_path: str = "", **kw):
        super().__init__(**kw)
        self.sentinel_path = sentinel_path

    def __call__(self, batch):
        if self.sentinel_path and not os.path.exists(self.sentinel_path):
            try:
                with open(self.sentinel_path, "x") as f:
                    f.write("crashed")
            except FileExistsError:
                pass
            else:
                os._exit(1)
        return super().__call__(batch)


class DeviceProbeScorer:
    """Minimal PairScorer-protocol class recording its ``device`` kwarg in
    an output column — proves fn_constructor_kwargs plumbing end-to-end.
    """

    def __init__(self, config=None, stats_ref=None, device: str = "cpu"):
        self.device = device

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return (batch.append_column(
            "score", pa.array(np.ones(n, np.float32), pa.float32()))
            .append_column("device",
                           pa.array([self.device] * n, pa.string())))
