"""Distributed deterministic transcript source.

The driver-side generator (testing/synth.py) loops per turn in Python —
fine for test fixtures, hopeless for benchmark corpora. This source
generates the SAME transcript shape as a Ray pipeline: a range dataset of
conversation indices fanned out to ``map_batches`` tasks, each conversation
seeded by ``(seed, conv_idx)`` so output is byte-deterministic regardless
of partitioning or task order.

This is also the engine's demonstration of a parallel *synthetic source*
(the reference reads static TSVs — SURVEY.md S1; a 10^12-turn test corpus
can only exist as a generator).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data
from ray.data import Dataset

from chameleon_entity_linking_ray.testing.synth import (
    _alias,
    _canonical_names,
    _BASE_TS_US,
    _FILLER,
    _ROLES,
    _TOOLS,
)


def _gen_convs(conv_indices: np.ndarray, n_entities: int, seed: int,
               hot_entity_mass: float, mean_turns: int) -> pa.Table:
    names = _canonical_names(n_entities)
    conv_ids, turn_idxs, roles, texts, tools, tss = [], [], [], [], [], []
    for c in conv_indices:
        c = int(c)
        rng = np.random.RandomState((seed * 1_000_003 + c) % (1 << 31))
        conv = f"conv-{c:08d}"
        n_turns = 2 + int(rng.poisson(mean_turns))
        for t in range(n_turns):
            parts, cursor = [], 0
            n_mentions = rng.randint(0, 4)
            for m in range(n_mentions + 1):
                fill = " ".join(
                    _FILLER[rng.randint(0, len(_FILLER))]
                    for _ in range(2 + rng.randint(0, 5)))
                if parts:
                    parts.append(" ")
                    cursor += 1
                parts.append(fill)
                cursor += len(fill)
                if m < n_mentions:
                    if hot_entity_mass > 0 and rng.rand() < hot_entity_mass:
                        eid = 0
                    else:
                        eid = rng.randint(0, n_entities)
                    surface = _alias(names[eid], rng.randint(0, 6), rng)
                    parts.append(" ")
                    parts.append(surface)
                    cursor += 1 + len(surface)
            conv_ids.append(conv)
            turn_idxs.append(t)
            roles.append(_ROLES[t % 3])
            texts.append("".join(parts))
            tools.append(_TOOLS[rng.randint(0, len(_TOOLS))] if t % 3 == 2 else "")
            tss.append(_BASE_TS_US + c * 3_600_000_000 + t * 60_000_000)
    return pa.table({
        "conv_id": pa.array(conv_ids, pa.string()),
        "turn_idx": pa.array(turn_idxs, pa.int32()),
        "role": pa.array(roles, pa.string()),
        "text": pa.array(texts, pa.string()),
        "tool": pa.array(tools, pa.string()),
        "ts": pa.array(tss, pa.timestamp("us")),
    })


def synth_transcripts(n_convs: int, n_entities: int = 1000, seed: int = 42,
                      hot_entity_mass: float = 0.0, mean_turns: int = 8,
                      num_blocks: int | None = None) -> Dataset:
    """Deterministic transcript Dataset generated in parallel tasks."""
    num_blocks = num_blocks or max(32, n_convs // 2048)

    def gen(batch: pa.Table) -> pa.Table:
        idx = batch.column("id").to_numpy(zero_copy_only=False)
        return _gen_convs(idx, n_entities, seed, hot_entity_mass, mean_turns)

    return ray.data.range(n_convs, override_num_blocks=num_blocks) \
        .map_batches(gen, batch_format="pyarrow")
