"""Round-3 regression tests: order="auto" contract validation, map-side
join soundness guards, empty-block/value-shape edge cases, float64 score
cache parity."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from chameleon_entity_linking_ray.config import LinkageConfig
from chameleon_entity_linking_ray.pipelines.linkage import (
    blocks_range_partitioned,
    run_linkage,
)
from chameleon_entity_linking_ray.stages.agg import mean_pool_vectors
from chameleon_entity_linking_ray.stages.joins import (
    broadcast_hash_join,
    broadcast_lookup,
)
from chameleon_entity_linking_ray.stages.scoring import (
    edit_similarity,
    edit_similarity_batch,
)
from chameleon_entity_linking_ray.testing.synth import make_transcripts


class TestOrderAuto:
    def test_range_partitioned_true_on_disjoint_blocks(self):
        a = pa.table({"k": ["a", "a", "b"], "t": [0, 1, 0]})
        b = pa.table({"k": ["c", "d"], "t": [5, 0]})
        ds = rd.from_arrow(a).union(rd.from_arrow(b))
        assert blocks_range_partitioned(ds, keys=["k", "t"])

    def test_range_partitioned_false_on_overlap(self):
        a = pa.table({"k": ["a", "c"], "t": [0, 0]})
        b = pa.table({"k": ["b", "d"], "t": [0, 0]})
        ds = rd.from_arrow(a).union(rd.from_arrow(b))
        assert not blocks_range_partitioned(ds, keys=["k", "t"])

    def test_auto_falls_back_to_global_on_interleaved_input(self):
        transcripts, _ = make_transcripts(n_convs=30, n_entities=8, seed=7)
        perm = np.random.default_rng(0).permutation(transcripts.num_rows)
        shuffled = transcripts.take(pa.array(perm)) \
            .select(["conv_id", "turn_idx", "text"])
        ds = rd.from_arrow(shuffled).repartition(6)
        clustered, _ = run_linkage(ds, LinkageConfig(), order="auto")
        out = clustered.to_pandas()
        key = out[["conv_id", "turn_idx", "span_start"]]
        assert key.equals(
            key.sort_values(["conv_id", "turn_idx", "span_start"])
               .reset_index(drop=True))


class TestJoinGuards:
    def test_broadcast_join_rejects_unsound_types(self):
        big = rd.from_items([{"k": 1, "x": 2}])
        small = rd.from_items([{"k": 1, "y": 3}])
        for jt in ("right_outer", "full_outer"):
            with pytest.raises(ValueError, match="broadcast_hash_join"):
                broadcast_hash_join(big, small, on=("k",), join_type=jt)

    def test_broadcast_lookup_equal_length_list_values(self):
        ds = rd.from_items([{"k": 1}, {"k": 2}, {"k": 9}])
        mapping = {1: [1.0, 2.0], 2: [3.0, 4.0]}  # equal-length values
        # take_all, not to_pandas: Ray's pandas conversion chokes on a
        # list column containing a null (TensorArray ragged check)
        rows = {r["k"]: r["v"] for r in
                broadcast_lookup(ds, mapping, "k", "v").take_all()}
        assert list(rows[1]) == [1.0, 2.0]
        assert list(rows[2]) == [3.0, 4.0]
        assert rows[9] is None


class TestEmptyBlocks:
    def test_mean_pool_survives_filtered_empty_blocks(self):
        tbl = pa.table({"g": [1, 1, 2], "v": [[1.0, 3.0], [3.0, 5.0], [2.0, 2.0]],
                        "keep": [True, True, False]})
        ds = rd.from_arrow(tbl).repartition(3).filter(lambda r: r["keep"])
        out = mean_pool_vectors(ds.drop_columns(["keep"]), "g", "v") \
            .to_pandas().sort_values(["g", "pos"]).reset_index(drop=True)
        assert out["mean_v"].tolist() == [2.0, 4.0]


class TestScoreCacheParity:
    def test_batch_bit_equal_to_scalar_float64(self):
        pairs = [("wayne", "wbyne"), ("ind", "industries"),
                 ("acme corp", "acme inc"), ("xyz", "xyz"),
                 ("globex", "gl0bex"), ("a", "ab")]
        batch = edit_similarity_batch([a for a, _ in pairs],
                                      [b for _, b in pairs])
        assert batch.dtype == np.float64
        for (a, b), v in zip(pairs, batch):
            assert v == edit_similarity(a, b), (a, b)
