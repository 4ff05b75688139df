"""IVF ANN: the k-means-quantized scale path must (a) equal brute force
exactly when probing every cell, (b) keep high recall at partial probe,
(c) be deterministic run-to-run (seed-free init + fixed iterations)."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.01"


def _frame(ds):
    return ds.to_pandas().sort_values(["query_id", "rnk"]) \
        .reset_index(drop=True)


class TestAnnIvf:
    def test_full_probe_equals_bruteforce(self):
        from chameleon_entity_linking_ray.pipelines.corpus import (
            ann_ivf_topk,
            ann_topk,
        )
        brute = _frame(ann_topk(SF))
        ivf = _frame(ann_ivf_topk(SF, n_centroids=16, n_probe=16))
        pd.testing.assert_frame_equal(ivf, brute)

    def test_partial_probe_recall(self):
        from chameleon_entity_linking_ray.pipelines.corpus import (
            ann_ivf_topk,
            ann_topk,
        )
        brute = _frame(ann_topk(SF))
        ivf = _frame(ann_ivf_topk(SF, n_centroids=16, n_probe=4))
        hits = tot = 0
        for q, sub in brute.groupby("query_id"):
            truth = set(sub["vec_id"])
            got = set(ivf[ivf["query_id"] == q]["vec_id"])
            hits += len(truth & got)
            tot += len(truth)
        recall = hits / tot
        assert recall >= 0.8, f"recall@k {recall:.3f} < 0.8 at n_probe=4"

    def test_deterministic(self):
        from chameleon_entity_linking_ray.pipelines.corpus import (
            ann_ivf_topk,
        )
        a = _frame(ann_ivf_topk(SF, n_probe=4))
        b = _frame(ann_ivf_topk(SF, n_probe=4))
        pd.testing.assert_frame_equal(a, b)
