"""Round-5 fixes, each pinned by a regression test.

1. ModelPairScorer/_embed_surfaces cache-cap eviction hazard (ADVICE r4,
   medium): when an actor crossed ``_cache_cap`` on a batch mixing cached
   and new surfaces, the clear ran AFTER todo was computed, evicting the
   cached surfaces without re-insertion -> KeyError on the post-call
   ``_emb_cache[t]`` lookup. Fixed by clearing before computing todo and
   by embedding left+right in ONE call in bi-mode __call__.
"""

import numpy as np
import pyarrow as pa
import pytest
import ray

from chameleon_entity_linking_ray.stages.model import (
    ModelEmbedder,
    ModelPairScorer,
    SyntheticWeights,
)


@pytest.fixture(scope="module")
def weights_ref():
    return ray.put(SyntheticWeights())


def _pairs_table(pairs):
    return pa.table({
        "left_text": pa.array([p[0] for p in pairs], pa.string()),
        "right_text": pa.array([p[1] for p in pairs], pa.string())})


def test_emb_cache_cap_mixed_batch_no_keyerror(weights_ref):
    """A batch mixing cached + new surfaces while the cache sits at cap
    must not KeyError, and must score identically to an uncapped actor."""
    s = [f"surface {i} token" for i in range(8)]
    capped = ModelPairScorer(weights_ref=weights_ref, mode="bi")
    capped._cache_cap = 4
    fresh = ModelPairScorer(weights_ref=weights_ref, mode="bi")

    # batch 1 fills the capped cache exactly to cap (4 distinct surfaces)
    b1 = _pairs_table([(s[0], s[1]), (s[2], s[3])])
    # batch 2 mixes cached (s0, s1) with new (s4, s5): pre-fix this
    # raised KeyError on s0 after the cap-clear evicted it
    b2 = _pairs_table([(s[0], s[4]), (s[1], s[5])])
    out1c, out2c = capped(b1), capped(b2)
    out1f, out2f = fresh(b1), fresh(b2)
    assert len(capped._emb_cache) <= 6
    np.testing.assert_array_equal(out1c.column("score").to_numpy(),
                                  out1f.column("score").to_numpy())
    np.testing.assert_array_equal(out2c.column("score").to_numpy(),
                                  out2f.column("score").to_numpy())


def test_emb_cache_cap_bi_mode_right_side_survives(weights_ref):
    """bi-mode embeds left+right in one _embed_surfaces call: a cap-clear
    triggered by the right side can no longer evict left-side entries."""
    s = [f"txt {i} alpha" for i in range(10)]
    m = ModelPairScorer(weights_ref=weights_ref, mode="bi")
    m._cache_cap = 3
    # 5 distinct surfaces per side; with cap 3 the old two-call flow
    # cleared between left and right and KeyError'd on the left lookup
    tb = _pairs_table(list(zip(s[:5], s[5:])))
    out = m(tb)
    assert out.num_rows == 5
    scores = out.column("score").to_numpy()
    assert np.all((scores >= 0.0) & (scores <= 1.0))


def test_embedder_cache_cap_stream(weights_ref):
    """ModelEmbedder streaming distinct surfaces across the cap: every
    batch's lookups succeed and embeddings equal the uncapped actor's."""
    capped = ModelEmbedder(weights_ref=weights_ref)
    capped._cache_cap = 4
    fresh = ModelEmbedder(weights_ref=weights_ref)
    texts = [f"doc {i} body words" for i in range(12)]
    # overlapping windows force cached+new mixes at the cap boundary
    for lo in range(0, 9, 3):
        tb = pa.table({"text": pa.array(texts[lo:lo + 6], pa.string())})
        got = capped(tb).column("embedding").to_numpy(zero_copy_only=False)
        want = fresh(tb).column("embedding").to_numpy(zero_copy_only=False)
        for g, w in zip(got, want):
            # re-embedded surfaces land in different sub-batch collates
            # (fp non-associativity) -> allclose, not bit-equal
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       rtol=1e-4, atol=1e-5)
