"""Property tests for `_batch_local_topk` — the candidate selector every
batch retrieval path (topk_cosine_multi, ivf_search_batch,
ivf_pq_search_batch) now routes through.  Reference semantics: the
batch-local top-k under the global total order (score desc, id asc),
with -inf-masked rows never returned — the same SET the old per-query
lexsort produced (order is unspecified: every consumer re-ranks through
a final exact window)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from compile_time_data_contracts_spark.operators.similarity import (
    _batch_local_topk,
)


def _reference(s, ids, kk):
    real = np.nonzero(s > -np.inf)[0]
    order = real[np.lexsort((ids[real], -s[real]))]
    return order[:kk]


@st.composite
def score_cases(draw):
    n = draw(st.integers(min_value=1, max_value=60))
    # duplicate-heavy pool: few distinct values forces boundary ties,
    # the regime the tie-overflow lexsort fallback exists for
    pool = draw(
        st.lists(
            st.floats(
                min_value=-1, max_value=1,
                allow_nan=False, allow_infinity=False,
            ),
            min_size=1, max_size=4,
        )
    )
    s = np.array([draw(st.sampled_from(pool)) for _ in range(n)])
    # mask a random subset to -inf (probe-mask semantics)
    mask = np.array([draw(st.booleans()) for _ in range(n)])
    s = np.where(mask, -np.inf, s)
    ids = np.arange(n, dtype=np.int64)
    kk = draw(st.integers(min_value=1, max_value=n + 5))
    return s, ids, kk


@settings(max_examples=300, deadline=None)
@given(score_cases())
def test_matches_lexsort_reference(case):
    s, ids, kk = case
    got = _batch_local_topk(s.copy(), ids, kk)
    want = _reference(s, ids, kk)
    assert set(got.tolist()) == set(want.tolist()), (s.tolist(), kk)
    assert len(got) == len(want)


def test_all_masked_returns_empty():
    s = np.full(10, -np.inf)
    assert len(_batch_local_topk(s, np.arange(10), 3)) == 0


def test_exactly_k_on_total_tie():
    s = np.ones(1000)
    out = _batch_local_topk(s, np.arange(1000), 7)
    assert set(out.tolist()) == set(range(7))  # smallest ids win
