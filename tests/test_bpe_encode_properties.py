"""Property-based BPE-encoder test (hypothesis): the wrapped-string
replace-fold must equal the reference left-to-right non-overlapping
apply rule for ANY chained merge table — including merge lists whose
minted symbols collide with other symbols' prefixes/suffixes, the class
the fixed adversarial cases in test_bpe_encode_chunking sample by hand.

One Spark job per hypothesis example (a batch of words), so the run
stays seconds, not minutes.
"""

from __future__ import annotations

import pytest

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    HAVE_HYP = True
except ImportError:  # pragma: no cover
    HAVE_HYP = False

from ia_hadoop_tools_spark.operators.bpe import bpe_encode
from tests.test_bpe_encode_chunking import ref_encode_word

pytestmark = pytest.mark.skipif(not HAVE_HYP, reason="hypothesis not installed")

ALPHABET = "abc"


@st.composite
def chained_merges(draw, max_merges: int = 6):
    """Merge lists built the way training builds them: each step pairs
    two symbols from the CURRENT pool and mints their concatenation —
    so later merges can reference earlier minted symbols, and distinct
    histories can mint colliding strings."""
    pool = list(ALPHABET)
    merges = []
    n = draw(st.integers(0, max_merges))
    for _ in range(n):
        a = draw(st.sampled_from(pool))
        b = draw(st.sampled_from(pool))
        merges.append((a, b))
        if a + b not in pool:
            pool.append(a + b)
    return merges


words_strategy = st.lists(
    st.text(alphabet=ALPHABET, min_size=1, max_size=10),
    min_size=1,
    max_size=25,
    unique=True,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(words=words_strategy, merges=chained_merges())
def test_encoder_matches_reference(spark, words, merges):
    df = spark.createDataFrame([(w,) for w in words], ["text"])
    got = {
        r.text: r.tokens
        for r in bpe_encode(df, merges).select("text", "tokens").collect()
    }
    for w in words:
        assert got[w] == ref_encode_word(w, merges), (w, merges)
