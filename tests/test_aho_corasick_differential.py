"""W2 Aho-Corasick differential tests: our flat-array automaton vs the
reference AhoCorasick executed as an oracle (feature_words.py:12-103), plus
the use_dfa_filter=False branch of FeatureWordsDetector.check_feature_words.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from chinese_corpus_cleaning_spark.functions.aho_corasick import (
    build_automaton,
    check_feature_words_ac,
)

# overlapping / nested / shared-prefix patterns, CJK and ASCII
AC_PATTERNS = [
    "赌博", "博", "赌", "特价", "价格", "点击链接", "点击", "击链",
    "a", "ab", "aba", "bab", "spark", "park", "ark", "spa",
]

_ATOMS = st.sampled_from(
    ["赌", "博", "特", "价", "格", "点", "击", "链", "接", "a", "b", "s",
     "p", "r", "k", " ", "\n", "x", "spark", "aba", "点击链接", "特价格"]
)
ac_texts = st.lists(_ATOMS, min_size=0, max_size=80).map("".join)


@pytest.fixture(scope="module")
def ref_ac(ref_modules):  # ref_modules import pulls in feature_words
    import sys

    sys.path.insert(0, "/root/reference")
    from text_quality_filter.utils.feature_words import AhoCorasick  # type: ignore

    ac = AhoCorasick()
    for p in AC_PATTERNS:
        ac.add_pattern(p)
    ac.build()
    return ac


@pytest.fixture(scope="module")
def ours():
    return build_automaton(AC_PATTERNS)


@settings(max_examples=400, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(text=ac_texts)
def test_search_matches_reference(ref_ac, ours, text):
    # the reference iterates Python sets, so ITS emission order is
    # nondeterministic — compare the match multiset
    assert sorted(ours.search(text)) == sorted(ref_ac.search(text))


def test_all_overlapping_semantics(ours):
    """'spark' yields ALL five overlapping/nested matches (spa, spark, park,
    ark, a) — which the DFA shortest-match engine cannot emit. Positions
    carry the reference's quirk (feature_words.py:96-101): every pattern in
    a node's fail-merged output set reports the deepest node's start, so
    park/ark/a all report start 0 here."""
    got = sorted(ours.search("spark"))
    assert got == sorted(
        [(0, "spa"), (0, "spark"), (0, "park"), (0, "ark"), (0, "a")]
    )


def test_case_sensitivity_quirk(ours, ref_ac):
    """The AC path searches RAW text (no lowercasing), unlike the DFA path."""
    assert ours.search("SPARK") == ref_ac.search("SPARK") == []


@pytest.fixture(scope="module")
def ref_detector(ref_modules, tmp_path_factory):
    import sys

    sys.path.insert(0, "/root/reference")
    from text_quality_filter.utils.feature_words import (  # type: ignore
        FeatureWordsDetector,
    )

    words_file = tmp_path_factory.mktemp("ac") / "feature_words.txt"
    words_file.write_text("\n".join(AC_PATTERNS), encoding="utf-8")
    return FeatureWordsDetector(
        {
            "feature_words_path": str(words_file),
            "max_feature_words_per_line": 0.5,
            "use_dfa_filter": False,
        }
    )


@settings(max_examples=200, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(text=ac_texts)
def test_check_feature_words_ac_matches_reference(ref_detector, ours, text):
    ref_passed, ref_details = ref_detector.check_feature_words(text)
    passed, details = check_feature_words_ac(text, ours, 0.5)
    assert passed == ref_passed
    assert details["feature_count"] == ref_details["feature_count"]
    assert details["avg_per_line"] == ref_details["avg_per_line"]
    assert sorted(details["feature_words"]) == sorted(ref_details["feature_words"])


def test_multiline_per_line_quirk(ours):
    """A word matched twice globally counts twice in EVERY line containing
    it (feature_words.py:190-196) — the quirk the per-line average keeps."""
    text = "spark here\nspark again\nno hits."
    passed, details = check_feature_words_ac(text, ours, 10.0)
    # global matches: 2x spark, 2x spa, 2x park, 2x ark, 4x a ('spark'x2,'again')
    # lines 1-2 each contain spark/spa/park/ark/a -> each instance counts in
    # both lines; line 3 contains none of the matched words... except none.
    ref_count = details["feature_count"]
    assert ref_count == len(ours.search(text))
    assert details["avg_per_line"] > ref_count / 3  # double counting visible
