"""Feature-word (spam/toxicity) density predicate and banded feature score.

Reproduces the decision semantics of the reference's FeatureWordsDetector with
its default DFA engine (use_dfa_filter=True, config.py:26):
  check_feature_words -> /root/reference/text_quality_filter/utils/feature_words.py:170-214
  get_feature_score   -> feature_words.py:231-314

Fresh implementation notes:
  * The reference runs one DFA detect over the full text plus one per line,
    then ``get_feature_score`` re-runs all of it. Keyword matches never span a
    newline (a keyword would need a literal ``\\n`` to cross one, and the
    shortest-match restart never jumps lines), so a single full-text scan with
    match *positions* yields both the global match list and per-line counts.
    One scan instead of 2x(1 + n_lines).
  * Per-line average quirk kept: counts come from every non-blank line, but
    the denominator is the number of lines with >= 5 stripped chars
    (feature_words.py:184-205).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from ..config import FeatureConfig
from .dfa import scan_positions as _dfa_scan_positions

# feature_words.py:246-248 — presence of any of these in text.lower() adds 3.
HIGH_WEIGHT_KEYWORDS = (
    "色情", "赌博", "特价", "促销", "优惠", "免费", "限时",
    "加QQ", "加微信", "http://", "www.", "点击", "链接",
    "联系电话", "约炮", "一夜情",
)

# feature_words.py:251 — excluded from the unique-match count.
COMMON_WORDS = frozenset(("系统", "手机", "电话", "网络", "联系", "人才", "招聘"))

# feature_words.py:280-286 — negative-context regexes over the ORIGINAL text.
_NEGATIVE_CONTEXT = [
    re.compile(p)
    for p in (
        r"不包含.*?(色情|赌博|广告)",
        r"没有.*?(色情|赌博|广告)",
        r"禁止.*?(色情|赌博|广告)",
        r"反对.*?(色情|赌博|广告)",
        r"拒绝.*?(色情|赌博|广告)",
    )
]


def scan_with_positions(message: str, trie: dict) -> list[tuple[int, str]]:
    """DFA shortest-match scan returning ``[(start_pos, word), ...]`` over the
    lowercased message (walk semantics of sensitive_filter.py:106-134).
    Delegates to the combined scrub+detect walk in functions/dfa.py."""
    return _dfa_scan_positions(message, trie)[1]


@dataclass
class FeatureResult:
    passed: bool
    feature_count: int
    feature_words: list[str]
    avg_per_line: float
    score: float


def evaluate_features(
    text: str,
    trie: dict,
    cfg: FeatureConfig,
    matches: list[tuple[int, str]] | None = None,
) -> FeatureResult:
    """check_feature_words + get_feature_score in one pass.

    ``matches`` may carry precomputed DFA match positions (from the combined
    scrub+detect walk in operators/quality.py) to avoid rescanning.

    Empty text: the reference's get_feature_score returns 0.0 up front
    (feature_words.py:235-237) while check_feature_words reports pass with no
    valid lines (avg 0 <= threshold) — both reproduced.
    """
    if matches is None:
        matches = scan_with_positions(text, trie)
    words = [w for _, w in matches]

    # per-line counts via match positions (equivalent to the reference's
    # per-line count_sensitive_words calls, feature_words.py:184-198).
    # Positions come from the LOWERCASED text (dfa.py:62); str.lower() is not
    # always length-preserving ('İ' -> 'i̇'), and on such texts lowered
    # offsets skew against the original line boundaries — fall back to the
    # reference's literal per-line rescan, which lowercases each line
    # independently and never maps positions across the case fold.
    line_counts_sum = 0
    valid_line_count = 0
    if len(text.lower()) != len(text):
        for line in text.split("\n"):
            if line.strip():
                line_counts_sum += len(scan_with_positions(line, trie))
            if len(line.strip()) >= 5:
                valid_line_count += 1
    else:
        pos = 0
        mi = 0
        nm = len(matches)
        for line in text.split("\n"):
            end = pos + len(line)
            if line.strip():
                while mi < nm and matches[mi][0] < end:
                    line_counts_sum += 1
                    mi += 1
            else:
                # matches cannot start inside a blank line (no keyword is
                # pure whitespace after strip), so no skipping needed
                pass
            if len(line.strip()) >= 5:
                valid_line_count += 1
            pos = end + 1  # +1 for the '\n'

    avg = line_counts_sum / valid_line_count if valid_line_count > 0 else 0.0
    passed = avg <= cfg.max_feature_words_per_line

    # --- get_feature_score (feature_words.py:231-314) ---
    if not text:
        return FeatureResult(passed, len(words), words, avg, 0.0)

    unique_adjusted = {w for w in words if w not in COMMON_WORDS}
    lower = text.lower()
    high_weight = sum(3 for kw in HIGH_WEIGHT_KEYWORDS if kw in lower)
    adjusted_count = len(unique_adjusted) + high_weight

    total_chars = len(text)
    ratio = adjusted_count / (total_chars / 10) if total_chars > 0 else 1.0

    negative = any(p.search(text) for p in _NEGATIVE_CONTEXT)
    if negative:
        ratio = ratio * 0.3

    if ratio > 0.2:
        score = 0.0
    elif ratio > 0.1:
        score = 0.2
    elif ratio > 0.05:
        score = 0.5
    elif ratio > 0.01:
        score = 0.8
    else:
        score = 1.0

    if negative and ratio < 0.05:
        score = max(score, 0.8)

    return FeatureResult(passed, len(words), words, avg, score)
