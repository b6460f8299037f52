"""Heuristic rule filter: nine per-document quality checks plus the weighted
rule score.

Reproduces the decision semantics of the reference's RuleFilter
(/root/reference/text_quality_filter/utils/rule_filter.py):
  checks F1-F9  -> rule_filter.py:34-204 (nine boolean checks, ANDed :206-260)
  rule score D1 -> rule_filter.py:262-404 (weighted partial scores, spam penalty)

Implementation is fresh: a single pass computes every raw statistic once into a
``RuleStats`` record, from which both the check booleans and the score are
derived (the reference recomputes each statistic up to three times per doc).
Regexes use Python ``re`` intentionally — parity with the reference's dialect
(unicode-aware ``\\w``) matters more than JVM-side evaluation here; the hot path
runs them inside Arrow-batched pandas UDFs.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from ..config import RuleConfig

# rule_filter.py:29-32 — identical patterns, identical dialect (Python re).
_CHINESE = re.compile(r"[一-鿿]")
_SYMBOL = re.compile(r"[^\w\s一-鿿]")
_URL = re.compile(
    r"https?://\S+|www\.\S+|[a-zA-Z0-9][a-zA-Z0-9-]{1,61}[a-zA-Z0-9]\.[a-zA-Z]{2,}"
)
# NB the reference pattern ends with '+' so findall counts *runs* of emoji,
# not individual emoji codepoints (rule_filter.py:32,172-173).
_EMOJI_RUN = re.compile(
    r"[\U0001F600-\U0001F64F\U0001F300-\U0001F5FF\U0001F680-\U0001F6FF"
    r"\U0001F700-\U0001F77F\U0001F780-\U0001F7FF\U0001F800-\U0001F8FF"
    r"\U0001F900-\U0001F9FF\U0001FA00-\U0001FA6F\U0001FA70-\U0001FAFF"
    r"\U00002702-\U000027B0\U000024C2-\U0001F251]+"
)

# rule_filter.py:387-395 — SEO spam patterns triggering the 0.3x penalty.
_SEO_SPAM = [
    re.compile(p)
    for p in (
        r"\d+\s*区\s*\d+",
        r"在线\s*播放",
        r"视频\s*一区\s*二区",
        r"久久+久+",
        r"不卡\s*一区\s*二区",
        r"精品\s*视频\s*在线",
        r"日本\s*韩国\s*欧美",
    )
]

CHECK_NAMES = (
    "length_check",
    "avg_line_check",
    "chinese_check",
    "symbol_check",
    "dup_check",
    "vbar_check",
    "comma_check",
    "url_check",
    "emoji_check",
)

# rule_filter.py:285-370 — per-check weights in CHECK_NAMES order.
_WEIGHTS = (0.05, 0.1, 0.15, 0.1, 0.1, 0.2, 0.1, 0.1, 0.1)


@dataclass
class RuleStats:
    """Raw per-document statistics, computed once."""

    n_chars: int
    avg_line_len: float  # 0.0 when no non-empty lines
    has_nonempty_line: bool
    chinese_ratio: float
    symbol_ratio: float
    dup13_ratio: float
    n_ngrams13: int
    vbar_ratio: float
    comma_ratio: float
    url_count: int
    url_density: float
    emoji_ratio: float


def compute_stats(text: str) -> RuleStats:
    n = len(text)
    lines = [ln for ln in text.split("\n") if ln.strip()]
    avg_line = (sum(len(ln) for ln in lines) / len(lines)) if lines else 0.0
    if n:
        chinese = len(_CHINESE.findall(text)) / n
        symbol = len(_SYMBOL.findall(text)) / n
        vbar = text.count("|") / n
        comma = text.count(",") / n
        urls = len(_URL.findall(text))
        emoji = len(_EMOJI_RUN.findall(text)) / n
    else:
        chinese = symbol = vbar = comma = emoji = 0.0
        urls = 0
    # 13-gram internal duplication (rule_filter.py:179-204)
    if n >= 13:
        total = n - 12
        uniq = len({text[i : i + 13] for i in range(total)})
        dup13 = 1.0 - uniq / total
    else:
        total = 0
        dup13 = 0.0
    return RuleStats(
        n_chars=n,
        avg_line_len=avg_line,
        has_nonempty_line=bool(lines),
        chinese_ratio=chinese,
        symbol_ratio=symbol,
        dup13_ratio=dup13,
        n_ngrams13=total,
        vbar_ratio=vbar,
        comma_ratio=comma,
        url_count=urls,
        url_density=urls / n if n else 0.0,
        emoji_ratio=emoji,
    )


def check_flags(st: RuleStats, cfg: RuleConfig) -> dict[str, bool]:
    """The nine booleans of rule_filter.py:206-260 (empty text fails the
    ratio checks per the `if not text` guards at :74,:93,:112,:131,:150,:169)."""
    nonempty = st.n_chars > 0
    return {
        "length_check": st.n_chars >= cfg.min_text_length,
        "avg_line_check": st.has_nonempty_line
        and st.avg_line_len >= cfg.min_avg_line_length,
        "chinese_check": nonempty and st.chinese_ratio >= cfg.min_chinese_ratio,
        "symbol_check": nonempty and st.symbol_ratio <= cfg.max_symbol_ratio,
        "dup_check": st.dup13_ratio <= cfg.max_internal_dup_ratio,
        "vbar_check": nonempty and st.vbar_ratio <= cfg.max_vertical_bar_ratio,
        "comma_check": nonempty and st.comma_ratio <= cfg.max_comma_ratio,
        "url_check": nonempty and st.url_density <= cfg.max_url_density,
        "emoji_check": nonempty and st.emoji_ratio <= cfg.max_emoji_ratio,
    }


def check_reasons(st: RuleStats, flags: dict[str, bool], cfg: RuleConfig) -> dict[str, str]:
    """Failure-reason strings, byte-identical to rule_filter.py's f-strings."""
    r: dict[str, str] = {}
    r["length_check"] = (
        ""
        if flags["length_check"]
        else f"文本长度({st.n_chars})小于最小长度要求({cfg.min_text_length})"
    )
    if flags["avg_line_check"]:
        r["avg_line_check"] = ""
    elif not st.has_nonempty_line:
        r["avg_line_check"] = "文本没有非空行"
    else:
        r["avg_line_check"] = (
            f"平均行长度({st.avg_line_len:.2f})小于最小要求({_fmt_num(cfg.min_avg_line_length)})"
        )
    empty = st.n_chars == 0
    r["chinese_check"] = _ratio_reason(
        flags["chinese_check"], empty,
        f"中文字符比例({st.chinese_ratio:.2f})小于最小要求({cfg.min_chinese_ratio})")
    r["symbol_check"] = _ratio_reason(
        flags["symbol_check"], empty,
        f"符号比例({st.symbol_ratio:.2f})大于最大要求({cfg.max_symbol_ratio})")
    r["dup_check"] = (
        ""
        if flags["dup_check"]
        else f"内部重复率({st.dup13_ratio:.2f})大于最大要求({cfg.max_internal_dup_ratio})"
    )
    r["vbar_check"] = _ratio_reason(
        flags["vbar_check"], empty,
        f"'|'符号比例({st.vbar_ratio:.4f})超过阈值({cfg.max_vertical_bar_ratio})")
    r["comma_check"] = _ratio_reason(
        flags["comma_check"], empty,
        f"','符号比例({st.comma_ratio:.4f})超过阈值({cfg.max_comma_ratio})")
    r["url_check"] = _ratio_reason(
        flags["url_check"], empty,
        f"URL密度({st.url_density:.4f})超过阈值({cfg.max_url_density})")
    r["emoji_check"] = _ratio_reason(
        flags["emoji_check"], empty,
        f"表情符号比例({st.emoji_ratio:.4f})超过阈值({cfg.max_emoji_ratio})")
    return r


def _fmt_num(x: float) -> str:
    # reference configs hold ints; f-strings render them without decimals
    return str(int(x)) if float(x).is_integer() else str(x)


def _ratio_reason(passed: bool, empty: bool, msg: str) -> str:
    if passed:
        return ""
    return "文本为空" if empty else msg


def rule_score(text: str, st: RuleStats, flags: dict[str, bool], cfg: RuleConfig) -> float:
    """Weighted rule score (rule_filter.py:262-404).

    All-pass -> 1.0; otherwise a weighted mean of nine partial scores with
    capped vbar (<=0.5) and URL (<=0.3) sub-scores, then a 0.3x penalty when
    obvious-spam signals fire.

    Raises ZeroDivisionError on empty text, matching the reference
    (rule_filter.py:383 divides by len(text) unconditionally); callers treat
    that as a per-document error (main.py:304-307).
    """
    if all(flags.values()):
        return 1.0

    scores = []
    # length (:280-285)
    scores.append(1.0 if flags["length_check"] else min(1.0, st.n_chars / cfg.min_text_length))
    # avg line length (:288-297)
    if flags["avg_line_check"]:
        scores.append(1.0)
    elif st.has_nonempty_line:
        scores.append(min(1.0, st.avg_line_len / cfg.min_avg_line_length))
    else:
        scores.append(0.0)
    # chinese ratio (:300-306)
    scores.append(
        1.0 if flags["chinese_check"] else min(1.0, st.chinese_ratio / cfg.min_chinese_ratio)
    )
    # symbol ratio (:309-318) — ratio==0 can't fail the check, but keep the branch
    if flags["symbol_check"]:
        scores.append(1.0)
    else:
        scores.append(
            1.0 if st.symbol_ratio == 0 else max(0.0, min(1.0, cfg.max_symbol_ratio / st.symbol_ratio))
        )
    # internal dup (:321-332)
    if flags["dup_check"]:
        scores.append(1.0)
    elif st.n_chars < 13:
        scores.append(1.0)
    else:
        scores.append(
            max(0.0, min(1.0, cfg.max_internal_dup_ratio / st.dup13_ratio))
            if st.dup13_ratio > 0
            else 1.0
        )
    # vertical bar, capped at 0.5 (:335-342)
    if flags["vbar_check"]:
        scores.append(1.0)
    else:
        scores.append(
            max(0.0, min(0.5, cfg.max_vertical_bar_ratio / st.vbar_ratio))
            if st.vbar_ratio > 0
            else max(0.0, min(0.5, 1.0))
        )
    # comma (:345-351)
    if flags["comma_check"]:
        scores.append(1.0)
    else:
        scores.append(
            max(0.0, min(1.0, cfg.max_comma_ratio / st.comma_ratio))
            if st.comma_ratio > 0
            else 1.0
        )
    # URL density, capped at 0.3 (:354-361)
    if flags["url_check"]:
        scores.append(1.0)
    else:
        scores.append(
            max(0.0, min(0.3, cfg.max_url_density / st.url_density))
            if st.url_density > 0
            else max(0.0, min(0.3, 1.0))
        )
    # emoji (:364-370)
    if flags["emoji_check"]:
        scores.append(1.0)
    else:
        scores.append(
            max(0.0, min(1.0, cfg.max_emoji_ratio / st.emoji_ratio))
            if st.emoji_ratio > 0
            else 1.0
        )

    weighted = sum(s * w for s, w in zip(scores, _WEIGHTS)) / sum(_WEIGHTS)

    # obvious-spam penalty (:375-403). NB :383 divides by len(text) with no
    # guard — empty text raises, reproduced deliberately (see docstring).
    spam = False
    if "|" in text and text.count("|") / len(text) > cfg.max_vertical_bar_ratio * 2:
        spam = True
    if len(_URL.findall(text)) / len(text) > cfg.max_url_density * 3:
        spam = True
    if not spam:
        spam = any(p.search(text) for p in _SEO_SPAM)
    return weighted * 0.3 if spam else weighted


def evaluate_rules(text: str, cfg: RuleConfig) -> tuple[bool, dict[str, bool], float, RuleStats]:
    """One-pass evaluation: (all_passed, flags, rule_score, stats)."""
    st = compute_stats(text)
    flags = check_flags(st, cfg)
    score = rule_score(text, st, flags, cfg)
    return all(flags.values()), flags, score, st
