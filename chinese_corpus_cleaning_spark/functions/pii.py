"""Regex-based PII masking: mainland mobile phones, 18-digit resident IDs,
URLs, email addresses, IPv4 addresses — the "regex-based PII/toxicity
scrub (phone, ID-number, URL)" the reference applies via its word-list
DFA + URL rule but never masks, extended with the remaining
Dolma-standard classes (email/IP; Soldaini et al. 2024 §2).

Pattern provenance (reference, cited per CLAUDE.md):
  - phone: the reference's own ad-spam fixtures plant mainland mobiles
    (text_quality_filter/test_filter.py:104,117 — 13917340054 /
    13888888888); the mask pattern is the dialable 11-digit shape
    1[3-9] + 9 digits.
  - URL: generalizes rule_filter.py:31's url_pattern
    (https?://\\S+|www\\.\\S+|bare-domain). Python's \\S would swallow
    adjacent CJK prose (fine for the reference's density COUNTING, wrong
    for masking), so the masking form replaces \\S+ with an explicit
    URL-character class that stops at CJK and whitespace.
  - ID: 18-digit resident ID, checksum-AGNOSTIC by design (a masker must
    not leak "this one had a bad checksum" by skipping it): plausible
    date shape (19|20 century, month 01-12, day 01-31), trailing
    digit/X/x (lowercase x so the mask composes AFTER the reference's
    lowercasing DFA scrub, sensitive_filter.py:82).

Cross-engine portability (Spark/Java regex == DuckDB/RE2 == Python re):
  - Boundary guards are ASCII-word boundaries ("no [0-9A-Za-z_] adjacent")
    but are SPELLED per dialect, because the obvious spellings disagree
    (measured, not assumed): Java's `\\b` is Unicode-aware even WITHOUT
    UNICODE_CHARACTER_CLASS (a documented JDK asymmetry — `\\w` is ASCII
    but `\\b` is not), so `电话13917340054` has NO Java `\\b` before the
    digits, while RE2's `\\b` and Python's re.ASCII `\\b` are ASCII and
    see one. RE2 in turn has NO lookarounds. Hence: RE2/Python get `\\b`
    (Python compiled with re.ASCII), Java gets the equivalent explicit
    lookarounds (?<![0-9A-Za-z_]) / (?![0-9A-Za-z_]) — equivalent because
    every boundary-guarded pattern edge matches an ASCII word char, so
    `\\b` there reduces to exactly "adjacent char is not ASCII-word".
    tests/test_pii.py pins the three-engine agreement.
  - Full-width digits (U+FF10-19, the CLAUDE.md \\p{Nd} landmine — real
    Chinese spam writes １３９...) are handled by FOLDING them to ASCII via
    translate() BEFORE matching, not by widening the classes: \\p{Nd}
    inside a \\b-guarded pattern is unsound (full-width digits are not
    ASCII word chars, so a match ending on one can never satisfy the
    trailing \\b). translate() exists natively in Spark, DuckDB and Python.
  - Mask order is EMAIL -> URL -> ID -> PHONE -> IP: a phone/ID inside a
    URL is masked as part of the URL, never double-counted; email runs
    before the URL rules because RE2 has no lookbehind to keep the
    bare-domain arm off an email's domain part (see _EMAIL_TEMPLATE's
    comment); `\\b` guards are zero-width,
    so back-to-back occurrences ("13917340054,13888888888") both mask in
    one pass (a consumed-context guard like ([^0-9]|$) would skip every
    second one).

tests/test_pii.py pins three-engine agreement (Spark vs DuckDB vs this
module's Python twin) on an adversarial fixture corpus.
"""

from __future__ import annotations

import re

FULLWIDTH_DIGITS = "０１２３４５６７８９"
ASCII_DIGITS = "0123456789"
# The fold also covers full-width Ｘ/ｘ: a resident ID's check character
# is X in real full-width Chinese text (and lowercase ｘ after the DFA
# scrub's lowercasing), and the ID pattern's [0-9Xx] tail would
# otherwise never match — the ID leaked UNMASKED through all three
# engines (review finding; tests/test_pii.py pins the fixture).
PII_FOLD_SRC = FULLWIDTH_DIGITS + "Ｘｘ"
PII_FOLD_DST = ASCII_DIGITS + "Xx"
_FOLD_TABLE = str.maketrans(PII_FOLD_SRC, PII_FOLD_DST)

# RFC 3986 chars minus quote/comma/semicolon/brackets/parens (prose
# punctuation far more often ends a URL mention than belongs to one);
# identical class syntax is valid in Java regex, RE2 and Python re.
_URL_CHARS = r"[-A-Za-z0-9._~:/?#@!$&*+=%]"

# {LB}/{RB} = ASCII-word boundary, spelled per dialect (see module doc)
_URL_TEMPLATE = (
    rf"https?://{_URL_CHARS}+"
    rf"|www\.{_URL_CHARS}+"
    r"|{LB}[A-Za-z0-9][A-Za-z0-9-]{{1,61}}[A-Za-z0-9]\.[A-Za-z]{{2,}}{RB}"
)
_ID_TEMPLATE = (
    r"{LB}[1-9][0-9]{{5}}(19|20)[0-9]{{2}}"
    r"(0[1-9]|1[0-2])(0[1-9]|[12][0-9]|3[01])"
    r"[0-9]{{3}}[0-9Xx]{RB}"
)
_PHONE_TEMPLATE = r"{LB}1[3-9][0-9]{{9}}{RB}"
# Email and IPv4 (the remaining Dolma-standard PII classes; Soldaini et
# al. 2024 §2 masks email/phone/IP). Email masks BEFORE the URL rules —
# RE2 has no lookbehind, so the bare-domain URL arm cannot be taught to
# skip an email's domain part; masking the email first means
# 'a@b.com' -> '<EMAIL>' instead of 'a@<URL>'. Consequence (documented,
# deliberate): a userinfo URL 'https://user@host.com/x' masks its
# embedded email. The first local-part char is required alphanumeric so
# the ASCII-word boundary stays sound. IPv4 masks LAST (octet-exact
# 0-255; no dots in phones/IDs, no TLD letters in IPs — no interference);
# a longer dotted run like '1.2.3.4.5' masks its first valid quad, same
# as the published regex sets.
_EMAIL_TEMPLATE = (
    r"{LB}[A-Za-z0-9][A-Za-z0-9._%+-]*@"
    r"[A-Za-z0-9][A-Za-z0-9.-]*\.[A-Za-z]{{2,}}{RB}"
)
_IP_OCTET = r"(25[0-5]|2[0-4][0-9]|1[0-9]{{2}}|[1-9]?[0-9])"
_IP_TEMPLATE = r"{LB}(" + _IP_OCTET + r"\.){{3}}" + _IP_OCTET + r"{RB}"

_BOUNDS = {
    "re2": {"LB": r"\b", "RB": r"\b"},
    "java": {"LB": r"(?<![0-9A-Za-z_])", "RB": r"(?![0-9A-Za-z_])"},
}

URL_TOKEN = "<URL>"
ID_TOKEN = "<ID>"
PHONE_TOKEN = "<PHONE>"
EMAIL_TOKEN = "<EMAIL>"
IP_TOKEN = "<IP>"

# canonical reason order for the pii_reasons list (mask-count columns and
# the reasons array in all three engines follow this)
REASON_ORDER = ("phone", "id_number", "url", "email", "ip")


def pii_rules(dialect: str = "re2") -> tuple[tuple[str, str, str], ...]:
    """(reason, pattern, token) in MASK ORDER — longest/outermost first
    (email precedes the URL rules, see _EMAIL_TEMPLATE's comment).
    dialect 're2' (DuckDB, Python+re.ASCII) or 'java' (Spark)."""
    b = _BOUNDS[dialect]
    return (
        ("email", _EMAIL_TEMPLATE.format(**b), EMAIL_TOKEN),
        ("url", _URL_TEMPLATE.format(**b), URL_TOKEN),
        ("id_number", _ID_TEMPLATE.format(**b), ID_TOKEN),
        ("phone", _PHONE_TEMPLATE.format(**b), PHONE_TOKEN),
        ("ip", _IP_TEMPLATE.format(**b), IP_TOKEN),
    )


PII_RULES = pii_rules("re2")

# re.ASCII pins \b to the ASCII-word semantics RE2 uses (see module doc)
_COMPILED = tuple(
    (reason, re.compile(pat, re.ASCII), tok) for reason, pat, tok in PII_RULES
)


def fold_width(text: str) -> str:
    """Full-width digits -> ASCII; the mandatory pre-step for all patterns."""
    return text.translate(_FOLD_TABLE)


def mask_pii(text: str | None) -> tuple[str | None, list[str], dict[str, int]]:
    """Python twin of the native-Column chain (the differential oracle for
    tests): returns (masked_text, reasons, counts). NULL passes through with
    empty reasons. Counts are per-type match counts on the progressively
    masked text (a phone inside a URL counts as url only)."""
    if text is None:
        return None, [], {r: 0 for r, _, _ in PII_RULES}  # matches the
        # Column chain's coalesce(regexp_count(NULL), 0)
    t = fold_width(text)
    counts: dict[str, int] = {}
    for reason, rx, tok in _COMPILED:
        t, counts[reason] = rx.subn(tok, t)
    reasons = [r for r in REASON_ORDER if counts[r] > 0]
    return t, reasons, counts


# --------------------------------------------------------------- Spark side


def pii_columns(text_col):
    """dict of native Columns implementing exactly mask_pii over ``text_col``
    (a name or Column): keys pii_text, pii_reasons, and one n_<reason>
    count per REASON_ORDER entry (n_phone, n_id_number, n_email, n_url,
    n_ip). Pure map-side projection — no UDF, no shuffle; regexes ride as
    literals (SQL string literals eat backslashes — CLAUDE.md landmine)."""
    from pyspark.sql import functions as F

    col = F.col(text_col) if isinstance(text_col, str) else text_col
    t = F.translate(col, PII_FOLD_SRC, PII_FOLD_DST)
    counts = {}
    for reason, pat, tok in pii_rules("java"):
        counts[reason] = F.coalesce(
            F.regexp_count(t, F.lit(pat)), F.lit(0)
        ).cast("bigint")
        t = F.regexp_replace(t, F.lit(pat), F.lit(tok))
    reasons = F.array_compact(
        F.array(
            *(F.when(counts[r] > 0, F.lit(r)) for r in REASON_ORDER)
        )
    )
    out = {"pii_text": t, "pii_reasons": reasons}
    out.update({f"n_{r}": counts[r] for r in REASON_ORDER})
    return out


def pii_sql_chain(expr: str) -> dict[str, str]:
    """The identical chain as DuckDB SQL snippets over ``expr`` (RE2 needs
    the 'g' flag — DuckDB's regexp_replace is first-match-only by default,
    Spark's is global). Keys mirror pii_columns; used by plans/oracles.py."""
    t = f"translate({expr}, '{PII_FOLD_SRC}', '{PII_FOLD_DST}')"
    out = {}
    for reason, pat, tok in PII_RULES:
        esc = pat.replace("'", "''")
        # coalesce: NULL text must count 0, matching mask_pii and
        # pii_columns (which coalesces regexp_count(NULL) to 0)
        out[f"n_{reason}"] = (
            f"coalesce(len(regexp_extract_all({t}, '{esc}')), 0)::bigint"
        )
        t = f"regexp_replace({t}, '{esc}', '{tok}', 'g')"
    out["pii_text"] = t
    return out
