"""Aho-Corasick all-overlapping-matches engine (W2).

Reproduces the match semantics of the reference's AhoCorasick
(/root/reference/text_quality_filter/utils/feature_words.py:12-103 — build
:38-71, search :73-103), the engine selected when ``use_dfa_filter: False``.
Unlike the DFA path (shortest-match, lowercased, scan restarts after a hit),
the AC path reports EVERY occurrence of EVERY pattern, including overlapping
and nested ones, on the RAW (non-lowercased) text — both quirks are kept.

Fresh implementation notes:
  * Flat-array automaton (``goto``: list of {char: state}, ``fail``:
    list[int], ``out``: list of pattern-index lists) instead of the
    reference's nested dicts keyed by ``id(node)``. Flat arrays pickle
    without recursion-limit issues (the nested trie could not be broadcast
    directly — see sources/wordlists.TrieBox) and make the per-state output
    sets explicit pattern indices, so matches can be emitted in a
    deterministic order (the reference iterates a Python set).
  * Output lists are sorted by pattern index at build time; matches are
    emitted in text order, ties by insertion order of the pattern — a
    deterministic refinement of the reference's set-iteration order (the
    reference's own output ORDER is nondeterministic across hash seeds; the
    match MULTISET is identical and is what the differential test asserts).
  * ``check_feature_words_ac`` reproduces the reference's quirky per-line
    accounting for the AC engine (feature_words.py:180-198): every global
    match instance contributes +1 to EVERY non-blank line that contains the
    matched word as a substring — NOT a per-line rescan.
"""

from __future__ import annotations

from collections import deque
from collections.abc import Iterable, Sequence


class AhoCorasickAutomaton:
    """Immutable-after-build automaton. Safe to pickle/broadcast."""

    __slots__ = ("patterns", "goto", "fail", "out", "depth")

    def __init__(self, patterns: Iterable[str]):
        # insertion order defines pattern indices; duplicates collapse to the
        # first occurrence (the reference adds patterns from a set)
        seen: dict[str, int] = {}
        for p in patterns:
            if p and p not in seen:
                seen[p] = len(seen)
        self.patterns: tuple[str, ...] = tuple(seen)

        goto: list[dict[str, int]] = [{}]
        out: list[list[int]] = [[]]
        depth: list[int] = [0]
        for idx, pat in enumerate(self.patterns):
            s = 0
            for ch in pat:
                nxt = goto[s].get(ch)
                if nxt is None:
                    nxt = len(goto)
                    goto[s][ch] = nxt
                    goto.append({})
                    out.append([])
                    depth.append(depth[s] + 1)
                s = nxt
            out[s].append(idx)

        # BFS failure links; merge fail-state outputs into each state so a
        # single output scan at match time reports nested suffix patterns
        fail = [0] * len(goto)
        q: deque[int] = deque()
        for s in goto[0].values():
            q.append(s)
        while q:
            cur = q.popleft()
            for ch, nxt in goto[cur].items():
                q.append(nxt)
                f = fail[cur]
                while f and ch not in goto[f]:
                    f = fail[f]
                cand = goto[f].get(ch, 0)
                # cand == nxt only for depth-1 states (f walked back to the
                # root and found nxt itself); their fail link is the root
                fail[nxt] = cand if cand != nxt else 0
                if out[fail[nxt]]:
                    out[nxt].extend(out[fail[nxt]])
        for s in range(len(out)):
            out[s].sort()
        self.goto = goto
        self.fail = fail
        self.out = out
        self.depth = depth

    def search(self, text: str) -> list[tuple[int, str]]:
        """All overlapping matches as ``[(start_pos, pattern), ...]`` in text
        order — the contract of feature_words.py:73-103."""
        goto, fail, out, patterns = self.goto, self.fail, self.out, self.patterns
        depth = self.depth
        res: list[tuple[int, str]] = []
        s = 0
        for i, ch in enumerate(text):
            while s and ch not in goto[s]:
                s = fail[s]
            nxt = goto[s].get(ch)
            if nxt is None:
                continue  # stay at root (reference: :87-94)
            s = nxt
            if out[s]:
                # QUIRK KEPT (feature_words.py:96-101): the start position is
                # computed from the CURRENT node's depth for every pattern in
                # the merged output set — fail-merged (nested suffix) patterns
                # therefore report the deepest node's start, not their own.
                # The match-word multiset is exact; only positions of nested
                # matches carry the reference's off-by-depth behaviour.
                start = i - depth[s] + 1
                for idx in out[s]:
                    res.append((start, patterns[idx]))
        return res

    def count_matches(self, text: str) -> tuple[int, int, int]:
        """(n_matches, n_distinct_patterns, first_match_pos|-1) — the compact
        per-doc statistics the distributed operator emits."""
        matches = self.search(text)
        if not matches:
            return 0, 0, -1
        return (
            len(matches),
            len({p for _, p in matches}),
            min(pos for pos, _ in matches),
        )


def build_automaton(patterns: Sequence[str]) -> AhoCorasickAutomaton:
    return AhoCorasickAutomaton(patterns)


def check_feature_words_ac(
    text: str, automaton: AhoCorasickAutomaton, max_per_line: float
) -> tuple[bool, dict]:
    """check_feature_words with the AC engine (feature_words.py:169-214,
    use_dfa_filter=False branch), quirks intact:
      * every match INSTANCE adds +1 to every non-blank line CONTAINING the
        matched word (not a per-line rescan — a word matched 3 times globally
        counts 3 in each line that contains it once);
      * valid lines (denominator) = lines with >= 5 stripped chars."""
    matches = automaton.search(text)
    words = [w for _, w in matches]
    line_counts_sum = 0
    valid_line_count = 0
    for line in text.split("\n"):
        if line.strip():
            line_counts_sum += sum(1 for w in words if w in line)
        if len(line.strip()) >= 5:
            valid_line_count += 1
    avg = line_counts_sum / valid_line_count if valid_line_count > 0 else 0
    passed = avg <= max_per_line
    return passed, {
        "feature_count": len(words),
        "feature_words": words,
        "avg_per_line": avg,
    }
