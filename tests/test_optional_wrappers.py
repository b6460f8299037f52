"""Error-path / stubbed-dependency tests for the optional-model wrappers:
FastTextLangId (fasttext absent), the bs4 branch of extract_html_text, and
the jieba branch of ngram_lm.tokenize. The real packages are not in this
sandbox — these tests inject minimal fakes so the non-sandbox code paths are
exercised (call protocol + gate semantics), not dead code."""

from __future__ import annotations

import importlib
import sys
import types


def test_fasttext_wrapper_gate_semantics(monkeypatch):
    calls = []

    class FakeModel:
        def predict(self, text, k=1):
            calls.append((text, k))
            if "boom" in text:
                raise RuntimeError("model exploded")
            if "中文" in text:
                return (["__label__zh"], [0.93])
            if "halbes" in text:
                return (["__label__zh"], [0.42])
            return (["__label__en"], [0.99])

    fake_ft = types.ModuleType("fasttext")
    fake_ft.load_model = lambda path: FakeModel()
    monkeypatch.setitem(sys.modules, "fasttext", fake_ft)

    from chinese_corpus_cleaning_spark.functions.langid import FastTextLangId

    lid = FastTextLangId("/fake/lid.176.bin")
    # zh above threshold -> gated in
    assert lid.identify("这是一段中文内容超过十个字符") == ("zh", 0.93, True)
    # zh below the 0.7 threshold -> rejected (tool.py:16 gate)
    lang, conf, is_zh = lid.identify("halbes vertrauen in text hier")
    assert (lang, is_zh) == ("zh", False) and abs(conf - 0.42) < 1e-12
    # non-zh -> rejected
    assert lid.identify("plain english text here ok")[2] is False
    # short text rejected BEFORE the model is called
    n_calls = len(calls)
    assert lid.identify("short") == ("", 0.0, False)
    assert lid.identify("") == ("", 0.0, False)
    assert len(calls) == n_calls
    # model exception -> safe fallback, never raises
    assert lid.identify("boom boom boom boom") == ("", 0.0, False)
    # the wrapper cleans text before predicting (tool.py:20)
    lid.identify("  white\n\nspace   heavy text ")
    assert "\n" not in calls[-1][0] and "  " not in calls[-1][0]


def test_bs4_branch_of_extract_html_text(monkeypatch):
    """Exercise the bs4 code path with a faithful minimal fake: constructor
    signature, soup(list) tag lookup, el.extract(), get_text(separator)."""
    from chinese_corpus_cleaning_spark.functions import cleaning

    class FakeEl:
        def __init__(self, soup, tag):
            self.soup, self.tag = soup, tag

        def extract(self):
            self.soup.extracted.append(self.tag)

    class FakeSoup:
        def __init__(self, html, parser):
            assert parser == "html.parser"
            self.html = html
            self.extracted: list[str] = []

        def __call__(self, tags):
            assert set(tags) == set(cleaning._DROP_TAGS)
            return [FakeEl(self, t) for t in tags if f"<{t}" in self.html]

        def get_text(self, separator=" "):
            assert "script" in self.extracted  # dropped before text extraction
            return separator.join(["Hello", "world", " spaced\t"])

    monkeypatch.setattr(cleaning, "_HAVE_BS4", True)
    monkeypatch.setattr(cleaning, "BeautifulSoup", FakeSoup, raising=False)
    out = cleaning.extract_html_text("<p>Hello</p><script>x</script>")
    assert out == "Hello world spaced"
    # error isolation contract: any exception inside -> ""
    monkeypatch.setattr(
        cleaning, "BeautifulSoup", lambda *a, **k: 1 / 0, raising=False
    )
    assert cleaning.extract_html_text("<p>x</p>") == ""


def test_jieba_branch_of_tokenize():
    """Reload ngram_lm with a fake jieba present: tokenize must route through
    jieba.cut; reload again without it restores the regex fallback."""
    from chinese_corpus_cleaning_spark.functions import ngram_lm

    fake = types.ModuleType("jieba")
    fake.cut = lambda text: iter(text.split("|"))
    sys.modules["jieba"] = fake
    try:
        importlib.reload(ngram_lm)
        assert ngram_lm.tokenize("你好|world|123") == ["你好", "world", "123"]
    finally:
        del sys.modules["jieba"]
        importlib.reload(ngram_lm)
    # fallback restored: regex tokenizer (CJK chars split singly)
    assert ngram_lm.tokenize("你好 world 123") == ["你", "好", "world", "123"]
