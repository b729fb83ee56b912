"""Tokenizer determinism + splitting parity (SURVEY.md §5 item 1, M1)."""

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from horus_ner_spark.functions.tokenizer import STOPLISTS, tokenize, tokenize_series


def test_camel_snake_splitting():
    assert tokenize("parseConfig", None) == ["parse", "config"]
    assert tokenize("read_buffer", None) == ["read", "buffer"]
    assert tokenize("HTMLParserBase", None) == ["html", "parser", "base"]
    assert tokenize("zipWithIndex", None) == ["zip", "with", "index"]
    assert tokenize("a.b.configValue", None) == ["config", "value"]  # len-1 dropped


def test_digits_and_length_gate():
    assert tokenize("x y1 count2items 42", None) == ["count", "items", "42"]
    assert tokenize("a" * 65 + " ok", None) == ["ok"]


def test_stoplists_per_lang():
    assert tokenize("def return import config", "python") == ["config"]
    # 'def' is not a java stopword
    assert "def" in tokenize("def return import config", "java")
    assert tokenize("public static void main", "java") == ["main"]


def test_accent_and_unicode_strip():
    assert tokenize("café naïve", None) == ["cafe", "naive"]
    assert tokenize("Ünïcode", None) == ["unicode"]


def test_empty_and_null():
    assert tokenize("", "python") == []
    assert tokenize(None, "python") == []
    assert tokenize("   \n\t ", "python") == []


@given(st.text(max_size=200), st.sampled_from(list(STOPLISTS) + [None, "unknown"]))
@settings(max_examples=300, deadline=None)
def test_deterministic_and_normalized(text, lang):
    a = tokenize(text, lang)
    assert a == tokenize(text, lang)  # pure
    for t in a:
        assert 2 <= len(t) <= 64
        assert t == t.lower()
        if lang in STOPLISTS:
            assert t not in STOPLISTS[lang]
    # re-tokenizing the joined output is stable (idempotence on own alphabet)
    assert tokenize(" ".join(a), lang) == a


def test_series_form_matches_scalar():
    texts = pd.Series(["parseConfig x", "def foo_bar", None])
    langs = pd.Series(["python", "python", "python"])
    out = tokenize_series(texts, langs)
    assert list(out) == [tokenize(t, "python") for t in texts]


def test_tokenize_tf_matches_counter():
    from collections import Counter

    from horus_ner_spark.functions.tokenizer import tokenize, tokenize_tf
    from horus_ner_spark.corpus import gen_doc

    for i in range(200):
        d = gen_doc(i, n_repos=10)
        assert tokenize_tf(d["content"], d["lang"]) == dict(
            Counter(tokenize(d["content"], d["lang"]))
        ), i
    assert tokenize_tf("", "python") == {}
    assert tokenize_tf(None, "python") == {}
    # case variants fold into one key with summed counts
    assert tokenize_tf("Config CONFIG config", "java") == {"config": 3}


def test_html_entity_decode():
    """F7: entities decode before splitting (reference util.py:30-36,590-601)."""
    assert tokenize("&amp;", None) == []                      # '&' alone: no token
    assert tokenize("cats &amp; dogs", None) == ["cats", "dogs"]
    assert tokenize("&lt;div&gt;text&lt;/div&gt;", None) == ["div", "text", "div"]
    assert tokenize("it&#39;s &quot;fine&quot;", None) == ["it", "fine"]
    assert tokenize("A&amp;B corp", None) == ["corp"]         # len-1 survivors drop
    # single-pass: '&amp;lt;' -> literal '&lt;' -> token 'lt' gate-dropped... 'lt' is len 2 -> kept
    assert tokenize("&amp;lt;", None) == ["lt"]
    # entity-free text: byte-identical to the non-unescape path
    assert tokenize("parseConfig &x", None) == ["parse", "config"]


# ── Arrow-vectorized batch tokenizer: exact parity with tokenize() ─────────


def _arrow_per_doc(texts, langs):
    """tokenize_arrow_batch -> per-input-row ordered token lists."""
    import numpy as np
    import pyarrow as pa

    from horus_ner_spark.functions.tokenizer import tokenize_arrow_batch

    tokens, tok_doc, tok_pos, doc_lens = tokenize_arrow_batch(
        pa.array(texts, type=pa.string()), pa.array(langs, type=pa.string())
    )
    toks = np.asarray(tokens.to_pylist(), dtype=object)
    out = [[None] * int(doc_lens[i]) for i in range(len(texts))]
    for t, d, p in zip(toks, tok_doc, tok_pos):
        out[int(d)][int(p)] = t
    return out


def test_arrow_batch_matches_scalar_goldens():
    texts = [
        "HTMLParser parseJSON snake_case",   # camel/acronym/snake
        "XMLHttpRequest2Json 2Fast2Furious",  # digit boundaries
        "def return import config",          # stoplist
        "ABCdEFGh aAbB x",                   # adversarial case runs
        None,                                 # null -> []
        "",                                  # empty -> []
        "café résumé Naïve",  # non-ASCII -> slow path
        "cats &amp; dogs A&amp;B",           # '&' -> slow path (unescape)
        "a" * 70 + " okTok",                 # max-len gate
    ]
    langs = ["python", "js", "python", "c", "go", "java", None, None, "scala"]
    got = _arrow_per_doc(texts, langs)
    assert got == [tokenize(t, l) for t, l in zip(texts, langs)]


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=(
                "abcDEF012_ &;#éü\t\n.xYzW"  # case runs, digits, seps, entities, unicode
            ),
            max_size=60,
        ),
        min_size=1,
        max_size=8,
    ),
    st.sampled_from(["python", "java", "go", None]),
)
def test_arrow_batch_differential(texts, lang):
    langs = [lang] * len(texts)
    assert _arrow_per_doc(texts, langs) == [tokenize(t, lang) for t in texts]


def test_arrow_batch_mixed_langs_and_paths():
    """Fast rows of several langs interleaved with slow rows: per-doc
    streams stay intact and per-lang stoplists apply to the right rows."""
    texts, langs = [], []
    for i in range(50):
        if i % 7 == 3:
            texts.append(f"café{i} parseConfig getValue")  # slow path
            langs.append("python")
        else:
            texts.append(f"def config{i} return funcName{i} import")
            langs.append(["python", "java", "go"][i % 3])
    got = _arrow_per_doc(texts, langs)
    assert got == [tokenize(t, l) for t, l in zip(texts, langs)]
