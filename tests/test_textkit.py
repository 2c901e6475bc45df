"""Unit tests for the scalar kernels (SURVEY.md §2.7) — every function here
feeds features → labels → output bytes, so each is pinned exactly."""

from hypothesis import given, strategies as st

from datacat_ray.functions import textkit as tk


def test_prefix_suffix():
    assert tk.prefix("Vente", 3) == "Ven"
    assert tk.prefix("ab", 4) == "ab"
    assert tk.suffix("TION", 3) == "ION"
    assert tk.suffix("a", 4) == "a"
    assert tk.prefix("", 2) == ""


def test_capitalisation():
    assert tk.capitalisation_class("DESCRIPTION") == "ALLCAP"
    assert tk.capitalisation_class("Vente") == "INITCAP"
    assert tk.capitalisation_class("vente") == "NOCAPS"
    # ALLDIGIT => NOCAPS override (DatacatSegmenterParser.java:501-507)
    assert tk.capitalisation_class("1234") == "NOCAPS"
    assert tk.capitalisation_class("H.") == "ALLCAP"
    assert tk.capitalisation_class("") == "NOCAPS"


def test_digit_class():
    assert tk.digit_class("39") == "ALLDIGIT"
    assert tk.digit_class("AR4") == "CONTAINSDIGITS"
    assert tk.digit_class("AR") == "NODIGIT"
    assert tk.digit_class("") == "NODIGIT"


def test_punct_type():
    assert tk.punct_type(".") == "DOT"
    assert tk.punct_type(",") == "COMMA"
    assert tk.punct_type("(") == "OPENBRACKET"
    assert tk.punct_type(")") == "ENDBRACKET"
    assert tk.punct_type("-") == "HYPHEN"
    assert tk.punct_type('"') == "QUOTE"
    assert tk.punct_type(";") == "PUNCT"
    assert tk.punct_type("H.") == "PUNCT"
    assert tk.punct_type("word") == "NOPUNCT"


def test_punctuation_profile():
    assert tk.punctuation_profile("Vente du 3 mai, 1899.") == ",."
    assert tk.punctuation_profile("no punct here") == "no"
    assert tk.punct_count("a.b,c;") == 3


def test_linear_scaling_bins():
    # floor(nb_bins * v / max), clamped — exact integer arithmetic (M8)
    assert tk.linear_scaling(0, 10, 12) == 0
    assert tk.linear_scaling(5, 10, 12) == 6
    assert tk.linear_scaling(9, 10, 12) == 10
    assert tk.linear_scaling(10, 10, 12) == 12
    assert tk.linear_scaling(99, 10, 12) == 12
    assert tk.linear_scaling(-1, 10, 12) == 0
    assert tk.linear_scaling(5, 0, 12) == 0


def test_html_encode_order():
    assert tk.html_encode('a<b&"c">') == "a&lt;b&amp;&quot;c&quot;&gt;"
    # & first: no double-escaping
    assert tk.html_encode("&lt;") == "&amp;lt;"


def test_normalise():
    assert tk.normalise_text_and_remove_spaces("é té \t x") == "étéx"


@given(st.text(max_size=500))
def test_tokenize_layout_roundtrip(s):
    """The byte-identity invariant: concat of layout tokens == input."""
    assert "".join(tk.tokenize_layout(s)) == s


def test_tokenize_layout_shapes():
    toks = tk.tokenize_layout("12. Monnaies d'Italie: 39 pièces. AR.")
    assert toks[:4] == ["12", ".", " ", "Monnaies"]
    assert "'" in toks and ":" in toks


def test_tokenize_whitespace():
    assert tk.tokenize_whitespace("  a \t b ") == ["a", "b"]
    assert tk.tokenize_whitespace("") == []


def test_redact_pii_kernel():
    from datacat_ray.pipelines.text_analysis import redact_pii_text

    assert redact_pii_text("mail a.b+c@ex-ample.org now") == "mail <EMAIL> now"
    assert redact_pii_text("call +1 (415) 555-0123 today") == "call <PHONE> today"
    assert redact_pii_text("year 2024 alone stays") == "year 2024 alone stays"
    assert redact_pii_text("") == "" and redact_pii_text(None) == ""


def test_corpus_filter_gates(ray_session):
    import pyarrow.parquet as pq

    from datacat_ray.pipelines.text_analysis import (
        FILTER_MAX_TOKENS,
        FILTER_MIN_CHARS,
        FILTER_MIN_TOKENS,
        corpus_filter,
    )

    sf = "/root/testdata/sf0.001"
    kept = set(corpus_filter(sf).to_pandas()["doc_id"])
    docs = pq.read_table(f"{sf}/documents.parquet").to_pylist()
    for d in docs:
        ok = (FILTER_MIN_TOKENS <= len(d["text"].split()) <= FILTER_MAX_TOKENS
              and d["n_chars"] >= FILTER_MIN_CHARS)
        assert (d["doc_id"] in kept) == ok
