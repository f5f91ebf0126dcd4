"""Text preprocessing pipeline behavior (reference preprocess_text parity)."""

from a_nice_rag_tpu.text import lemmatize, preprocess_text


def test_basic_pipeline():
    toks = preprocess_text("What are the Recommended interventions, for adults?")
    # lowercased, punctuation stripped, stopwords dropped, len>1 kept
    assert toks == ["recommended", "interventions", "adults"]


def test_numeric_and_short_tokens_dropped():
    toks = preprocess_text("stage 2 hypertension in a b 42 patients")
    assert toks == ["stage", "hypertension", "patients"]


def test_empty_and_none():
    assert preprocess_text("") == []
    assert preprocess_text(None) == []


def test_lemmatization_regular_plurals():
    toks = preprocess_text(
        "guidelines interventions medicines studies", use_lemmatization=True
    )
    assert toks == ["guideline", "intervention", "medicine", "study"]


def test_lemmatization_irregulars_and_guards():
    assert lemmatize("children") == "child"
    assert lemmatize("criteria") == "criterion"
    assert lemmatize("diagnoses") == "diagnosis"
    # Guards: not plurals, must not be over-stripped.
    assert lemmatize("diabetes") == "diabetes"
    assert lemmatize("status") == "status"
    assert lemmatize("analysis") == "analysis"
    assert lemmatize("class") == "class"
    assert lemmatize("gas") == "gas"


def test_punctuation_merges_contractions():
    # "don't" -> "dont" after punctuation strip (reference behavior:
    # translate removes the apostrophe before tokenization).
    toks = preprocess_text("don't smoke")
    assert toks == ["dont", "smoke"]
