"""Native C++ text preprocessing: build, parity with Python, speed."""

import time

import pytest

from a_nice_rag_tpu.native.build import load_text_lib, native_preprocess
from a_nice_rag_tpu.text.preprocess import (
    preprocess_text,
    preprocess_text_python,
)

pytestmark = pytest.mark.skipif(
    load_text_lib() is None, reason="native lib unavailable (no compiler)"
)

CASES = [
    "What are the Recommended interventions, for adults?",
    "stage 2 hypertension in a b 42 patients",
    "don't smoke; it's bad!",
    "guidelines interventions medicines studies children criteria",
    "diabetes status analysis class gas news series",
    "",
    "   ",
    "ALL CAPS TEXT WITH numbers 123 456",
    "hyphen-ated words and under_scored ones",
    "a " * 200 + "unique trailing tokens here",
]


@pytest.mark.parametrize("lemma", [False, True])
def test_native_matches_python(lemma):
    for text in CASES:
        native = native_preprocess(text, lemma)
        expect = preprocess_text_python(text, lemma)
        assert native == expect, (text, lemma, native, expect)


def test_preprocess_text_routes_native():
    # Public entrypoint equals the Python reference regardless of path.
    for text in CASES:
        assert preprocess_text(text, True) == preprocess_text_python(text, True)


def test_native_large_input_and_speed():
    text = "patients with diabetes need regular blood pressure reviews " * 500
    native = native_preprocess(text, True)
    expect = preprocess_text_python(text, True)
    assert native == expect
    t0 = time.perf_counter()
    for _ in range(50):
        native_preprocess(text, True)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(50):
        preprocess_text_python(text, True)
    t_python = time.perf_counter() - t0
    assert t_native < t_python, (t_native, t_python)
