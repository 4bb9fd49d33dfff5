"""Tokenizer golden + parity tests.

Golden ids are well-known CLIP BPE outputs; parity is cross-checked against
the reference implementation (`model_simple_tokenizer.py`) executed from
/root/reference when importable.
"""

import sys

import numpy as np
import pytest

from clip_event_tpu.tokenizer import (
    CONTEXT_LENGTH,
    get_tokenizer,
    tokenize,
)
from tests.conftest import REFERENCE_DIR, reference_available

TOK = get_tokenizer()


def test_vocab_size():
    assert len(TOK) == 49408
    assert TOK.sot_id == 49406
    assert TOK.eot_id == 49407


def test_known_sentence():
    # canonical CLIP example: "a photo of a cat"
    ids = TOK.encode("a photo of a cat")
    assert ids == [320, 1125, 539, 320, 2368]


def test_tokenize_framing():
    arr = tokenize(["a photo of a cat", "a diagram"])
    assert arr.shape == (2, CONTEXT_LENGTH)
    assert arr.dtype == np.int32
    assert arr[0, 0] == TOK.sot_id
    assert arr[0, 6] == TOK.eot_id
    assert arr[0, 7:].sum() == 0
    # row 2 is shorter, still SOT...EOT framed
    assert arr[1, 0] == TOK.sot_id
    assert TOK.eot_id in arr[1]


def test_truncation_keeps_eot():
    long_text = "cat " * 200
    arr = tokenize(long_text)
    assert arr.shape == (1, CONTEXT_LENGTH)
    assert arr[0, -1] == TOK.eot_id
    assert (arr[0] != 0).all()


def test_decode_roundtrip():
    text = "Soldiers patrol the streets of Kyiv after the attack"
    ids = TOK.encode(text)
    assert TOK.decode(ids).strip() == text.lower()


def test_case_and_whitespace_insensitive():
    assert TOK.encode("A   Photo\tOF a CAT") == TOK.encode("a photo of a cat")


def test_contractions_and_punctuation():
    ids = TOK.encode("it's a protester's sign!!")
    assert len(ids) > 0
    assert TOK.decode(ids).strip() == "it 's a protester 's sign !!"


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_parity_with_reference_tokenizer():
    pytest.importorskip("ftfy", reason="reference tokenizer requires ftfy")
    sys.path.insert(0, REFERENCE_DIR)
    try:
        from model_simple_tokenizer import SimpleTokenizer as RefTokenizer
    finally:
        sys.path.remove(REFERENCE_DIR)
    ref = RefTokenizer()
    samples = [
        "a photo of a cat",
        "FILE - Protesters clash with police in Hong Kong, July 1, 2019.",
        "U.S. Secretary of State Mike Pompeo speaks; 100,000 people attend.",
        "éàü naïve café — em-dash &amp; entities",
        "",
        "    ",
        "123 456 7",
    ]
    for s in samples:
        assert TOK.encode(s) == ref.encode(s), repr(s)
