"""Bit-parity golden tests: our BPE engine vs the HF `tokenizers` crate
on the shipped 40k-vocab tokenizer.json."""

import os

import numpy as np
import pytest

from asr_model_tpu.data.tokenizer import Tokenizer, setup_tokenizer

ASSET = os.path.join(os.path.dirname(__file__), "..", "asr_model_tpu",
                     "assets", "tokenizer.json")

SAMPLES = [
    "HELLO WORLD",
    "the quick brown fox jumps over the lazy dog",
    "MISTER QUILTER IS THE APOSTLE OF THE MIDDLE CLASSES",
    "he said: \"don't do that!\"  (twice)",
    "numbers 1234 and 56.78 mixed-in",
    "unicode café naïve — em–dash ½",
    "  leading and   multiple   spaces ",
    "",
    "a",
    "Ämter ﬁne ligature ﬁ",   # NFKC normalization cases
    "newline\nand\ttab",
]


@pytest.fixture(scope="module")
def tok():
    return setup_tokenizer(ASSET)


@pytest.fixture(scope="module")
def hf():
    tokenizers = pytest.importorskip("tokenizers")
    return tokenizers.Tokenizer.from_file(ASSET)


@pytest.mark.parametrize("text", SAMPLES)
def test_encode_matches_hf(tok, hf, text):
    assert tok.encode(text) == hf.encode(text).ids


@pytest.mark.parametrize("text", SAMPLES)
def test_decode_roundtrip_matches_hf(tok, hf, text):
    ids = hf.encode(text).ids
    assert tok._decode_raw(ids) == hf.decode(ids)


def test_decode_strips_specials(tok):
    ids = tok.encode("HELLO WORLD")
    framed = [1] + ids + [2, 0, 0, -100]
    assert tok.decode(framed) == tok._decode_raw(ids)
    assert tok.batch_decode([framed, framed]) == [tok._decode_raw(ids)] * 2


def test_special_ids_pinned(tok):
    assert (tok.pad_token_id, tok.bos_token_id, tok.eos_token_id) == (0, 1, 2)
    assert tok.token_to_id("<PAD>") == 0
    assert tok.token_to_id("<BOS>") == 1
    assert tok.token_to_id("<EOS>") == 2
    assert tok.get_vocab_size() == 40000


def test_added_token_passthrough(tok, hf):
    text = "say <BOS> mid sentence"
    assert tok.encode(text) == hf.encode(text).ids


def test_save_roundtrip(tok, tmp_path):
    tok.save_pretrained(str(tmp_path))
    tok2 = Tokenizer.from_file(str(tmp_path / "tokenizer.json"))
    for text in SAMPLES:
        assert tok2.encode(text) == tok.encode(text)
