"""Text front-end tests: symbol-ID contract, cleaners, G2P formatting."""

import numpy as np

from styler_tpu.textproc import (
    PAD_ID,
    VOCAB_SIZE,
    G2p,
    sequence_to_text,
    symbol_to_id,
    symbols,
    text_to_sequence,
    to_phoneme_string,
)
from styler_tpu.textproc.cleaners import english_cleaners
from styler_tpu.textproc.numbers import normalize_numbers, number_to_words


def test_symbol_inventory_contract():
    # Exact counts from the reference (text/symbols.py:9-20):
    # 1 pad + 1 special + 10 punctuation + 52 letters + 84 arpabet + 3 silences
    assert len(symbols) == 1 + 1 + 10 + 52 + 84 + 3 == 151
    assert VOCAB_SIZE == 152
    assert symbols[0] == "_" and PAD_ID == 0
    assert symbols[1] == "-"
    assert symbols[2:12] == list("!'(),.:;? ")
    assert symbols[12:64] == list(
        "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
    )
    assert symbols[64] == "@AA" and symbols[147] == "@ZH"
    assert symbols[-3:] == ["@sp", "@spn", "@sil"]


def test_text_to_sequence_arpabet_and_roundtrip():
    seq = text_to_sequence("{HH AH0 L OW1} world!", ["english_cleaners"])
    assert seq[0] == symbol_to_id["@HH"]
    assert seq[1] == symbol_to_id["@AH0"]
    # ' ' and letters are preserved; '_' is never emitted
    assert PAD_ID not in seq
    text = sequence_to_text(seq)
    assert "{HH AH0 L OW1}" in text.replace(" ", "}{", 0) or "HH" in text


def test_text_to_sequence_silences():
    seq = text_to_sequence("{sp} {spn} {sil}", [])
    assert seq == [
        symbol_to_id["@sp"],
        symbol_to_id[" "],
        symbol_to_id["@spn"],
        symbol_to_id[" "],
        symbol_to_id["@sil"],
    ]


def test_english_cleaners():
    assert english_cleaners("Dr. Smith   lives") == "doctor smith lives"
    assert english_cleaners("Héllo") == "hello"
    assert english_cleaners("I have $1.50") == "i have one dollar, fifty cents"
    assert english_cleaners("3rd place") == "third place"
    assert english_cleaners("in 1999") == "in nineteen ninety-nine"
    assert english_cleaners("1,000 items") == "one thousand items"


def test_number_to_words():
    assert number_to_words(0) == "zero"
    assert number_to_words(14) == "fourteen"
    assert number_to_words(42) == "forty-two"
    assert number_to_words(100) == "one hundred"
    assert number_to_words(1234) == "one thousand two hundred thirty-four"
    assert normalize_numbers("2.5") == "two point five"
    assert normalize_numbers("21st") == "twenty-first"


def test_g2p_phoneme_string_format():
    s = to_phoneme_string("Hello world.")
    # format: space-separated phones inside one brace pair per reference
    assert s.startswith("{") and s.endswith("}")
    assert "{sp}" not in s  # trailing punctuation stripped
    s2 = to_phoneme_string("Hello, world")
    assert "sp" in s2  # internal punctuation becomes {sp}
    # and the result must round-trip through text_to_sequence
    seq = text_to_sequence(s2, ["english_cleaners"])
    assert len(seq) > 0 and all(0 < i < VOCAB_SIZE for i in seq)


def test_g2p_lexicon_and_rules():
    g2p = G2p()
    assert g2p("the")[:2] == ["DH", "AH0"]
    out = g2p("cat")  # rule-based
    assert out == ["K", "AE1", "T"]
    out = g2p("string")
    assert out[-1] == "NG"
