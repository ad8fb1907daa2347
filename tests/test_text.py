"""Tokenizer / scalar-function parity (reference util.py:44-70, bte.py:76-81)."""
from web_content_extraction_benchmark_ray.functions.text import (
    md5_hex,
    sha256_hex,
    squeeze_ws,
    sub_common_entities,
    tokenize_words,
    tokenize_ws,
)


def test_tokenize_ws_basic():
    assert tokenize_ws("  a  b\tc\nd  ") == ["a", "b", "c", "d"]
    assert tokenize_ws("") == []
    assert tokenize_ws("   \n\t ") == []
    assert tokenize_ws("one") == ["one"]


def test_tokenize_ws_unicode_multiline():
    assert tokenize_ws("héllo wörld\r\nfoo") == ["héllo", "wörld", "foo"]


def test_tokenize_words():
    assert tokenize_words("a-b c.d! e_f") == ["a", "b", "c", "d", "e_f"]
    assert tokenize_words("") == []
    assert tokenize_words("héllo wörld") == ["héllo", "wörld"]
    assert tokenize_words("...!!!") == []


def test_entities():
    assert sub_common_entities("&quot;x&quot; &nbsp;y&#39;s") == '"x"  y\'s'
    # only the three reference entities are substituted (bte.py:76-81)
    assert sub_common_entities("&amp; &lt;") == "&amp; &lt;"


def test_squeeze_ws():
    assert squeeze_ws(" a \n\n b\t c ") == "a b c"


def test_hashes():
    assert sha256_hex("abc") == (
        "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad"
    )
    assert md5_hex("abc") == "900150983cd24fb0d6963f7d28e17f72"
