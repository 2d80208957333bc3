"""CLIP BPE tokenizer mechanics (synthetic merges file)."""

import numpy as np
import pytest

from clipa_tpu.pp.bpe_tokenizer import SimpleTokenizer, bytes_to_unicode


@pytest.fixture(scope="module")
def bpe_path(tmp_path_factory):
    # tiny merges list exercising multi-step merges: c+a, t+</w>, ca+t</w>
    merges = ["#version: tiny",
              "c a", "t </w>", "ca t</w>", "d o", "g </w>", "do g</w>"]
    p = tmp_path_factory.mktemp("bpe") / "merges.txt"
    p.write_text("\n".join(merges))
    return str(p)


def test_bytes_to_unicode_reversible():
    enc = bytes_to_unicode()
    assert len(enc) == 256 and len(set(enc.values())) == 256


def test_bpe_merging(bpe_path):
    tok = SimpleTokenizer(bpe_path)
    # "cat" -> c a t</w> -> ca t</w> -> cat</w> (one id)
    ids = tok.encode("cat")
    assert len(ids) == 1
    assert tok.decoder[ids[0]] == "cat</w>"
    ids2 = tok.encode("dog")
    assert tok.decoder[ids2[0]] == "dog</w>"
    # unknown word falls back to byte/merge pieces
    ids3 = tok.encode("catdog")
    assert len(ids3) >= 2


def test_encode_decode_roundtrip(bpe_path):
    tok = SimpleTokenizer(bpe_path)
    text = "cat dog cat"
    assert tok.decode(tok.encode(text)).strip() == text


def test_call_framing(bpe_path):
    tok = SimpleTokenizer(bpe_path, context_length=8)
    out = tok(["cat", "dog dog dog dog dog dog dog dog dog"])
    assert out.shape == (2, 8)
    assert out[0, 0] == tok.sot
    assert out[0, 2] == tok.eot
    assert out[0, 3] == 0  # padding
    assert out[1, -1] == tok.eot  # truncated to fit


def test_lowercase_and_cleanup(bpe_path):
    tok = SimpleTokenizer(bpe_path)
    assert tok.encode("  CAT\n\tdog ") == tok.encode("cat dog")
