"""BERT WordPiece tokenizer (pure host-side, TF-free).

The reference tokenizes through tensorflow_text's C++ BertTokenizer
(clipa_jax/transforms/bert_ops.py:44-52); this is a from-scratch
implementation of the same canonical algorithm (basic tokenization:
lower-casing, NFD accent stripping, CJK spacing, punctuation splitting; then
greedy longest-match WordPiece with "##" continuations), golden-tested
against the HuggingFace BertTokenizer which implements the identical spec.

A C++ implementation with the same interface lives in clipa_tpu/native and
is used automatically when built (the Python one is the fallback and the
correctness oracle).
"""

from __future__ import annotations

import functools
import unicodedata
from typing import Iterable, List, Sequence


def load_vocab(vocab_path: str) -> list[str]:
    with open(vocab_path, encoding="utf-8") as f:
        return f.read().split("\n")


def _is_punctuation(ch: str) -> bool:
    cp = ord(ch)
    # ASCII ranges treated as punctuation even when unicode category says
    # otherwise ($, +, <, =, >, ^, `, |, ~), per the BERT spec.
    if (33 <= cp <= 47) or (58 <= cp <= 64) or (91 <= cp <= 96) \
            or (123 <= cp <= 126):
        return True
    return unicodedata.category(ch).startswith("P")


def _is_cjk(cp: int) -> bool:
    return ((0x4E00 <= cp <= 0x9FFF) or (0x3400 <= cp <= 0x4DBF)
            or (0x20000 <= cp <= 0x2A6DF) or (0x2A700 <= cp <= 0x2B73F)
            or (0x2B740 <= cp <= 0x2B81F) or (0x2B820 <= cp <= 0x2CEAF)
            or (0xF900 <= cp <= 0xFAFF) or (0x2F800 <= cp <= 0x2FA1F))


def _is_control(ch: str) -> bool:
    if ch in ("\t", "\n", "\r"):
        return False
    return unicodedata.category(ch).startswith("C")


def basic_tokenize(text: str, lower_case: bool = True) -> List[str]:
    """Whitespace/punctuation/CJK tokenization with optional lower+de-accent."""
    out_chars = []
    for ch in text:
        cp = ord(ch)
        if cp == 0 or cp == 0xFFFD or _is_control(ch):
            continue
        if ch.isspace():
            out_chars.append(" ")
        elif _is_cjk(cp):
            out_chars.extend((" ", ch, " "))
        else:
            out_chars.append(ch)
    text = "".join(out_chars)

    tokens: list[str] = []
    for word in text.split():
        if lower_case:
            word = word.lower()
            word = unicodedata.normalize("NFD", word)
            word = "".join(c for c in word
                           if unicodedata.category(c) != "Mn")
        # split punctuation into standalone tokens
        current: list[str] = []
        for ch in word:
            if _is_punctuation(ch):
                if current:
                    tokens.append("".join(current))
                    current = []
                tokens.append(ch)
            else:
                current.append(ch)
        if current:
            tokens.append("".join(current))
    return tokens


class WordPieceTokenizer:
    """Greedy longest-match-first WordPiece over a fixed vocab."""

    def __init__(self, vocab: Sequence[str] | str, lower_case: bool = True,
                 unk_token: str = "[UNK]", max_chars_per_word: int = 100):
        if isinstance(vocab, str):
            vocab = load_vocab(vocab)
        self.vocab = list(vocab)
        self.vocab_index = {tok: i for i, tok in enumerate(self.vocab)}
        self.lower_case = lower_case
        self.unk_id = self.vocab_index[unk_token]
        self.cls_id = self.vocab_index.get("[CLS]")
        self.sep_id = self.vocab_index.get("[SEP]")
        self.pad_id = self.vocab_index.get("[PAD]", 0)
        self.max_chars_per_word = max_chars_per_word

    def tokenize_word(self, word: str) -> List[int]:
        if len(word) > self.max_chars_per_word:
            return [self.unk_id]
        ids: list[int] = []
        start = 0
        n = len(word)
        while start < n:
            end = n
            cur = None
            while start < end:
                piece = word[start:end]
                if start > 0:
                    piece = "##" + piece
                idx = self.vocab_index.get(piece)
                if idx is not None:
                    cur = idx
                    break
                end -= 1
            if cur is None:
                return [self.unk_id]
            ids.append(cur)
            start = end
        return ids

    def encode(self, text: str) -> List[int]:
        """Text -> WordPiece ids (no special tokens added)."""
        ids: list[int] = []
        for word in basic_tokenize(text, self.lower_case):
            ids.extend(self.tokenize_word(word))
        return ids

    def encode_words(self, words: Iterable[str]) -> List[List[int]]:
        """Pre-split words -> per-word WordPiece id lists.

        Used by syntax-priority sampling, which selects at word granularity
        before flattening to token ids. Each word still goes through basic
        tokenization (it may split into several sub-tokens, e.g. "don't").
        """
        out: list[list[int]] = []
        for word in words:
            ids: list[int] = []
            for piece in basic_tokenize(word, self.lower_case):
                ids.extend(self.tokenize_word(piece))
            out.append(ids)
        return out


@functools.lru_cache(maxsize=8)
def get_tokenizer(vocab_path: str, lower_case: bool = True,
                  backend: str = "auto") -> WordPieceTokenizer:
    """Returns a (cached) tokenizer; prefers the native C++ backend."""
    if backend in ("auto", "native"):
        try:
            from clipa_tpu.native import wordpiece as native_wp
            return native_wp.NativeWordPieceTokenizer(vocab_path, lower_case)
        except Exception:
            if backend == "native":
                raise
    return WordPieceTokenizer(load_vocab(vocab_path), lower_case)
