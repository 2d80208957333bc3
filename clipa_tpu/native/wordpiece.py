"""ctypes wrapper: native WordPiece with per-string Python fallback.

Same interface as clipa_tpu.pp.tokenizer.WordPieceTokenizer. The native
fast path handles ASCII text (the vast majority of LAION captions); any
string containing non-ASCII bytes is routed to the Python implementation,
whose NFD/CJK handling defines the semantics. Parity is enforced by tests
over random corpora.
"""

from __future__ import annotations

import ctypes
from typing import List

import numpy as np

from clipa_tpu import native
from clipa_tpu.pp import tokenizer as py_tok


class NativeWordPieceTokenizer(py_tok.WordPieceTokenizer):
    def __init__(self, vocab, lower_case: bool = True, **kw):
        if isinstance(vocab, str):
            vocab = py_tok.load_vocab(vocab)
        super().__init__(vocab, lower_case, **kw)
        if not lower_case:
            raise NotImplementedError("native path is lower_case only")
        self._lib = native.load()
        blob = "\n".join(self.vocab).encode("utf-8")
        self._handle = self._lib.wp_create(blob, len(blob))
        self._buf = (ctypes.c_int32 * 8192)()

    def encode(self, text: str) -> List[int]:
        data = text.encode("utf-8", "replace")
        n = self._lib.wp_encode(self._handle, data, len(data), self._buf,
                                len(self._buf))
        if n == -1:  # non-ASCII: defer to Python semantics
            return super().encode(text)
        if n == -2:  # pathological caption longer than the buffer
            return super().encode(text)
        return list(self._buf[:n])

    def __del__(self):
        try:
            if getattr(self, "_handle", None):
                self._lib.wp_destroy(self._handle)
        except Exception:
            pass
