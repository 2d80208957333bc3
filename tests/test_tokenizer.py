"""WordPiece tokenizer: goldens vs the canonical HF BertTokenizer."""

import numpy as np
import pytest

from clipa_tpu.pp import ops_text
from clipa_tpu.pp.tokenizer import WordPieceTokenizer, basic_tokenize

VOCAB = [
    "[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
    "a", "an", "the", "cat", "dog", "sat", "on", "mat", "photo", "of",
    "run", "##ning", "##s", "jump", "##ed", "quick", "brown", "fox",
    "un", "##believ", "##able", "!", ",", ".", "'",
    "red", "big", "house", "tree", "bird", "fly", "##ing",
]


@pytest.fixture(scope="module")
def tok():
    return WordPieceTokenizer(VOCAB)


@pytest.fixture(scope="module")
def vocab_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("vocab") / "vocab.txt"
    p.write_text("\n".join(VOCAB))
    return str(p)


def test_basic_tokenize():
    assert basic_tokenize("The cat, sat!") == ["the", "cat", ",", "sat", "!"]
    assert basic_tokenize("CafÉ") == ["cafe"]  # lowercase + de-accent
    assert basic_tokenize("don't") == ["don", "'", "t"]
    assert basic_tokenize("你好ab") == ["你", "好", "ab"]  # CJK split
    assert basic_tokenize("  spaces\t\nhere ") == ["spaces", "here"]


def test_wordpiece_greedy(tok):
    assert tok.encode("running") == [VOCAB.index("run"), VOCAB.index("##ning")]
    assert tok.encode("unbelievable") == [
        VOCAB.index("un"), VOCAB.index("##believ"), VOCAB.index("##able")]
    assert tok.encode("zzz") == [tok.unk_id]
    assert tok.encode("the cat sat") == [7, 8, 10]


def test_matches_hf_bert_tokenizer(vocab_file):
    """Golden parity with the canonical implementation on real sentences."""
    transformers = pytest.importorskip("transformers")
    hf = transformers.BertTokenizer(vocab_file, do_lower_case=True)
    ours = WordPieceTokenizer(VOCAB)
    sentences = [
        "The quick brown fox jumped!",
        "A photo of a cat, sitting on the mat.",
        "Unbelievable RUNNING dogs!!!",
        "café au lait",
        "a 你好 cat",
        "don't stop",
        "",
        "x" * 150,  # longer than max_chars_per_word -> UNK
    ]
    for s in sentences:
        expected = hf.convert_tokens_to_ids(hf.tokenize(s))
        assert ours.encode(s) == expected, f"mismatch on {s!r}"


def test_matches_hf_on_real_vocab():
    """Golden test on the shipped 30522-entry BERT uncased vocab (the one
    every CLIPA-v2 text tower tokenizes with, reference data/vocab.txt)."""
    import os
    real_vocab = os.path.join(os.path.dirname(__file__), "..",
                              "data", "vocab.txt")
    assert os.path.exists(real_vocab), "data/vocab.txt must ship in-repo"
    transformers = pytest.importorskip("transformers")
    hf = transformers.BertTokenizer(real_vocab, do_lower_case=True)
    ours = WordPieceTokenizer(real_vocab)
    sentences = [
        "A photo of a golden retriever playing in the park.",
        "Vintage 1950s Chevrolet Bel-Air, cherry red, mint condition!",
        "Étude in C# minor — Frédéric Chopin (1810–1849)",
        "Handmade sterling-silver necklace w/ 18\" chain $29.99",
        "日本の桜 cherry blossoms in Tokyo",
        "the THE The tHe",
    ]
    for s in sentences:
        expected = hf.convert_tokens_to_ids(hf.tokenize(s))
        assert ours.encode(s) == expected, f"mismatch on {s!r}"


def test_bert_tokenize_op(vocab_file):
    from clipa_tpu.registry import get_preprocess_fn
    fn = get_preprocess_fn(
        f'bert_tokenize(inkey="txt", max_len=6, vocab_path="{vocab_file}")')
    out = fn({"txt": "the cat sat on the mat"})
    labels = out["labels"]
    assert labels.shape == (6,) and labels.dtype == np.int32
    assert labels[0] == VOCAB.index("[CLS]")
    assert list(labels[1:]) == [7, 8, 10, 11, 7]  # truncated to 5 tokens

    # short text: zero padding
    out = fn({"txt": "cat"})
    assert list(out["labels"]) == [2, 8, 0, 0, 0, 0]


def test_bert_tokenize_multi_caption_sampling(vocab_file):
    from clipa_tpu.registry import get_preprocess_fn
    fn = get_preprocess_fn(
        f'bert_tokenize(inkey="txt", max_len=4, vocab_path="{vocab_file}", '
        f'sample_if_multi=True)')
    seen = set()
    rng = np.random.default_rng(0)
    for _ in range(30):
        out = fn({"txt": ["cat", "dog"], "_rng": rng})
        seen.add(int(out["labels"][1]))
    assert seen == {VOCAB.index("cat"), VOCAB.index("dog")}
    # deterministic first caption when sampling off
    fn0 = get_preprocess_fn(
        f'bert_tokenize(inkey="txt", max_len=4, vocab_path="{vocab_file}", '
        f'sample_if_multi=False)')
    out = fn0({"txt": ["cat", "dog"]})
    assert int(out["labels"][1]) == VOCAB.index("cat")


def test_custom_bert_tokenize_mask_types(vocab_file):
    from clipa_tpu.registry import get_preprocess_fn
    long_text = "the quick brown fox jumped on a big red house"
    full = WordPieceTokenizer(VOCAB).encode(long_text)
    for mask_type in ("first", "random", "block"):
        fn = get_preprocess_fn(
            f'custom_bert_tokenize(inkey="txt", max_len=5, '
            f'vocab_path="{vocab_file}", mask_type="{mask_type}")')
        out = fn({"txt": long_text, "_rng": np.random.default_rng(1)})
        labels = out["labels"]
        assert labels.shape == (5,)
        assert labels[0] == VOCAB.index("[CLS]")
        body = [int(x) for x in labels[1:]]
        assert all(tid in full for tid in body)
        if mask_type == "first":
            assert body == full[:4]
        if mask_type == "block":  # contiguous window
            start = full.index(body[0])
            assert body == full[start:start + 4]


def test_syntax_tokenize_prefers_nouns(vocab_file):
    from clipa_tpu.registry import get_preprocess_fn
    # 'the'/'on'/'a' are function words; cat/dog/house/tree/bird are nouns.
    text = "the cat and a dog on the big house tree bird"
    fn = get_preprocess_fn(
        f'syntax_tokenize(inkey="txt", max_len=6, vocab_path="{vocab_file}")')
    out = fn({"txt": text, "_rng": np.random.default_rng(0)})
    kept = [VOCAB[i] for i in out["labels"][1:] if i != 0]
    # all kept tokens should be content words, not "the"/"a"/"on"
    assert set(kept) <= {"cat", "dog", "big", "house", "tree", "bird"}
    assert "cat" in kept  # original order preserved, nouns kept


def test_pos_priorities_fallback():
    pri = ops_text.pos_priorities(["the", "cat", "running", "beautiful"])
    assert pri[0] == 4      # function word
    assert pri[1] == 1      # noun
    assert pri[2] == 3      # verb (-ing)
    assert pri[3] == 2      # adjective (-ful)


def _load_syntax_golden():
    import json
    import os
    path = os.path.join(os.path.dirname(__file__), "golden",
                        "syntax_corpus.json")
    with open(path) as f:
        return json.load(f)["corpus"]


def test_syntax_golden_corpus_priorities():
    """The tagger (heuristic fallback, or NLTK when installed) must assign
    the golden priority classes on a curated caption corpus — the per-word
    class table is the semantics of the reference's isolated-word NLTK
    tagging (clipa_jax/transforms/bert_ops.py:54-88). Guards the heuristic
    against regressions AND validates any future NLTK-enabled environment."""
    for entry in _load_syntax_golden():
        got = ops_text.pos_priorities(entry["words"])
        assert got == entry["priorities"], (
            f"caption {entry['caption']!r}: got {got}, "
            f"want {entry['priorities']} for words {entry['words']}")


def test_syntax_golden_kept_token_sets(tmp_path):
    """End-to-end syntax_tokenize on the golden corpus: the kept-word set
    must equal the best-priority words under the golden classes (stable
    order, first max_len-1)."""
    from clipa_tpu.registry import get_preprocess_fn

    corpus = _load_syntax_golden()
    vocab_words = sorted({w for e in corpus for w in e["words"]})
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]"] + vocab_words
    vocab_file = str(tmp_path / "vocab.txt")
    with open(vocab_file, "w") as f:
        f.write("\n".join(vocab))

    max_len = 6
    fn = get_preprocess_fn(
        f'syntax_tokenize(inkey="txt", max_len={max_len}, '
        f'vocab_path="{vocab_file}")')
    for e in corpus:
        out = fn({"txt": e["caption"], "_rng": np.random.default_rng(0)})
        kept = [vocab[i] for i in out["labels"][1:] if i != 0]
        # expected: stable argsort of golden priorities, first 5, original
        # order restored (reference bert_ops.py:229-236 semantics)
        order = np.argsort(e["priorities"], kind="stable")[:max_len - 1]
        expect = [e["words"][i] for i in sorted(order.tolist())]
        assert kept == expect, (
            f"caption {e['caption']!r}: kept {kept}, want {expect}")


def test_syntax_golden_nltk_agreement():
    """When NLTK's tagger data is installed, its priorities must agree with
    the golden classes (skipped where the data is absent — it is not
    redistributable in-repo and this host has no egress; PARITY.md)."""
    nltk_tag = ops_text._nltk_tagger()
    if nltk_tag is None:
        pytest.skip("nltk averaged_perceptron_tagger data not installed")
    for entry in _load_syntax_golden():
        tagged = nltk_tag(entry["words"])
        got = [ops_text._tag_priority(tag) for _, tag in tagged]
        assert got == entry["priorities"], entry["caption"]
