"""Golden checkpoint-parity fixture: the FULL user chain must reproduce
committed reference-math outputs.

The fixture (tests/golden/) was generated ONCE by tests/golden/generate.py:
an open_clip-format torch state dict with seeded-numpy weights, plus the
embeddings/logits a float64 torch forward written from the open_clip spec
(clipa_torch/open_clip/model.py:452-515) produces on fixed inputs. Here the
whole release-consumption pathway — create_model_and_transforms(pretrained=
.bin) -> preprocess -> get_tokenizer -> encode_image/encode_text ->
zero-shot argmax — must reproduce those numbers. This is the strongest
offline stand-in for "within 0.2% zero-shot of released checkpoints"
(no released weights / IN-1K on this host; see PARITY.md).
"""

import os

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
CONFIG = os.path.join(GOLDEN, "golden_tiny.json")


@pytest.fixture(scope="module")
def fixture():
    return dict(np.load(os.path.join(GOLDEN, "fixture.npz"),
                        allow_pickle=False))


@pytest.fixture(scope="module")
def chain():
    pytest.importorskip("torch")  # .bin loading goes through torch.load
    from clipa_tpu.compat import openclip
    model, _, preprocess_val = openclip.create_model_and_transforms(
        CONFIG, pretrained=os.path.join(GOLDEN, "golden_sd.bin"))
    tok = openclip.get_tokenizer(
        CONFIG, vocab_path=os.path.join(GOLDEN, "vocab.txt"))
    return model, preprocess_val, tok


def test_tokenizer_matches_fixture(fixture, chain):
    _, _, tok = chain
    names = [str(c) for c in fixture["class_names"]]
    tokens = tok([f"a photo of a {c}" for c in names])
    np.testing.assert_array_equal(tokens, fixture["tokens"])


def test_full_chain_reproduces_reference_outputs(fixture, chain):
    model, preprocess_val, _ = chain

    x = np.stack([preprocess_val(img) for img in fixture["images"]])
    assert x.shape == (4, 3, 32, 32)  # CHW, open_clip drop-in layout
    zimg = np.asarray(model.encode_image(x), np.float64)
    ztxt = np.asarray(model.encode_text(fixture["tokens"]), np.float64)

    # fp32 forward vs the float64 spec: differences are rounding only
    np.testing.assert_allclose(zimg, fixture["expected_zimg"], atol=2e-5)
    np.testing.assert_allclose(ztxt, fixture["expected_ztxt"], atol=2e-5)

    scale = float(np.asarray(model.logit_scale).reshape(()))
    logits = scale * (zimg @ ztxt.T)
    np.testing.assert_allclose(logits, fixture["expected_logits"], atol=1e-3)
    np.testing.assert_array_equal(logits.argmax(1), fixture["expected_pred"])


def test_fixture_is_regenerable_documented():
    """The generator is committed next to its artifact."""
    gen = os.path.join(GOLDEN, "generate.py")
    assert os.path.exists(gen)
    with open(gen) as f:
        src = f.read()
    assert "clipa_torch/open_clip/model.py:452-515" in src
