"""Few-shot evaluator, mixture source, randaug op."""

import numpy as np
import pytest

from clipa_tpu.data import core as data_core


def test_mixture_source_weights():
    a = data_core.SyntheticSource(n_examples=100, res=8,
                                  captions=["only a"])
    b = data_core.SyntheticSource(n_examples=100, res=8,
                                  captions=["only b"])
    mix = data_core.MixtureSource([a, b], weights=[0.9, 0.1])
    it = mix.iter_process_shard(repeat=True, seed=0)
    texts = [next(it)["texts"] for _ in range(300)]
    frac_a = sum(t == "only a" for t in texts) / len(texts)
    assert 0.8 < frac_a < 0.97
    assert mix.total_examples() == 200


def test_mixture_source_from_config():
    mix = data_core.get_source(
        "mixture",
        sources=[{"name": "synthetic", "n_examples": 10, "res": 8},
                 {"name": "synthetic", "n_examples": 10, "res": 8}],
        weights=[1, 1])
    assert mix.total_examples() == 20


def test_randaug_ops_all_run():
    from clipa_tpu.pp import randaugment
    from PIL import Image
    img = Image.fromarray(np.random.RandomState(0).randint(
        0, 255, (24, 24, 3), np.uint8))
    rng = np.random.default_rng(0)
    for fn in randaugment._make_ops():
        out = fn(img, 15.0, rng)
        assert np.asarray(out).shape == (24, 24, 3), fn.__name__


def test_autoaugment_ops_all_run():
    from clipa_tpu.pp import autoaugment
    from PIL import Image
    img = Image.fromarray(np.random.RandomState(0).randint(
        0, 255, (32, 32, 3), np.uint8))
    rng = np.random.default_rng(0)
    names = {name for sub in autoaugment.POLICY_V0 for name, _, _ in sub}
    names |= {"Cutout", "TranslateX", "Contrast", "Brightness", "Sharpness"}
    for name in sorted(names):
        out = autoaugment._apply_op(img, name, 7.0, rng)
        assert np.asarray(out).shape == (32, 32, 3), name


def test_autoaugment_pp_op():
    from clipa_tpu.registry import get_preprocess_fn
    pp = get_preprocess_fn('autoaug(policy="v0")|cutout(pad_size=4)')
    img = np.random.RandomState(0).randint(0, 255, (32, 32, 3), np.uint8)
    out = pp({"image": img, "_rng": np.random.default_rng(1)})
    assert out["image"].shape == (32, 32, 3)
    assert out["image"].dtype == np.uint8

    # every sub-policy of v0 executes cleanly at prob=1
    from clipa_tpu.pp import autoaugment
    from PIL import Image
    rng = np.random.default_rng(0)
    pil = Image.fromarray(img)
    for sub in autoaugment.POLICY_V0:
        cur = pil
        for name, _, mag in sub:
            cur = autoaugment._apply_op(cur, name, float(mag), rng)
        assert np.asarray(cur).shape == (32, 32, 3)

    import pytest
    with pytest.raises(ValueError):
        get_preprocess_fn('autoaug(policy="nope")')


def test_fewshot_evaluator_separable():
    """Linearly separable synthetic embeddings: probe must hit ~100%."""
    import jax
    from clipa_tpu.evaluators import fewshot
    from clipa_tpu.parallel import create_mesh

    mesh = create_mesh(fsdp=1)

    class FakeSource(data_core.DataSource):
        def __init__(self, n, seed):
            self.n, self.seed = n, seed

        def total_examples(self):
            return self.n

        def iter_process_shard(self, *, repeat=False, seed=None):
            rng = np.random.default_rng(self.seed)
            for i in range(self.n):
                cls = i % 4
                img = rng.normal(0, 1.0, (8, 8, 3)).astype(np.float32)
                # class signal spread over a whole channel plane (64 dims)
                img[:, :, cls % 3] += 4.0 * (1 if cls < 3 else -1)
                yield {"image": img, "label": cls}

    def predict_fn(params, image=None, text=None):
        # "embedding" = mean pooled pixels (enough: signal is linear)
        z = image.reshape(image.shape[0], -1)
        return z, None, {}

    ev = fewshot.Evaluator(
        predict_fn, mesh, batch_size=16,
        datasets={"toy": (FakeSource(64, 0), FakeSource(32, 1))},
        shots=(5,), pp="", num_workers=0)
    results = dict(ev.run(params=None))
    assert results["toy/5shot"] > 0.9
