"""Evaluators: prompts, retrieval ranking math, zero-shot end-to-end."""

import numpy as np
import pytest

from clipa_tpu.evaluators import prompts
from clipa_tpu.evaluators.retrieval import (image_to_text_retrieval_eval,
                                            text_to_image_retrieval_eval)


def test_prompt_templates():
    t = prompts.get_prompt_templates("clip_paper")
    assert len(t) >= 80
    assert all("{}" in tpl for tpl in t)
    assert prompts.get_prompt_templates("class_name_only") == ["{}"]


def test_class_names():
    names = prompts.get_class_names("imagenet2012")
    assert len(names) == 1000
    assert "great white shark" in names[:10]
    custom = prompts.get_class_names("whatever", source=["Cat_1!", "dog"])
    assert custom == ["cat 1", "dog"]


def test_canonicalize():
    assert prompts.canonicalize("A_photo of-a {}!",
                                keep_punctuation_exact_string="{}") == \
        "a photo ofa {}"
    assert prompts.canonicalize("Hello, World_") == "hello world"


def test_label_subsets():
    assert len(prompts.get_label_subset("imagenet_a")) == 200
    assert prompts.get_label_subset("imagenet2012") is None


def test_retrieval_recall_math():
    # 2 images, 4 captions (2 per image). Perfect similarity.
    sim = np.array([
        [0.9, 0.8, 0.1, 0.2],   # image 0 matches captions 0,1
        [0.1, 0.0, 0.9, 0.7],   # image 1 matches captions 2,3
    ])
    ids = np.array([0, 0, 1, 1])
    i2t = image_to_text_retrieval_eval(sim, ids, ks=(1,))
    t2i = text_to_image_retrieval_eval(sim, ids, ks=(1,))
    assert i2t["Recall@1"] == 1.0
    assert t2i["Recall@1"] == 1.0

    # break caption 1 -> image 1: img2txt@1 still perfect for image 0
    sim2 = sim.copy()
    sim2[1, 2:] = -1.0  # image 1's captions now rank below image 0's
    i2t2 = image_to_text_retrieval_eval(sim2, ids, ks=(1,))
    assert i2t2["Recall@1"] == 0.5
    # caption 2: best image is image0 now (0.1 > -1) -> wrong
    t2i2 = text_to_image_retrieval_eval(sim2, ids, ks=(1, 2))
    assert t2i2["Recall@1"] == 0.5
    assert t2i2["Recall@2"] == 1.0


@pytest.fixture(scope="module")
def trained_tiny(mesh8_module):
    """Trains the smoke config briefly; returns (config, model, params,
    predict_fn, mesh)."""
    import jax
    from clipa_tpu import optim
    from clipa_tpu.config import load_config
    from clipa_tpu.data import core as data_core, pipeline as pipeline_lib
    from clipa_tpu.models import two_towers
    from clipa_tpu import registry
    from clipa_tpu.train import step as step_lib
    import jax.numpy as jnp

    mesh = mesh8_module
    # 80 steps: the tiny model's loss plateaus at ln(64) until ~step 35-45
    # (measured on both CPU and TPU), so 40 steps was a marginal oracle.
    steps = 80
    config = load_config(f"clipa_tpu/configs/smoke.py:steps={steps},batch=64")
    # Constant LR (after warmup): the default cosine decays lr to ~0 exactly
    # at the final step, which made the end-of-run loss assert meaningless.
    config.schedule = [(".*", dict(decay_type="const", warmup_steps=2))]
    model = two_towers.Model(**dict(config.model))
    tx, _ = optim.make(config, jax.eval_shape(
        lambda r: model.init({"params": r},
                             jnp.zeros((1, 32, 32, 3)),
                             jnp.zeros((1, 8), jnp.int32),
                             train=False)["params"],
        jax.random.PRNGKey(0)), sched_kw=dict(total_steps=steps))
    state = step_lib.init_train_state(model, tx, config, mesh,
                                      jax.random.PRNGKey(0))
    update = step_lib.make_update_fn(model, tx, config, mesh)

    source = data_core.get_source(**dict(config.input.data))
    pp_fn = registry.get_preprocess_fn(config.input.pp)
    batches = pipeline_lib.make_for_train(
        source, pp_fn, 64, shuffle_buffer=64, seed=0, num_workers=2)
    it = pipeline_lib.start_input_pipeline(batches, mesh, n_prefetch=1)
    losses = []
    for _, batch in zip(range(steps), it):
        state, meas = update(state, batch)
        losses.append(float(meas["training_loss"]))
    predict_fn = step_lib.make_predict_fn(model)
    return config, state["params"], predict_fn, mesh, losses


@pytest.fixture(scope="module")
def mesh8_module():
    from clipa_tpu.parallel import create_mesh
    return create_mesh(fsdp=1)


def test_zeroshot_beats_chance(trained_tiny):
    from clipa_tpu.configs.smoke import _vocab_path
    from clipa_tpu.data import core as data_core
    from clipa_tpu.evaluators import zeroshot

    config, params, predict_fn, mesh, losses = trained_tiny
    # Strict end-to-end learning oracle: chance is ln(64)=4.16; demand a
    # real margin below it AND monotone-ish improvement over the run.
    assert losses[-1] < 3.6, f"final loss {losses[-1]} lacks margin vs 4.16"
    assert losses[-1] < losses[0] - 0.5, f"loss did not decrease: {losses}"

    captions = ["a photo of a cat", "a photo of a dog",
                "a picture of a house", "an image of a tree"]
    eval_source = data_core.SyntheticSource(n_examples=64, res=40,
                                            captions=captions)
    ev = zeroshot.Evaluator(
        predict_fn, mesh, batch_size=32,
        dataset_names=["synthetic4"],
        class_names=captions,
        prompt_templates="class_name_only",
        pp_img="central_crop(32)",
        pp_txt=(f'bert_tokenize(inkey="texts", max_len=8, '
                f'vocab_path="{_vocab_path()}", sample_if_multi=False)'),
        sources={"synthetic4": eval_source},
        num_workers=0)
    results = dict(ev.run(params))
    acc = results["synthetic4_accuracy"]
    assert acc > 0.32, f"zero-shot accuracy {acc} not above chance (0.25)"


def test_predict_fn_normalizes_uint8_like_train(trained_tiny):
    """Regression: eval-path uint8 images must be normalized with the same
    statistics the train step applies (train/step.py:54-55) — the round-1
    tree fed evaluators raw uint8 while training on normalized floats."""
    import jax.numpy as jnp
    from clipa_tpu.ops import preprocess

    config, params, predict_fn, mesh, _ = trained_tiny
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (4, 32, 32, 3)).astype(np.uint8)
    z_uint8, _, _ = predict_fn(params, image=jnp.asarray(img))
    z_float, _, _ = predict_fn(
        params, image=preprocess.normalize_uint8(jnp.asarray(img)))
    np.testing.assert_allclose(np.asarray(z_uint8), np.asarray(z_float),
                               atol=1e-5)


def test_contrastive_evaluator(trained_tiny):
    from clipa_tpu.data import core as data_core
    from clipa_tpu.evaluators import contrastive

    config, params, predict_fn, mesh, _ = trained_tiny
    source = data_core.SyntheticSource(n_examples=48, res=40)
    ev = contrastive.Evaluator(
        predict_fn, mesh, batch_size=32, source=source,
        pp=config.input.pp, num_workers=0)
    results = dict(ev.run(params))
    assert np.isfinite(results["loss"])
    assert 0 <= results["ncorrect"] <= 1


def test_retrieval_evaluator(trained_tiny):
    from clipa_tpu.configs.smoke import _vocab_path
    from clipa_tpu.data import core as data_core
    from clipa_tpu.evaluators import retrieval

    config, params, predict_fn, mesh, _ = trained_tiny
    source = data_core.SyntheticSource(n_examples=24, res=40)
    ev = retrieval.Evaluator(
        predict_fn, mesh, batch_size=32, source=source,
        pp_img="central_crop(32)",
        pp_txt=(f'bert_tokenize(inkey="texts", max_len=8, '
                f'vocab_path="{_vocab_path()}", sample_if_multi=False)'),
        num_workers=0)
    results = dict(ev.run(params))
    for k in ("img2txt/Recall@1", "txt2img/Recall@10"):
        assert 0 <= results[k] <= 1


# ---------------------------------------------------------------------------
# Scale-realistic zero-shot protocol: 1000 classes x 81 templates, with
# comma-aliases, simulated multi-host prompt sharding, and the IN-A subset
# restriction — the owner/padding bookkeeping proven at cardinality against
# a naive single-host reference (reference protocol:
# discriminative_classifier.py:121-171,303-312).
# ---------------------------------------------------------------------------

def _fake_tokenize(sample):
    """Deterministic 'tokenizer': 16 int32 tokens hashed from the text."""
    text = sample["texts"]
    h = np.frombuffer(text.encode()[:64].ljust(64, b"\0"), np.uint8)
    rng = np.random.default_rng(int(h.astype(np.uint64).sum()))
    return {"labels": rng.integers(0, 30000, size=(16,), dtype=np.int64)
            .astype(np.int32)}


def _fake_embed(tokens):
    """Deterministic 'text tower': embedding from token values (no params)."""
    t = np.asarray(tokens, np.float64)
    d = 32
    freqs = np.arange(1, d + 1)[None, None, :]
    z = np.sin(t[:, :, None] * freqs / 997.0).sum(axis=1)
    return (z / (np.linalg.norm(z, axis=-1, keepdims=True) + 1e-8)).astype(
        np.float32)


def _naive_class_embeddings(names, templates):
    """Single-host, no-sharding, no-padding reference implementation."""
    n_class = len(names)
    z = np.zeros((n_class, 32), np.float64)
    counts = np.zeros((n_class,), np.int64)
    for ci, name in enumerate(names):
        for alias in [a.strip() for a in name.split(",") if a.strip()]:
            for tpl in templates:
                tok = _fake_tokenize({"texts": tpl.format(alias)})["labels"]
                z[ci] += _fake_embed(tok[None])[0]
                counts[ci] += 1
    z /= np.maximum(counts, 1)[:, None]
    z /= np.linalg.norm(z, axis=-1, keepdims=True) + 1e-8
    return z.astype(np.float32), counts


@pytest.mark.parametrize("nproc,local_bs", [(1, 256), (4, 64), (3, 128)])
def test_zeroshot_prompt_sharding_at_cardinality(nproc, local_bs):
    from clipa_tpu.evaluators import zeroshot

    templates = prompts.get_prompt_templates("clip_paper")
    assert len(templates) == 81
    # 1000 classes; every 7th carries a comma alias (uneven prompt counts —
    # the case the per-host padding/owner logic must survive).
    names = [f"class {i}" + (f", alias {i}" if i % 7 == 0 else "")
             for i in range(1000)]

    texts, owner = zeroshot.build_prompts(names, templates)
    n_alias = sum(1 for i in range(1000) if i % 7 == 0)
    assert len(texts) == (1000 + n_alias) * 81

    ref_z, ref_counts = None, None  # computed once per session below

    # Simulate every host: each tokenizes only its contiguous share, embeds
    # in local batches, and the accumulations are merged exactly as the
    # replicated-output path merges them (np.add.at over owner, masked).
    n_class = len(names)
    z = np.zeros((n_class, 32), np.float64)
    counts = np.zeros((n_class,), np.int64)
    seen = []
    per_host_lens = set()
    for pidx in range(nproc):
        tokens, ow, mask = zeroshot.shard_host_prompts(
            texts, owner, nproc, pidx, local_bs, _fake_tokenize)
        per_host_lens.add(len(tokens))
        assert len(tokens) % local_bs == 0
        for i in range(0, len(tokens), local_bs):
            ztxt = _fake_embed(tokens[i:i + local_bs])
            m = mask[i:i + local_bs].astype(bool)
            np.add.at(z, ow[i:i + local_bs][m], ztxt[m].astype(np.float64))
            counts += np.bincount(ow[i:i + local_bs][m], minlength=n_class)
        seen.append(mask.sum())
    # same padded length on every host (all hosts step the same program)
    assert len(per_host_lens) == 1
    # every prompt consumed exactly once across hosts, none duplicated
    assert sum(seen) == len(texts)

    z /= np.maximum(counts, 1)[:, None]
    z /= np.linalg.norm(z, axis=-1, keepdims=True) + 1e-8

    ref_z, ref_counts = _naive_class_embeddings(names, templates)
    # per-class prompt counts: 81, or 162 for aliased classes
    np.testing.assert_array_equal(counts, ref_counts)
    assert set(counts) == {81, 162}
    np.testing.assert_allclose(z.astype(np.float32), ref_z, atol=2e-6)


def test_zeroshot_subset_restriction_remaps():
    """IN-A style evaluation restricts the classifier to the subset and
    the naive and sharded paths agree on the restricted matrix."""
    from clipa_tpu.evaluators import zeroshot

    subset = prompts.get_label_subset("imagenet_a")
    assert subset is not None and len(subset) == 200
    names_full = [f"thing {i}" for i in range(1000)]
    names = [names_full[i] for i in subset]
    templates = prompts.get_prompt_templates("clip_paper")[:3]

    texts, owner = zeroshot.build_prompts(names, templates)
    assert len(texts) == 200 * 3
    assert max(owner) == 199  # owners index the RESTRICTED classifier

    tokens, ow, mask = zeroshot.shard_host_prompts(
        texts, owner, 1, 0, 100, _fake_tokenize)
    z = np.zeros((200, 32), np.float64)
    counts = np.zeros((200,), np.int64)
    for i in range(0, len(tokens), 100):
        ztxt = _fake_embed(tokens[i:i + 100])
        m = mask[i:i + 100].astype(bool)
        np.add.at(z, ow[i:i + 100][m], ztxt[m].astype(np.float64))
        counts += np.bincount(ow[i:i + 100][m], minlength=200)
    assert (counts == 3).all()
    z /= counts[:, None]
    z /= np.linalg.norm(z, axis=-1, keepdims=True) + 1e-8
    ref_z, _ = _naive_class_embeddings(names, templates)
    np.testing.assert_allclose(z.astype(np.float32), ref_z, atol=2e-6)


def test_class_embeddings_jit_path_at_cardinality(trained_tiny):
    """The REAL Evaluator._class_embeddings (jit, replicated outputs,
    global batching) at 1000-class cardinality equals a naive loop through
    the same predict_fn — proving the owner/mask bookkeeping end to end,
    not just the host-side helpers."""
    import jax
    from clipa_tpu.configs.smoke import _vocab_path
    from clipa_tpu.data import core as data_core
    from clipa_tpu import registry
    from clipa_tpu.evaluators import zeroshot

    config, params, predict_fn, mesh, _ = trained_tiny
    # 1000 classes, every 11th aliased; 2 templates keeps the prompt count
    # (~2180) tractable while still exercising many partial/padded batches.
    names = [f"object number {i}" + (f", thing {i}" if i % 11 == 0 else "")
             for i in range(1000)]
    templates = ["a photo of a {}.", "an image of the {}."]
    pp_txt = (f'bert_tokenize(inkey="texts", max_len=8, '
              f'vocab_path="{_vocab_path()}", sample_if_multi=False)')
    ev = zeroshot.Evaluator(
        predict_fn, mesh, batch_size=96,
        dataset_names=["synth1k"], class_names=names,
        prompt_templates="class_name_only",
        pp_img="central_crop(32)", pp_txt=pp_txt,
        sources={"synth1k": data_core.SyntheticSource(
            n_examples=8, res=40, captions=["x"])},
        num_workers=0)
    # Inject the 2-template set (class_name_only has 1; the alias+template
    # cross-product is what stresses the owner map).
    ev.datasets["synth1k"]["templates"] = templates

    z = ev._class_embeddings(params, "synth1k")
    assert z.shape == (1000, config.model.out_dim[1])

    # Naive: same prompts through the same predict_fn, one at a time.
    pp_txt_fn = registry.get_preprocess_fn(pp_txt)
    texts, owner = zeroshot.build_prompts(names, templates)
    ref = np.zeros((1000, z.shape[1]), np.float64)
    counts = np.zeros((1000,), np.int64)
    toks = np.stack([pp_txt_fn({"texts": t})["labels"] for t in texts])
    for i in range(0, len(toks), 96):
        _, ztxt, _ = predict_fn(params, None, toks[i:i + 96])
        ztxt = np.asarray(jax.device_get(ztxt), np.float64)
        for j, ci in enumerate(owner[i:i + 96]):
            ref[ci] += ztxt[j]
            counts[ci] += 1
    assert set(counts) == {2, 4}
    ref /= counts[:, None]
    ref /= np.linalg.norm(ref, axis=-1, keepdims=True) + 1e-8
    np.testing.assert_allclose(z, ref.astype(np.float32), atol=3e-6)


# ---------------------------------------------------------------------------
# classification + mean evaluators (working rebuilds of the reference's
# import-broken clipa_jax/evaluators/{classification,mean}.py).
# ---------------------------------------------------------------------------

def _channel_logit_predict(params, image=None, **unused):
    """Classifier oracle for SyntheticSource: class c halves channel c, so
    -per-channel-mean peaks at the true class (3 classes, res channels)."""
    import jax.numpy as jnp
    del params, unused
    return -jnp.mean(image.astype(jnp.float32), axis=(1, 2)) / 16.0


def test_classification_evaluator(mesh8_module):
    from clipa_tpu.data import core as data_core
    from clipa_tpu.evaluators import classification

    mesh = mesh8_module
    # 3 captions -> classes 0..2 map to unique halved channels; 22 examples
    # with batch 8 exercises the _mask padding path (2 padded rows whose
    # all-zero onehot must ALSO be dropped by the labels.max() rule).
    source = data_core.SyntheticSource(
        n_examples=22, res=24, captions=["cat", "dog", "house"])
    ev = classification.Evaluator(
        _channel_logit_predict, mesh, batch_size=8, source=source,
        pp='onehot(3, key="label")|keep("image", "labels")',
        num_workers=0)
    results = dict(ev.run(params=None))
    assert results["prec@1"] == 1.0, results
    assert 0 < results["loss"] < np.log(3), results


def test_classification_excludes_zero_label_rows(mesh8_module):
    """Rows whose label vector is all zeros must not count toward n, even
    when unmasked (reference classification.py:44 `mask *= labels.max`)."""
    from clipa_tpu.data import core as data_core
    from clipa_tpu.evaluators import classification

    class ZeroLabelSource(data_core.SyntheticSource):
        def iter_process_shard(self, **kw):
            for i, s in enumerate(super().iter_process_shard(**kw)):
                if i % 2:
                    s["label"] = np.zeros((0,), np.int64)  # all-zero onehot
                yield s

    source = ZeroLabelSource(n_examples=16, res=24,
                             captions=["cat", "dog", "house"])
    ev = classification.Evaluator(
        _channel_logit_predict, mesh8_module, batch_size=8, source=source,
        pp='onehot(3, key="label")|keep("image", "labels")',
        num_workers=0)
    results = dict(ev.run(params=None))
    # the surviving (even-indexed) rows are still all classified perfectly
    assert results["prec@1"] == 1.0, results


def test_mean_evaluator_matches_numpy(mesh8_module):
    from clipa_tpu.data import core as data_core
    from clipa_tpu.evaluators import mean as mean_lib

    mesh = mesh8_module
    source = data_core.SyntheticSource(n_examples=19, res=24)

    def predict(params, batch):
        import jax.numpy as jnp
        del params
        img = batch["image"].astype(jnp.float32)
        return {"pixel_mean": jnp.mean(img, axis=(1, 2, 3)),
                "pixel_max": jnp.max(img, axis=(1, 2, 3))}

    ev = mean_lib.Evaluator(predict, mesh, batch_size=8, source=source,
                            pp='keep("image")', num_workers=0)
    results = dict(ev.run(params=None))

    imgs = np.stack([s["image"] for s in source.iter_process_shard()])
    assert imgs.shape[0] == 19
    np.testing.assert_allclose(
        results["pixel_mean"], imgs.reshape(19, -1).mean(axis=1).mean(),
        rtol=1e-5)
    np.testing.assert_allclose(
        results["pixel_max"],
        imgs.reshape(19, -1).max(axis=1).astype(np.float64).mean(),
        rtol=1e-6)


def test_classification_and_mean_from_config(mesh8_module):
    """The factory dispatches type='classification' and type='mean'."""
    from clipa_tpu.config import ConfigDict
    from clipa_tpu.data import core as data_core
    from clipa_tpu.evaluators import common as eval_common

    source = data_core.SyntheticSource(n_examples=8, res=24,
                                       captions=["cat", "dog", "house"])
    config = ConfigDict(evals=dict(
        cls=dict(type="classification", source=source,
                 pp='onehot(3, key="label")|keep("image", "labels")',
                 batch_size=8, num_workers=0, log_steps=10),
    ))
    evs = eval_common.from_config(
        config, {"predict": _channel_logit_predict}, mesh=mesh8_module)
    [(name, ev, log_steps, prefix)] = evs
    assert name == "cls" and log_steps == 10
    assert dict(ev.run(None))["prec@1"] == 1.0
