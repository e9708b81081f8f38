"""Real-checkpoint integration rehearsal (env-gated; skipped without weights).

The converter stack is oracle-tested against random-init torch modules
elsewhere; this module is the drill for the day a released CONCH checkpoint
(and optionally real CLAM feature dirs) lands. Protocol (MIGRATING.md
"Checkpoint parity"):

  MOC_TPU_CONCH_CKPT=/path/pytorch_model.bin \
  [MOC_TPU_CONCH_TOKENIZER=/path/tokenizer.json] \
  [MOC_TPU_REF_WEIGHTS_NSCLC=/path/nsclc_weights.pt] \
  [MOC_TPU_FEATURES_NSCLC=/path/merge_features_conch] \
      python -m pytest tests/test_realckpt.py -m realckpt -v

Stages: checkpoint → flax params → text-encode sanity → NSCLC/RCC weight
matrices from the vendored banks → (optional) diff vs a reference-produced
``.pt`` weight cache ≤ 1e-4 → (optional) one real fold →
``summary_{shot}.csv``. Ref: ``/root/reference/models/conch/open_clip_custom/
factory.py:79-113``, ``main_moc.py:139-203,586-644``.
"""

import os

import numpy as np
import pytest

CKPT = os.environ.get("MOC_TPU_CONCH_CKPT")
TOKENIZER = os.environ.get("MOC_TPU_CONCH_TOKENIZER")

pytestmark = [
    pytest.mark.realckpt,
    pytest.mark.skipif(not CKPT, reason="MOC_TPU_CONCH_CKPT not set"),
]


@pytest.fixture(scope="module")
def conch():
    from moc_tpu.zeroshot import ConchTokenizer, load_conch
    from moc_tpu.zeroshot.classifier import make_encode_text_fn

    model, params = load_conch(CKPT)
    tokenizer = ConchTokenizer(TOKENIZER)
    return make_encode_text_fn(model, params), tokenizer


def test_checkpoint_converts_and_encodes(conch):
    encode, tokenizer = conch
    ids = tokenizer(["an image of lung adenocarcinoma.",
                     "an image of squamous cell carcinoma."])
    emb = np.asarray(encode(ids))
    assert emb.shape == (2, 512)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, atol=1e-4)
    # distinct prompts must not collapse
    assert float(emb[0] @ emb[1]) < 0.999


@pytest.mark.parametrize("name", ["nsclc", "rcc"])
def test_weight_matrices_build_and_match_reference(conch, name, tmp_path):
    encode, tokenizer = conch
    from moc_tpu.config import DEFAULT_PROMPT_ROOT, PRESETS
    from moc_tpu.zeroshot import cached_zero_shot_classifier, load_prompt_bank

    preset = PRESETS[name]
    bank = load_prompt_bank(
        os.path.join(DEFAULT_PROMPT_ROOT, preset.prompt_file), preset.label_dict)
    w = cached_zero_shot_classifier(
        str(tmp_path / f"w_{name}.npz"), encode, tokenizer, bank, use_cache=False)
    assert w.shape == (512, preset.n_classes)
    np.testing.assert_allclose(np.linalg.norm(w, axis=0), 1.0, atol=1e-4)

    ref_path = os.environ.get(f"MOC_TPU_REF_WEIGHTS_{name.upper()}")
    if not ref_path:
        pytest.skip(f"MOC_TPU_REF_WEIGHTS_{name.upper()} not set; built-only")
    import torch

    ref = torch.load(ref_path, map_location="cpu", weights_only=False)
    ref = np.asarray(ref.detach().float().numpy() if hasattr(ref, "detach") else ref)
    if ref.shape == w.shape[::-1]:
        ref = ref.T
    np.testing.assert_allclose(w, ref, atol=1e-4)


@pytest.mark.parametrize("name", ["nsclc", "rcc"])
def test_real_fold_end_to_end(conch, name, tmp_path):
    feat_dir = os.environ.get(f"MOC_TPU_FEATURES_{name.upper()}")
    if not feat_dir:
        pytest.skip(f"MOC_TPU_FEATURES_{name.upper()} not set")
    encode, tokenizer = conch
    from moc_tpu.config import DEFAULT_PROMPT_ROOT, PRESETS
    from moc_tpu.data import BagLoader, EpisodeBags, SlideTable, read_split_csv
    from moc_tpu.moc import MOCConfig, run_episode
    from moc_tpu.moc.results import summarize, write_episode_result
    from moc_tpu.zeroshot import cached_zero_shot_classifier, load_prompt_bank

    preset = PRESETS[name]
    bank = load_prompt_bank(
        os.path.join(DEFAULT_PROMPT_ROOT, preset.prompt_file), preset.label_dict)
    bank_ext = load_prompt_bank(
        os.path.join(DEFAULT_PROMPT_ROOT, preset.prompt_file_ext), preset.label_dict_ext)
    w = cached_zero_shot_classifier(str(tmp_path / "w.npz"), encode, tokenizer, bank)
    w_ext = cached_zero_shot_classifier(str(tmp_path / "we.npz"), encode, tokenizer,
                                        bank_ext)

    table = SlideTable.from_csv(preset.csv_path("/nonexistent"), preset.label_dict)
    loader = BagLoader(table, feat_dir, cache=True)
    split = read_split_csv(preset.split_csv("/nonexistent", 1, 0))
    episode = EpisodeBags.load(loader, split.train, split.val, split.test,
                               repeat_num=preset.repeat_num(1))
    cfg = MOCConfig(n_classes=preset.n_classes, n_ext_classes=preset.n_ext_classes,
                    topj=400, topk=10, num_epochs=25)
    result = run_episode(episode, w, w_ext, cfg, seed=0)
    assert result.best_val > 0.5, "real episode should beat chance on val"
    shot_dir = str(tmp_path / "1_shot")
    write_episode_result(shot_dir, 1, 0, result)
    summarize(str(tmp_path), shots=(1,), folds=(0,))
    assert os.path.exists(tmp_path / "summary_1.csv")
