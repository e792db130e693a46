"""Wiring-level parity vs the installed `transformers` oracles.

Round-1 gap (VERDICT): layer-level torch parity existed but the ASSEMBLED
towers were never validated. These tests export random weights through
models/weights.py into real `transformers` modules and compare full-tower
activations, and golden-test the BPE tokenizer against
transformers.CLIPTokenizer on the same vocab/merges files.

Reference usage: marigold_depth_pipeline.py:35-47 (CLIPTextModel/Tokenizer),
:381-394 (empty-prompt encode).
"""

import json
import os

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")

import jax.numpy as jnp

from marigold_tpu.models import clip_text as clip_lib
from marigold_tpu.models import weights as W


# ------------------------------------------------------------------ #
# CLIP text tower


def _small_hf_clip_config():
    return transformers.CLIPTextConfig(
        vocab_size=199,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=3,
        num_attention_heads=4,
        max_position_embeddings=77,
        hidden_act="gelu",
        bos_token_id=197,
        eos_token_id=198,
    )


@pytest.fixture(scope="module")
def hf_clip(tmp_path_factory):
    torch.manual_seed(0)
    cfg = _small_hf_clip_config()
    model = transformers.CLIPTextModel(cfg).eval()
    d = str(tmp_path_factory.mktemp("hf_clip"))
    model.save_pretrained(d, safe_serialization=True)
    return model, cfg, d


def test_clip_tower_parity_full(hf_clip):
    """Full-tower last_hidden_state parity, fp32, multi-token prompt."""
    model, hf_cfg, d = hf_clip
    cfg, params = W.load_text_encoder(d, dtype=jnp.float32)
    assert cfg.num_hidden_layers == hf_cfg.num_hidden_layers
    assert cfg.hidden_size == hf_cfg.hidden_size

    ids = np.array([[197, 5, 9, 42, 120, 198], [197, 198, 0, 0, 0, 0]],
                   np.int32)
    ours = np.asarray(clip_lib.apply(params, cfg, jnp.asarray(ids)))
    with torch.no_grad():
        theirs = model(torch.tensor(ids, dtype=torch.long)).last_hidden_state
    np.testing.assert_allclose(ours, theirs.numpy(), atol=2e-5, rtol=1e-4)


def test_clip_empty_prompt_parity(hf_clip):
    """The Marigold conditioning path: [BOS, EOS] -> [1, 2, hidden]."""
    model, hf_cfg, d = hf_clip
    cfg, params = W.load_text_encoder(d, dtype=jnp.float32)
    ours = np.asarray(clip_lib.encode_empty_prompt(params, cfg))
    assert ours.shape == (1, 2, hf_cfg.hidden_size)
    ids = torch.tensor([[hf_cfg.bos_token_id, hf_cfg.eos_token_id]],
                       dtype=torch.long)
    with torch.no_grad():
        theirs = model(ids).last_hidden_state
    np.testing.assert_allclose(ours, theirs.numpy(), atol=2e-5, rtol=1e-4)


# ------------------------------------------------------------------ #
# Tokenizer vs transformers.CLIPTokenizer on identical vocab files


def _make_vocab_files(d):
    """A miniature but structurally faithful CLIP BPE vocab: all 256
    byte-unicode symbols (+ </w> forms), a few merges, special tokens."""
    from marigold_tpu.models.tokenizer import _bytes_to_unicode

    chars = list(_bytes_to_unicode().values())
    vocab = {}
    for c in chars:
        vocab[c] = len(vocab)
    for c in chars:
        vocab[c + "</w>"] = len(vocab)
    merges = [
        ("h", "e"), ("l", "l"), ("he", "ll"), ("o", "</w>"),  # hell-o
        ("hell", "o</w>"),
        ("c", "a"), ("t", "</w>"), ("ca", "t</w>"),  # cat
        ("1", "2"),  # numbers are split char-wise by the pre-tokenizer
        ("'", "s</w>"),
        ("#", "#</w>"),  # a merge line STARTING with '#' (not a comment:
        # only merges.txt line 0 is a header — regression for a loader
        # that dropped every '#'-leading line)
    ]
    for a, b in merges:
        tok = a + b
        if tok not in vocab:
            vocab[tok] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)

    vocab_file = os.path.join(d, "vocab.json")
    merges_file = os.path.join(d, "merges.txt")
    with open(vocab_file, "w") as f:
        json.dump(vocab, f)
    with open(merges_file, "w") as f:
        f.write("#version: 0.2\n")
        for a, b in merges:
            f.write(f"{a} {b}\n")
    return vocab_file, merges_file


@pytest.fixture(scope="module")
def tokenizers(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("tok"))
    vocab_file, merges_file = _make_vocab_files(d)
    theirs = transformers.CLIPTokenizer(vocab_file, merges_file)
    from marigold_tpu.models.tokenizer import CLIPTokenizer

    ours = CLIPTokenizer.from_pretrained(d)
    return ours, theirs


@pytest.mark.parametrize(
    "text",
    [
        "",
        "hello",
        "a photo of a cat",
        "Hello, WORLD!!",
        "don't stop",
        "12345",
        "  spaced\t out\n text  ",
        "mixed123abc!?",
        "hello hello hello",
        "tag ## x ##",  # '#'-merge must have loaded (see fixture)
        "café au lait",  # non-ASCII letters stay one word (\p{L} parity)
        "snake_case_name",  # '_' belongs to the punctuation class
        "naïve 日本語 test",
    ],
)
def test_tokenizer_matches_transformers(tokenizers, text):
    ours, theirs = tokenizers
    ref_ids = theirs(text, padding="do_not_pad").input_ids
    our_ids = ours(text, padding="do_not_pad").input_ids[0]
    assert our_ids == ref_ids, (text, our_ids, ref_ids)


def test_tokenizer_empty_prompt_is_bos_eos(tokenizers):
    """The one call Marigold makes (do_not_pad '' -> [BOS, EOS])."""
    ours, theirs = tokenizers
    our_ids = ours("", padding="do_not_pad").input_ids[0]
    assert our_ids == theirs("", padding="do_not_pad").input_ids
    assert our_ids == [ours.bos_token_id, ours.eos_token_id]


def test_tokenizer_max_length_padding(tokenizers):
    ours, theirs = tokenizers
    ref = theirs("hello cat", padding="max_length", max_length=12,
                 truncation=True).input_ids
    got = ours("hello cat", padding="max_length", max_length=12,
               truncation=True).input_ids[0]
    assert got == ref
