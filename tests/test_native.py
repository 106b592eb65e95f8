"""Native C++ components: build, PNG correctness, tokenizer parity."""

import json
import os
import string

import numpy as np
import pytest

from sid_lsg_tpu import native


def native_or_skip():
    if not native.native_available():
        pytest.skip("no C++ toolchain available")


def test_png_roundtrip(tmp_path):
    native_or_skip()
    from PIL import Image

    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (37, 23, 3), np.uint8)
    path = str(tmp_path / "x.png")
    native.write_png(path, img)
    back = np.asarray(Image.open(path))
    np.testing.assert_array_equal(back, img)
    # Grayscale.
    g = rng.randint(0, 256, (16, 16), np.uint8)
    native.write_png(str(tmp_path / "g.png"), g)
    np.testing.assert_array_equal(np.asarray(Image.open(str(tmp_path / "g.png"))), g)


def test_png_batch(tmp_path):
    native_or_skip()
    from PIL import Image

    rng = np.random.RandomState(1)
    imgs = rng.randint(0, 256, (5, 16, 16, 3), np.uint8)
    paths = [str(tmp_path / f"{i}.png") for i in range(5)]
    native.write_png_batch(paths, imgs)
    for p, img in zip(paths, imgs):
        np.testing.assert_array_equal(np.asarray(Image.open(p)), img)


@pytest.fixture(scope="module")
def clip_tok_dir(tmp_path_factory):
    """Small real BPE vocab: single chars + a few merges."""
    d = tmp_path_factory.mktemp("tok")
    from sid_lsg_tpu.models.tokenizer import bytes_to_unicode

    # All byte-unicode alphabet chars (like the real CLIP vocab) so any
    # UTF-8 input tokenizes; ASCII subset feeds the native fast path.
    chars = list(bytes_to_unicode().values())
    vocab = {}
    for c in chars:
        vocab[c] = len(vocab)
        vocab[c + "</w>"] = len(vocab)
    merges = [
        "t h", "th e</w>", "c a", "ca t</w>", "d o", "do g</w>",
        "a</w> |NOPE|",  # never matches; keeps list nontrivial
    ]
    merges = [m for m in merges if "|NOPE|" not in m]
    for m in merges:
        a, b = m.split(" ")
        vocab[a + b] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    with open(d / "vocab.json", "w") as f:
        json.dump(vocab, f)
    with open(d / "merges.txt", "w") as f:
        f.write("#version: 0.2\n" + "\n".join(merges) + "\n")
    return str(d)


def test_native_tokenizer_parity(clip_tok_dir):
    native_or_skip()
    from sid_lsg_tpu.models.tokenizer import CLIPTokenizer

    py = CLIPTokenizer(clip_tok_dir, model_max_length=16)
    nt = native.NativeTokenizer(py)
    prompts = [
        "the cat sat",
        "a dog!",
        "It's 42 dogs, isn't it?",
        "punctuation... !!! ??",
        "THE CAT",
        "weird   spacing\tand\nnewlines",
        "café au lait",  # non-ASCII -> python fallback path
        "a &amp; b",  # html entity -> python fallback path
        "",
    ]
    np.testing.assert_array_equal(nt(prompts), py(prompts))


def test_native_tokenizer_truncation(clip_tok_dir):
    native_or_skip()
    from sid_lsg_tpu.models.tokenizer import CLIPTokenizer

    py = CLIPTokenizer(clip_tok_dir, model_max_length=8)
    nt = native.NativeTokenizer(py)
    long = "the cat the dog the cat the dog the cat"
    np.testing.assert_array_equal(nt([long]), py([long]))
