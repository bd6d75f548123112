"""End-to-end run of tools/embed.py (round-1 gap: the embedding path had
never executed because the container has no downloadable model).

A tiny random-weight BERT + wordpiece vocab is fabricated locally and saved
with save_pretrained — exercising the REAL tokenizer/model/mean-pool/
normalize/streamed-writer path on actual text, just at toy scale."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from nvdb_tpu.formats import vecbin

transformers = pytest.importorskip("transformers")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def tiny_model_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("tiny_bert"))
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + \
        list("abcdefghijklmnopqrstuvwxyz") + \
        ["##" + c for c in "abcdefghijklmnopqrstuvwxyz"] + \
        ["the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog",
         "vector", "search", "tpu", "index", "."]
    with open(os.path.join(d, "vocab.txt"), "w") as f:
        f.write("\n".join(vocab))
    tok = transformers.BertTokenizerFast(
        vocab_file=os.path.join(d, "vocab.txt"), do_lower_case=True)
    cfg = transformers.BertConfig(
        vocab_size=len(vocab), hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=64)
    model = transformers.BertModel(cfg)
    tok.save_pretrained(d)
    model.save_pretrained(d)
    return d


def test_embed_jsonl_to_vecbin(tiny_model_dir, tmp_path):
    corpus = tmp_path / "docs.jsonl"
    docs = [
        {"text": "The quick brown fox jumps over the lazy dog. "
                 "Vector search on TPU. " * 3},
        {"text": "Index the vectors. " * 10},
        {"text": "a"},
    ]
    corpus.write_text("\n".join(json.dumps(r) for r in docs))
    out = str(tmp_path / "emb.vecbin")
    meta = str(tmp_path / "rowmeta.jsonl")

    r = subprocess.run(
        [sys.executable, "-m", "nvdb_tpu.tools.embed", str(corpus), out,
         "--model", tiny_model_dir, "--batch", "4", "--max-chars", "80",
         "--meta", meta, "--cpu"],
        cwd=REPO, capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr
    f = vecbin.VecbinFile(out)
    assert f.dim == 32 and f.count >= 3
    rows = np.asarray(f.vectors)
    np.testing.assert_allclose(np.linalg.norm(rows, axis=1), 1.0, atol=1e-4)
    meta_rows = [json.loads(l) for l in open(meta)]
    assert len(meta_rows) == f.count  # one sidecar row per embedded chunk
    assert meta_rows[0]["doc"] == 0


def test_embed_plaintext(tiny_model_dir, tmp_path):
    corpus = tmp_path / "lines.txt"
    corpus.write_text("the quick brown fox\nvector search\n")
    out = str(tmp_path / "emb2.vecbin")
    r = subprocess.run(
        [sys.executable, "-m", "nvdb_tpu.tools.embed", str(corpus), out,
         "--model", tiny_model_dir, "--cpu"],
        cwd=REPO, capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr
    f = vecbin.VecbinFile(out)
    assert f.count == 2 and f.dim == 32
