import numpy as np

from nvdb_tpu.tools.embed import chunk_text


def test_chunking_respects_max_chars():
    text = ". ".join(f"Sentence number {i} with some words" for i in range(50)) + "."
    chunks = chunk_text(text, max_chars=120)
    assert all(len(c) <= 120 for c in chunks)
    # no content lost
    assert sum(len(c.replace(" ", "")) for c in chunks) >= \
        len(text.replace(" ", "")) - len(chunks) * 2


def test_chunking_hard_splits_long_sentence():
    text = "x" * 500
    chunks = chunk_text(text, max_chars=100)
    assert len(chunks) == 5 and all(len(c) <= 100 for c in chunks)


def test_chunking_empty():
    assert chunk_text("", 100) == []
    assert chunk_text("   ", 100) == []


def test_embed_pipeline_end_to_end(tmp_path):
    """Run the FULL embed path (tokenizer -> transformer -> mean-pool ->
    normalize -> streamed vecbin + rowmeta sidecar) against a tiny
    random-weight BERT saved locally — no network, exercises the exact code
    path a real model would take (reference: build_vecbin_chunked.py:290-378)."""
    import torch
    from transformers import BertConfig, BertModel, BertTokenizerFast

    torch.manual_seed(0)
    mdir = tmp_path / "tinybert"
    mdir.mkdir()
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + \
        ["the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog",
         "sentence", "number", "with", "some", "words", "alpha", "beta"]
    (mdir / "vocab.txt").write_text("\n".join(vocab))
    BertTokenizerFast(vocab_file=str(mdir / "vocab.txt")).save_pretrained(mdir)
    cfg = BertConfig(vocab_size=len(vocab), hidden_size=32,
                     num_hidden_layers=1, num_attention_heads=2,
                     intermediate_size=64, max_position_embeddings=512)
    BertModel(cfg).save_pretrained(mdir)

    corpus = tmp_path / "corpus.jsonl"
    docs = [
        "The quick brown fox jumps over the lazy dog. " * 3,
        "Sentence number one with some words. Alpha beta words. " * 2,
        "Beta alpha. " * 10,
    ]
    import json
    corpus.write_text("\n".join(json.dumps({"text": t}) for t in docs))

    out = tmp_path / "emb.vecbin"
    meta = tmp_path / "rowmeta.jsonl"
    from nvdb_tpu.tools import embed
    embed.main([str(corpus), str(out), "--model", str(mdir),
                "--meta", str(meta), "--batch", "4", "--max-chars", "80"])

    from nvdb_tpu.formats import vecbin
    f = vecbin.VecbinFile(str(out))
    rows = np.asarray(f.vectors, dtype=np.float32)
    meta_recs = [json.loads(l) for l in meta.read_text().splitlines()]
    # one vecbin row per chunk, chunks match the chunker's own output
    expected = sum(len(chunk_text(t, 80)) for t in docs)
    assert f.count == expected == len(meta_recs) == rows.shape[0]
    assert f.dim == 32
    # mean-pooled + L2-normalized: unit rows, fully finite
    assert np.all(np.isfinite(rows))
    np.testing.assert_allclose(np.linalg.norm(rows, axis=1), 1.0, atol=1e-5)
    # doc/chunk bookkeeping covers every doc in order
    assert [r["doc"] for r in meta_recs] == sorted(r["doc"] for r in meta_recs)
    assert {r["doc"] for r in meta_recs} == {0, 1, 2}
